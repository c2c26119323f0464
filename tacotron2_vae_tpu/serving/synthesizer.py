"""Serving-layer Synthesizer: text + style conditioning -> waveform.

API parity with the reference ``Synthesizer`` (synthesizer.py:46-168):
``load(checkpoint_path, waveglow_path)`` then
``synthesize(text, path, condition_on_ref, ref_audio, ratios)``.

Style conditioning paths (synthesizer.py:121-131):
  * reference audio: VAE-GST style embedding of a mel extracted from a wav;
  * emotion-ratio mix: z = sum(ratio_i * centroid_i) over per-emotion latent
    centroids precomputed from a filelist and cached to .npz
    (synthesizer.py:82-110); centroid order [neu, sad, hap, ang] with ratios
    indexed [neu, sad, hap, ang] (synthesizer.py:128-129);
  * interpolation between two centroids (inference.ipynb recipe,
    README.md:189-221) via ``interpolate``.

Deliberate fix vs the reference: we vocode the *postnet* mel by default
(the reference feeds the pre-postnet mel to WaveGlow, synthesizer.py:163);
pass ``vocode_prepostnet=True`` for bug-compatible behavior.
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import create_hparams
from ..dsp import TacotronSTFT, griffin_lim, load_wav, save_wav
from ..dsp.stft import dynamic_range_decompression
from ..models import tacotron2, vae_gst
from ..models import waveglow as waveglow_mod
from ..text import text_to_sequence


class Synthesizer:
    def __init__(self, hparams=None):
        # Persistent compilation cache: one compile per (text, mel) bucket
        # shape for the lifetime of the cache dir, across restarts.
        try:
            if not jax.config.jax_compilation_cache_dir:
                jax.config.update(
                    "jax_compilation_cache_dir",
                    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.expanduser("~/.cache/t2v_jax")),
                )
        except Exception:
            pass
        self.hparams = hparams or create_hparams()
        self.hparams = self.hparams.replace(
            sampling_rate=16000, max_decoder_steps=600  # synthesizer.py:50-51
        )
        hp = self.hparams
        self.stft = TacotronSTFT(
            hp.filter_length, hp.hop_length, hp.win_length,
            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin, hp.mel_fmax,
        )
        self.params = None
        self.model_state = None
        self.waveglow = None
        self.waveglow_cfg = waveglow_mod.WaveGlowConfig(
            n_mel_channels=hp.n_mel_channels
        )
        self._rng = jax.random.PRNGKey(hp.seed)
        self._synth_jit = None
        self.centroids_loaded = False

    # ------------------------------------------------------------------

    def load_mel(self, path: str) -> jnp.ndarray:
        audio, sr = load_wav(path)
        if sr != self.hparams.sampling_rate:
            raise ValueError(
                f"{sr} SR doesn't match target {self.hparams.sampling_rate} SR"
            )
        audio = audio / self.hparams.max_wav_value
        return self.stft.mel_spectrogram(audio[None])

    def load(self, checkpoint_path: str, waveglow_path: str | None = None,
             centroid_filelist: str | None = None):
        """Load model weights (+ optional WaveGlow) and per-emotion centroids.

        Weights are device_put once — otherwise every synthesis re-uploads
        the full parameter set from host numpy (seconds per call).
        """
        params, model_state = _load_any_checkpoint(checkpoint_path, self.hparams)
        self.params = jax.device_put(params)
        self.model_state = jax.device_put(model_state)
        if waveglow_path:
            wg_params, wg_cfg = _load_waveglow(waveglow_path, self.waveglow_cfg)
            if wg_cfg is not None:
                # self-describing checkpoint (tools/train_waveglow.py
                # --export): the embedded config wins over the default
                self.waveglow_cfg = wg_cfg
            self.waveglow = jax.device_put(wg_params)

        if centroid_filelist is None:
            centroid_filelist = os.path.join(
                "web", "static", "uploads", "koemo_spk_emo_all_test.txt"
            )
        if os.path.exists(centroid_filelist):
            n = self._load_centroids(checkpoint_path, centroid_filelist)
            self.centroids_loaded = n > 0
            if n == 0:
                import warnings

                warnings.warn(
                    f"Centroid filelist {centroid_filelist!r} exists but "
                    "none of its wav paths could be read — emotion "
                    "centroids are ZERO.", stacklevel=2,
                )
        else:
            # No filelist available: zero centroids (ratio path degrades to
            # the prior-mean style fc3(0)) — warn loudly, this is almost
            # never what the caller wants (reference synthesizer.py:86-110
            # always precomputes real centroids).
            import warnings

            warnings.warn(
                f"Centroid filelist not found: {centroid_filelist!r}. "
                "Emotion centroids are ZERO — the ratio/interpolation style "
                "paths will emit the prior-mean style for every request. "
                "Pass centroid_filelist= pointing at a "
                "path|text|speaker|emotion manifest whose wavs exist "
                "(e.g. web/static/uploads/koemo_spk_emo_all_test.txt).",
                stacklevel=2,
            )
            z = np.zeros(self.hparams.z_latent_dim, np.float32)
            self.neu = self.sad = self.ang = self.hap = z
            self.centroids_loaded = False

    def _embed_mels(self, mels) -> list:
        """VAE latents for a list of (n_mel, T) mels.

        Default path: bucket-pad along time (exact under padding — see
        vae_gst.reference_encoder mel_lengths) and embed 16 clips per
        jitted call; an eager forward per clip through the remote device
        costs ~0.3 s each, which for the reference test manifest (1232
        clips) is minutes of serving cold-start vs seconds batched.  The
        raw_reshape compat layout scrambles time, so it keeps the serial
        exact path.
        """
        if not mels:
            return []
        if self.hparams.ref_enc_raw_reshape:
            out = []
            for m in mels:
                (_, _, _, z), _ = vae_gst.apply(
                    self.params["vae_gst"], self.model_state["vae_gst"],
                    jnp.asarray(m)[None], train=False, raw_reshape=True,
                )
                out.append(np.asarray(z)[0])
            return out

        batch, bucket = 16, 128
        fn = jax.jit(
            lambda p, s, m, l: vae_gst.apply(
                p, s, m, train=False, mel_lengths=l
            )[0][3]
        )
        order = sorted(range(len(mels)), key=lambda i: mels[i].shape[1])
        zs = [None] * len(mels)
        for i in range(0, len(order), batch):
            idx = order[i : i + batch]
            max_t = max(mels[j].shape[1] for j in idx)
            pad_t = -(-max_t // bucket) * bucket
            buf = np.zeros(
                (batch, self.hparams.n_mel_channels, pad_t), np.float32
            )
            lens = np.ones((batch,), np.int32)  # pad rows: length-1 dummies
            for row, j in enumerate(idx):
                buf[row, :, : mels[j].shape[1]] = mels[j]
                lens[row] = mels[j].shape[1]
            z = np.asarray(fn(
                self.params["vae_gst"], self.model_state["vae_gst"],
                jnp.asarray(buf), jnp.asarray(lens),
            ))
            for row, j in enumerate(idx):
                zs[j] = z[row]
        return zs

    def _load_centroids(self, checkpoint_path: str, filelist: str) -> int:
        """Per-emotion latent centroids, cached to .npz beside the checkpoint
        (reference synthesizer.py:82-110).  Entries whose wav can't be read
        are skipped with a warning (the shipped dataset manifests carry the
        original corpus' absolute paths).  Returns the number of entries
        actually embedded."""
        base = os.path.dirname(os.path.abspath(checkpoint_path))
        tag = os.path.basename(filelist).rsplit("_", 1)[-1].split(".")[0]
        # Key the cache by checkpoint CONTENT fingerprint (max mtime_ns +
        # total size over the file/dir), not just basename: re-saving
        # `checkpoint_1500` from a different run must invalidate, or the
        # ratio path silently serves centroids from the old weights.
        npz_path = os.path.join(
            base,
            os.path.basename(checkpoint_path)
            + "_" + _ckpt_fingerprint(checkpoint_path)
            + "_" + tag + ".npz",
        )
        zs = emotions = None
        if os.path.exists(npz_path):
            try:
                d = np.load(npz_path)
                zs, emotions = d["zs"], d["emotions"]
            except (OSError, ValueError, KeyError):
                # a concurrent loader of a re-saved checkpoint may have
                # evicted this fingerprint between exists() and load (or
                # the file is torn); fall through to recompute
                zs = emotions = None
        if zs is None:
            entries = [
                line.strip().split("|")
                for line in open(filelist, encoding="utf-8")
                if line.strip()
            ]
            audios, emotions, skipped = [], [], 0
            # Sub-pad-length clips can't be reflect-padded by the STFT
            # framing (same constraint as the reference's torch reflect pad)
            # — skip them like unreadable files instead of letting one
            # degenerate clip abort the whole bulk featurization.
            min_len = self.hparams.filter_length // 2 + 1
            for audio_path, _text, _spk, emotion in entries:
                try:
                    audio, sr = load_wav(audio_path)
                    if sr != self.hparams.sampling_rate:
                        raise ValueError(f"{sr} != target SR")
                    if len(audio) < min_len:
                        raise ValueError("clip shorter than STFT pad")
                except (FileNotFoundError, OSError, ValueError):
                    skipped += 1
                    continue
                audios.append(audio / self.hparams.max_wav_value)
                emotions.append(int(emotion))
            # fixed-chunk batched featurization + bucket-batched VAE: the
            # serial per-clip path costs ~1 s/clip through the remote
            # device — minutes over the reference's 1232-clip manifest.
            from ..dsp.stft import featurize_wavs_chunked

            mels = featurize_wavs_chunked(self.stft, audios) if audios else []
            zs = self._embed_mels(mels)
            if skipped:
                import warnings

                warnings.warn(
                    f"Centroid precompute: skipped {skipped}/{len(entries)} "
                    f"unreadable wavs from {filelist!r}.", stacklevel=2,
                )
            if not zs:
                z0 = np.zeros(self.hparams.z_latent_dim, np.float32)
                self.neu = self.sad = self.ang = self.hap = z0
                return 0
            zs = np.stack(zs)
            emotions = np.asarray(emotions)
            np.savez(npz_path, zs=zs, emotions=emotions)
            # evict superseded fingerprints for this checkpoint+manifest so
            # repeated re-saves don't accumulate stale .npz files (fixed
            # pattern parts glob-escaped: metachars in a checkpoint path
            # must neither break eviction nor match another run's cache)
            import glob as _glob

            prefix = os.path.basename(checkpoint_path) + "_"
            suffix = "_" + tag + ".npz"
            pat = (
                _glob.escape(os.path.join(base, prefix))
                + "*" + _glob.escape(suffix)
            )
            for old in _glob.glob(pat):
                if old == npz_path:
                    continue
                # The glob's "*" may over-match a SIBLING checkpoint whose
                # basename extends ours (`checkpoint_15` vs
                # `checkpoint_1500_<fp>_val.npz`): only unlink when the
                # middle is exactly one fingerprint (lowercase hex, as
                # emitted by _ckpt_fingerprint) — never a path fragment or
                # a longer checkpoint name.
                mid = os.path.basename(old)[len(prefix):-len(suffix)]
                if not mid or any(c not in "0123456789abcdef" for c in mid):
                    continue
                try:
                    os.unlink(old)
                except OSError:
                    pass

        def centroid(e):
            sel = zs[emotions == e]
            return (sel.mean(axis=0) if len(sel)
                    else np.zeros(self.hparams.z_latent_dim, np.float32))

        # Emotion label order [neu, sad, ang, hap] (synthesizer.py:102-105).
        self.neu, self.sad, self.ang, self.hap = (
            centroid(0), centroid(1), centroid(2), centroid(3)
        )
        return int(len(zs))

    # ------------------------------------------------------------------

    def style_from_ref(self, ref_audio: str) -> jnp.ndarray:
        """Style embedding from a reference wav (synthesizer.py:121-125)."""
        mel = self.load_mel(ref_audio)
        (style, _, _, _), _ = vae_gst.apply(
            self.params["vae_gst"], self.model_state["vae_gst"], mel,
            train=False, raw_reshape=self.hparams.ref_enc_raw_reshape,
        )
        return style[0]

    def style_from_ratios(self, ratios: Sequence[float]) -> jnp.ndarray:
        """Style embedding from emotion ratios [neu, sad, hap, ang]
        (synthesizer.py:127-131)."""
        if not getattr(self, "centroids_loaded", True):
            import warnings

            warnings.warn(
                "synthesize() called with emotion ratios but no centroids "
                "are loaded (zero fallback): the ratios have no effect.",
                stacklevel=2,
            )
        z = (
            ratios[0] * self.neu + ratios[1] * self.sad
            + ratios[2] * self.hap + ratios[3] * self.ang
        )
        from ..ops.layers import linear

        return linear(self.params["vae_gst"]["fc3"], jnp.asarray(z, jnp.float32))

    def interpolate(self, emotion_a: str, emotion_b: str, alpha: float):
        """Latent interpolation between two emotion centroids
        (inference.ipynb recipe, README.md:189-221)."""
        if not getattr(self, "centroids_loaded", True):
            import warnings

            warnings.warn(
                "interpolate() called but no centroids are loaded (zero "
                "fallback): interpolation has no effect.", stacklevel=2,
            )
        za = getattr(self, emotion_a)
        zb = getattr(self, emotion_b)
        z = (1.0 - alpha) * za + alpha * zb
        from ..ops.layers import linear

        return linear(self.params["vae_gst"]["fc3"], jnp.asarray(z, jnp.float32))

    # ------------------------------------------------------------------

    def synthesize_mel(self, text: str, style: jnp.ndarray):
        """text + style embedding -> (mel, mel_postnet, gate, align, length).

        Text is padded up to a bucketed static length (with masking inside
        the model), so XLA compiles once per bucket, not once per utterance.
        """
        hp = self.hparams
        seq = np.asarray(
            text_to_sequence(text, list(hp.text_cleaners),
                             symbol_type=getattr(hp, "symbol_type", 1)),
            np.int32,
        )
        n = len(seq)
        bucket = max(hp.text_bucket_size, 1)
        padded_len = ((n + bucket - 1) // bucket) * bucket
        seq = np.pad(seq, (0, padded_len - n))[None, :]
        self._rng, rng = jax.random.split(self._rng)
        if self._synth_jit is None:
            def _synth(params, state, text_ids, text_lengths, style, rng):
                return tacotron2.infer(
                    params, state, text_ids, style, hp, rng=rng,
                    max_steps=hp.max_decoder_steps,
                    text_lengths=text_lengths,
                )
            self._synth_jit = jax.jit(_synth)
        mel, mel_post, gate, align, lengths = self._synth_jit(
            self.params, self.model_state, jnp.asarray(seq),
            jnp.asarray([n], jnp.int32),
            jnp.asarray(style)[None] if style.ndim == 1 else style, rng,
        )
        n = int(lengths[0])  # frames; gate/align are per decoder step
        r = hp.n_frames_per_step
        n_steps = (n + r - 1) // r
        return (
            np.asarray(mel)[:, :, :n],
            np.asarray(mel_post)[:, :, :n],
            np.asarray(gate)[:, :n_steps],
            np.asarray(align)[:, :n_steps],
            n,
        )

    def synthesize_mel_batch(self, texts: Sequence[str], styles):
        """Batched text+style -> per-item (mel, mel_post, gate, align, n).

        All texts pad to ONE bucketed length (attention masks make padding
        exact) and the batch pads to the next of {1, 2, 4, 8} rows with
        length-1 dummies, so XLA compiles one variant per (rows, bucket) —
        this is the serving micro-batch path (app.py queue); on TPU with
        B <= 8 it rides the fused batched decode kernel
        (ops/pallas/decoder_loop.decode_loop_batched)."""
        hp = self.hparams
        seqs = [
            np.asarray(
                text_to_sequence(t, list(hp.text_cleaners),
                                 symbol_type=getattr(hp, "symbol_type", 1)),
                np.int32,
            )
            for t in texts
        ]
        B = len(seqs)
        bucket = max(hp.text_bucket_size, 1)
        max_n = max(len(s) for s in seqs)
        S = ((max_n + bucket - 1) // bucket) * bucket
        Bp = 1
        while Bp < B:
            Bp *= 2
        buf = np.zeros((Bp, S), np.int32)
        lens = np.ones((Bp,), np.int32)
        for i, s in enumerate(seqs):
            buf[i, : len(s)] = s
            lens[i] = len(s)
        style_rows = [np.asarray(s, np.float32) for s in styles]
        style_mat = np.zeros((Bp, style_rows[0].shape[-1]), np.float32)
        for i, s in enumerate(style_rows):
            style_mat[i] = s
        self._rng, rng = jax.random.split(self._rng)
        if self._synth_jit is None:
            def _synth(params, state, text_ids, text_lengths, style, rng):
                return tacotron2.infer(
                    params, state, text_ids, style, hp, rng=rng,
                    max_steps=hp.max_decoder_steps,
                    text_lengths=text_lengths,
                )
            self._synth_jit = jax.jit(_synth)
        mel, mel_post, gate, align, lengths = self._synth_jit(
            self.params, self.model_state, jnp.asarray(buf),
            jnp.asarray(lens), jnp.asarray(style_mat), rng,
        )
        mel = np.asarray(mel)
        mel_post = np.asarray(mel_post)
        gate = np.asarray(gate)
        align = np.asarray(align)
        r = hp.n_frames_per_step
        out = []
        for i in range(B):
            n = int(lengths[i])
            n_steps = (n + r - 1) // r
            out.append((
                mel[i : i + 1, :, :n],
                mel_post[i : i + 1, :, :n],
                gate[i : i + 1, :n_steps],
                align[i : i + 1, :n_steps],
                n,
            ))
        return out

    def synthesize_batch(self, requests, vocode_prepostnet: bool = False):
        """Batch of (text, path, condition_on_ref, ref_audio, ratios) ->
        list of written wav paths.  One batched mel synthesis, per-item
        vocoding (the vocoder is a tiny fraction of the step)."""
        styles = []
        for text, path, cond, ref, ratios in requests:
            style = (
                self.style_from_ref(ref) if cond
                else self.style_from_ratios(ratios or [1.0, 0.0, 0.0, 0.0])
            )
            styles.append(np.asarray(style))
        items = self.synthesize_mel_batch([r[0] for r in requests], styles)
        paths = []
        for (text, path, cond, ref, ratios), (mel, mel_post, *_rest) in zip(
            requests, items
        ):
            wav = self.vocode(mel if vocode_prepostnet else mel_post)
            save_wav(path, wav, self.hparams.sampling_rate)
            paths.append(path)
        return paths

    def vocode(self, mel: np.ndarray, sigma: float = 0.666) -> np.ndarray:
        """mel (1, n_mel, T) -> waveform via WaveGlow (or Griffin-Lim).

        The mel is padded with log-silence up to a bucketed frame count so
        the vocoder compiles once per bucket; the tail audio is trimmed.
        """
        if self.waveglow is not None:
            hp = self.hparams
            T = mel.shape[2]
            bucket = max(hp.mel_bucket_size, 1)
            padded = ((T + bucket - 1) // bucket) * bucket
            mel_p = np.pad(
                np.asarray(mel), ((0, 0), (0, 0), (0, padded - T)),
                constant_values=np.log(1e-5),
            )
            self._rng, rng = jax.random.split(self._rng)
            wav = waveglow_mod.infer(
                self.waveglow, jnp.asarray(mel_p), self.waveglow_cfg,
                sigma=sigma, key=rng,
            )
            return np.asarray(wav)[0][: T * hp.hop_length]
        # Griffin-Lim fallback: invert the log-mel approximately.
        hp = self.hparams
        mel_lin = np.asarray(dynamic_range_decompression(jnp.asarray(mel)))[0]
        fb = np.asarray(self.stft.mel_basis)
        mag = np.maximum(np.linalg.pinv(fb) @ mel_lin, 0.0) ** 1.0
        wav = griffin_lim(
            jnp.asarray(mag[None]), hp.filter_length, hp.hop_length,
            hp.win_length, n_iters=30,
        )
        return np.asarray(wav)[0]

    def synthesize(self, text: str, path: str, condition_on_ref: bool,
                   ref_audio: str | None, ratios: Sequence[float] | None,
                   vocode_prepostnet: bool = False) -> str:
        """Full text->wav pipeline (reference synthesizer.py:112-168)."""
        if condition_on_ref:
            style = self.style_from_ref(ref_audio)
        else:
            style = self.style_from_ratios(ratios or [1.0, 0.0, 0.0, 0.0])
        mel, mel_post, *_ = self.synthesize_mel(text, style)
        wav = self.vocode(mel if vocode_prepostnet else mel_post)
        save_wav(path, wav, self.hparams.sampling_rate)
        return path


# --- checkpoint loading helpers -----------------------------------------------


def _ckpt_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a checkpoint file or directory: max
    mtime_ns and summed byte size over every file under it.  Any re-save
    (even in place, same basename) changes the fingerprint."""
    mtime, size = 0, 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    st = os.stat(os.path.join(root, f))
                except OSError:
                    continue
                mtime = max(mtime, st.st_mtime_ns)
                size += st.st_size
    else:
        try:
            st = os.stat(path)
            mtime, size = st.st_mtime_ns, st.st_size
        except OSError:
            pass
    return f"{mtime:x}{size:x}"


def _load_any_checkpoint(path: str, hp):
    """Load params+state from an Orbax dir, a converted pickle, or a torch
    checkpoint (auto-converted)."""
    if os.path.isdir(path):
        from ..training.checkpoint import load_checkpoint
        from ..training.train_state import create_train_state

        # The restore template only provides tree structure/shapes — build
        # it on host CPU: random-initializing the full model + optimizer
        # eagerly on the remote device costs ~3.5 min of serving cold-start
        # (measured); on CPU it is ~2 s.
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                ts = create_train_state(jax.random.PRNGKey(0), hp)
        else:
            ts = create_train_state(jax.random.PRNGKey(0), hp)
        ts, _, _ = load_checkpoint(path, ts)
        return ts.params, ts.model_state
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"\x80\x04" or path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        return blob["params"], blob["model_state"]
    # torch checkpoint: convert on the fly
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "tools"))
    from convert_torch_ckpt import convert_tacotron2
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    return convert_tacotron2(sd, hp)


def _load_waveglow(path: str, cfg):
    """Returns (params, config-or-None).  A pickle may carry its own
    WaveGlowConfig dict (written by tools/train_waveglow.py --export) —
    weights there may be stored float16 for size; cast back to fp32."""
    if path.endswith(".pkl") or path.endswith(".pickle"):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), blob["waveglow"]
        )
        loaded_cfg = None
        if "config" in blob:
            loaded_cfg = waveglow_mod.WaveGlowConfig(**blob["config"])
        return params, loaded_cfg
    import sys, os as _os

    sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__)))), "tools"))
    from convert_torch_ckpt import convert_waveglow

    return convert_waveglow(path, cfg), None
