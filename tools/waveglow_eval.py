#!/usr/bin/env python
"""WaveGlow vocoder quality + provenance evaluation.

Produces the objective evidence the trained vocoder ships with (the
reference serves a pretrained NVIDIA model and publishes no numbers,
synthesizer.py:79-80):

1. **Held-out NLL vs training steps** — restores every ``waveglow_*``
   checkpoint in ``--ckpt_dir`` and evaluates the flow NLL (sigma=1, the
   training objective) on a FIXED set of held-out segments, giving one
   curve on one metric across the whole run (the in-run ``nll.csv`` is the
   noisy per-batch train loss; this is the clean convergence record).
2. **Copy-synthesis quality, bias-controlled** — vocodes held-out
   ground-truth mels three ways and scores each against the original
   audio:
     * WaveGlow ``sigma=0.666`` (serving configuration, sampled z),
     * WaveGlow ``sigma=0`` (deterministic inverse — removes the sampling
       noise the |dlog-mel| metric punishes),
     * Griffin-Lim 30 iterations (the no-vocoder fallback; its iterations
       directly optimize spectral consistency, which biases mel-domain
       metrics toward it).
   Metrics per variant: mean |dlog-mel| after re-featurizing the output,
   and a multi-scale STFT distance (spectral convergence + log-magnitude
   L1 over FFT sizes 512/1024/2048 — the standard vocoder objective that
   does NOT share Griffin-Lim's fixed mel filterbank).

Usage:
  python tools/waveglow_eval.py \
      --export /tmp/t2v_curves/waveglow_export.pkl \
      --ckpt_dir /tmp/t2v_curves/wg --filelist /tmp/t2v_curves/val.txt \
      --out res/waveglow_eval.json --plot res/waveglow_nll.png
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

# Honor JAX_PLATFORMS=cpu (the site config pins the TPU plugin and
# ignores the env var) — lets the eval run off-chip while the chip trains.
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from tacotron2_vae_tpu.data import native
from tacotron2_vae_tpu.data.dataset import load_filepaths_and_text
from tacotron2_vae_tpu.dsp import griffin_lim
from tacotron2_vae_tpu.dsp.stft import TacotronSTFT, dynamic_range_decompression
from tacotron2_vae_tpu.models import waveglow as wg


def _stft_eval(sr):
    return TacotronSTFT(1024, 256, 1024, 80, sr, 0.0, 8000.0)


def _load_clips(filelist, sr, n_clips, max_secs=6.0, seed=999):
    """Deterministic held-out clips (first n usable entries, tail-trimmed)."""
    rng = np.random.RandomState(seed)
    entries = [e[0] for e in load_filepaths_and_text(filelist)]
    rng.shuffle(entries)
    clips = []
    for path in entries:
        try:
            audio, got_sr = native.load_wav(path, scale=32768.0)
        except (FileNotFoundError, OSError, ValueError):
            continue
        if got_sr != sr:
            continue
        clips.append(audio[: int(max_secs * sr)].astype(np.float32))
        if len(clips) >= n_clips:
            break
    if not clips:
        raise SystemExit(f"no usable {sr} Hz wavs in {filelist}")
    return clips


def _eval_segments(filelist, sr, segment, n, seed=999):
    """Fixed held-out (audio, mel) segment batch for the NLL sweep."""
    rng = np.random.RandomState(seed)
    stft = _stft_eval(sr)
    entries = [e[0] for e in load_filepaths_and_text(filelist)]
    segs = []
    for path in entries:
        try:
            audio, got_sr = native.load_wav(path, scale=32768.0)
        except (FileNotFoundError, OSError, ValueError):
            continue
        if got_sr != sr:
            continue
        if len(audio) < segment:
            audio = np.pad(audio, (0, segment - len(audio)))
            start = 0
        else:
            start = rng.randint(len(audio) - segment + 1)
        segs.append(audio[start:start + segment])
        if len(segs) >= n:
            break
    audio = np.stack(segs).astype(np.float32)
    pad = stft.filter_length // 2
    padded = np.stack([np.pad(a, pad, mode="reflect") for a in audio])
    mel = np.asarray(stft.mel_spectrogram_prepadded(padded))
    n_frames = segment // stft.hop_length + 1
    return jnp.asarray(audio), jnp.asarray(mel[:, :, :n_frames])


def nll_sweep(ckpt_dir, cfg, audio, mel):
    """Held-out NLL (sigma=1 training objective) at every checkpoint."""
    import orbax.checkpoint as ocp

    @jax.jit
    def nll(params):
        z, log_s, log_det = wg.forward(params, audio, mel, cfg)
        return wg.waveglow_loss(z, log_s, log_det, 1.0)

    template = {
        "step": 0,
        "params": jax.tree_util.tree_map(
            np.asarray, wg.init(jax.random.PRNGKey(0), cfg)),
        "opt_state": None,
    }
    ckptr = ocp.PyTreeCheckpointer()
    rows = []
    for path in sorted(glob.glob(os.path.join(ckpt_dir, "waveglow_*")),
                       key=lambda p: int(p.rsplit("_", 1)[1])):
        try:
            payload = ckptr.restore(
                os.path.abspath(path),
                item={"step": 0, "params": template["params"]},
                transforms={},  # ignore opt_state (template omits it)
            )
        except Exception:
            # older orbax: restore full payload with opt_state template-free
            try:
                payload = ckptr.restore(os.path.abspath(path))
            except Exception as e:  # unreadable checkpoint: record and skip
                rows.append({"step": int(path.rsplit("_", 1)[1]),
                             "nll": None, "error": str(e)[:120]})
                continue
        step = int(payload["step"])
        v = float(nll(payload["params"]))
        rows.append({"step": step, "nll": round(v, 5)})
        print(f"checkpoint {path}: held-out NLL {v:.5f}", file=sys.stderr)
        del payload
    return rows


def _ms_stft_distance(ref, out):
    """Multi-scale STFT distance: mean over scales of
    (spectral convergence + log-magnitude L1)."""
    n = min(len(ref), len(out))
    ref, out = ref[:n], out[:n]
    total_sc, total_mag = 0.0, 0.0
    scales = (512, 1024, 2048)
    for nfft in scales:
        hop = nfft // 4
        w = np.hanning(nfft).astype(np.float32)
        frames = 1 + (n - nfft) // hop if n >= nfft else 1

        def mag(x):
            if len(x) < nfft:
                x = np.pad(x, (0, nfft - len(x)))
            idx = (np.arange(frames)[:, None] * hop
                   + np.arange(nfft)[None, :])
            return np.abs(np.fft.rfft(x[idx] * w, axis=1))

        mr, mo = mag(ref), mag(out)
        total_sc += float(np.linalg.norm(mr - mo) /
                          max(np.linalg.norm(mr), 1e-8))
        total_mag += float(np.mean(np.abs(
            np.log(np.maximum(mr, 1e-5)) - np.log(np.maximum(mo, 1e-5)))))
    k = len(scales)
    return round(total_sc / k, 5), round(total_mag / k, 5)


def copy_synthesis(params, cfg, clips, sr):
    """Vocode ground-truth mels 3 ways; score vs the original audio."""
    stft = _stft_eval(sr)
    fb = np.asarray(stft.mel_basis)
    fb_pinv = np.linalg.pinv(fb)

    def featurize(a):
        return np.asarray(stft.mel_spectrogram(jnp.asarray(a[None])))[0]

    results = {k: {"dlogmel": [], "sc": [], "logmag_l1": []}
               for k in ("waveglow_s0.666", "waveglow_s0", "griffin_lim")}
    for i, a in enumerate(clips):
        mel = featurize(a)
        T = mel.shape[1]

        def score(key, out):
            out = np.asarray(out, np.float32)
            n = min(len(a), len(out))
            mel_out = featurize(out[:n])
            Tm = min(T, mel_out.shape[1])
            results[key]["dlogmel"].append(
                float(np.mean(np.abs(mel[:, :Tm] - mel_out[:, :Tm]))))
            sc, lm = _ms_stft_distance(a[:n], out[:n])
            results[key]["sc"].append(sc)
            results[key]["logmag_l1"].append(lm)

        mel_j = jnp.asarray(mel[None])
        wav = wg.infer(params, mel_j, cfg, sigma=0.666,
                       key=jax.random.PRNGKey(i))
        score("waveglow_s0.666", wav[0][: T * stft.hop_length])
        # sigma=0: deterministic inverse (z=0) — no sampling noise
        wav0 = wg.infer(params, mel_j, cfg, sigma=0.0,
                        key=jax.random.PRNGKey(i))
        score("waveglow_s0", wav0[0][: T * stft.hop_length])
        mel_lin = np.asarray(
            dynamic_range_decompression(jnp.asarray(mel)))
        mag = np.maximum(fb_pinv @ mel_lin, 0.0)
        gl = griffin_lim(jnp.asarray(mag[None]), stft.filter_length,
                         stft.hop_length, stft.win_length, n_iters=30)
        score("griffin_lim", np.asarray(gl)[0][: T * stft.hop_length])
        print(f"clip {i}: scored", file=sys.stderr)
    return {
        k: {m: round(float(np.mean(v[m])), 5) for m in v}
        for k, v in results.items()
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--export", required=True,
                   help="self-describing waveglow .pkl (train_waveglow.py "
                        "--export) scored by the copy-synthesis section")
    p.add_argument("--ckpt_dir", default=None,
                   help="directory of waveglow_* orbax checkpoints for the "
                        "held-out NLL sweep (skipped if omitted)")
    p.add_argument("--filelist", required=True)
    p.add_argument("--sampling_rate", type=int, default=16000)
    p.add_argument("--n_clips", type=int, default=6)
    p.add_argument("--nll_segments", type=int, default=8)
    p.add_argument("--segment", type=int, default=16000)
    p.add_argument("--out", default=None, help="write the JSON here too")
    p.add_argument("--plot", default=None,
                   help="write the NLL-vs-steps curve png here")
    args = p.parse_args()

    import pickle

    with open(args.export, "rb") as f:
        blob = pickle.load(f)
    cfg = wg.WaveGlowConfig(**blob["config"])
    params = jax.device_put(jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), blob["waveglow"]))

    report = {"export": args.export,
              "config": blob["config"],
              "filelist": args.filelist}

    if args.ckpt_dir:
        audio, mel = _eval_segments(args.filelist, args.sampling_rate,
                                    args.segment, args.nll_segments)
        report["heldout_nll"] = nll_sweep(args.ckpt_dir, cfg, audio, mel)
        if args.plot:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            rows = [r for r in report["heldout_nll"] if r.get("nll")]
            fig, ax = plt.subplots(figsize=(6, 3.5))
            ax.plot([r["step"] for r in rows], [r["nll"] for r in rows],
                    marker="o")
            ax.set_xlabel("training step")
            ax.set_ylabel("held-out flow NLL (sigma=1)")
            ax.set_title("WaveGlow held-out NLL vs steps")
            ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(args.plot, dpi=120)
            report["plot"] = args.plot

    clips = _load_clips(args.filelist, args.sampling_rate, args.n_clips)
    report["copy_synthesis"] = copy_synthesis(params, cfg, clips,
                                              args.sampling_rate)
    js = json.dumps(report, indent=1)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()
