"""Hyperparameter configuration for the TPU-native tacotron2-vae framework.

Capability parity with the reference's ``create_hparams`` (reference:
``hparams.py:3-126``), but implemented as an immutable dataclass instead of
TF1 ``tf.contrib.training.HParams``.  The public surface is the same:

    hp = create_hparams("batch_size=6,anneal_function='constant'")
    hp.batch_size  # -> 6

Differences (deliberate, documented):
  * No import-time global config (the reference creates global hparams at
    module import in ``CoordConv.py:6`` and ``text/__init__.py:7``).
  * The default mixed-precision policy is bf16, which needs no loss scaling
    (bf16 has fp32 exponent range).  ``fp16_run=True`` engages true float16
    compute with (dynamic) loss scaling and overflow-skip, matching the
    reference fp16_optimizer.py semantics (see training/train_state.py).
  * TPU-specific knobs (mesh shape, compute dtype, bucketing) are additive.
"""

from __future__ import annotations

import ast
import dataclasses
import re
from dataclasses import dataclass, field
from typing import List, Tuple


def _tuple(*xs):
    return field(default_factory=lambda: list(xs))


@dataclass(frozen=True)
class HParams:
    ################################
    # Experiment Parameters        #
    ################################
    epochs: int = 300
    iters_per_checkpoint: int = 500
    seed: int = 1234
    dynamic_loss_scaling: bool = True
    fp16_run: bool = False
    distributed_run: bool = False

    # Kept for CLI compatibility; unused on TPU (jax.distributed handles
    # rendezvous, XLA handles collectives). Reference: hparams.py:17-20.
    dist_backend: str = "nccl"
    dist_url: str = "tcp://localhost:54321"
    cudnn_enabled: bool = True
    cudnn_benchmark: bool = True

    ################################
    # Data Parameters              #
    ################################
    load_mel_from_disk: bool = False
    training_files: str = "filelists/koemo_spk_emo_all_train.txt"
    validation_files: str = "filelists/koemo_spk_emo_all_valid.txt"
    text_cleaners: List[str] = _tuple("korean_cleaners")
    # The reference accepts-but-never-uses this (hparams.py:29; its collate
    # always sorts *within* a batch, data_utils.py:95-97 — so does ours).
    # Here it enables length-POOLED batching (data/dataset.py::DataLoader):
    # batches are drawn from mel-length-sorted pools of batch_size*8 shuffled
    # items, so each batch pads to near its own max length instead of the
    # corpus max — ~2x fewer padded frames on a wide-spread corpus, and far
    # fewer distinct (S, T) bucket shapes for XLA to compile.
    sort_by_length: bool = False

    ################################
    # Audio Parameters             #
    ################################
    max_wav_value: float = 32768.0
    sampling_rate: int = 16000
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    ################################
    # Model Parameters             #
    ################################
    n_symbols: int = 80  # 80 for korean_cleaners, 65 for english_cleaners
    symbols_embedding_dim: int = 512

    # Transcript encoder
    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512

    # Speaker embedding
    n_speakers: int = 1
    speaker_embedding_dim: int = 16

    # Emotion
    n_emotions: int = 4
    emotion_embedding_dim: int = 16

    # Reference encoder (VAE-GST)
    E: int = 512
    ref_enc_filters: List[int] = _tuple(32, 32, 64, 64, 128, 128)
    ref_enc_size: List[int] = _tuple(3, 3)
    ref_enc_strides: List[int] = _tuple(2, 2)
    ref_enc_pad: List[int] = _tuple(1, 1)
    ref_enc_gru_size: int = 512 // 2

    z_latent_dim: int = 32
    anneal_function: str = "logistic"
    anneal_k: float = 0.0025
    anneal_x0: int = 10000
    anneal_upper: float = 0.2
    anneal_lag: int = 50000

    # Prosody embedding (kept for config-surface parity; the reference
    # defines these but derives the actual conv stack from ref_enc_filters)
    prosody_n_convolutions: int = 6
    prosody_conv_dim_in: List[int] = _tuple(1, 32, 32, 64, 64, 128)
    prosody_conv_dim_out: List[int] = _tuple(32, 32, 64, 64, 128, 128)
    prosody_conv_kernel: int = 3
    prosody_conv_stride: int = 2
    prosody_embedding_dim: int = 128

    # Decoder
    n_frames_per_step: int = 1
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    max_decoder_steps: int = 1000
    gate_threshold: float = 0.5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1

    # Attention
    attention_rnn_dim: int = 1024
    attention_dim: int = 128

    # Location layer
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31

    # Postnet
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5

    ################################
    # Optimization Hyperparameters #
    ################################
    use_saved_learning_rate: bool = False
    learning_rate: float = 1e-3
    weight_decay: float = 1e-6
    grad_clip_thresh: float = 1.0
    batch_size: int = 64
    mask_padding: bool = True

    ################################
    # TPU-native additions         #
    ################################
    # Computation dtype for matmuls/convs; params stay fp32.
    compute_dtype: str = "bfloat16"
    # Device mesh axes: (data, model). Product must divide len(jax.devices()).
    mesh_data: int = -1  # -1 => all devices on the data axis
    mesh_model: int = 1
    # Static-shape bucketing for XLA: pad text/mel lengths up to multiples.
    text_bucket_size: int = 32
    mel_bucket_size: int = 64
    # Write-once .npy mel cache beside each wav (suffix encodes the STFT
    # config); epochs after the first are plain np.loads.
    mel_cache: bool = True
    # Batches prefetched ahead of the train step by the background pipeline.
    prefetch_depth: int = 2
    # Per-iteration metric logging is kept (reference train.py logs loss
    # every step), but the HOST fetch is windowed: a window of step-metric
    # device handles is packed on device by a tiny jitted stack and fetched
    # in ONE transfer, so the host pays one tunnel round trip per `window`
    # steps instead of per step.  Over a remote-chip link EVERY blocking
    # fetch costs a full RTT (~150-200 ms on the axon tunnel) regardless of
    # whether the data is already computed — against a ~50 ms train step a
    # synchronous per-step fetch triples wall time.  Loss/grad-norm/KL log
    # values are bit-identical, just up to 2*window steps late (the s/it
    # column becomes a window-averaged wall time, and a non-finite loss is
    # *printed* up to 2*window-1 steps after the on-device update skip —
    # the skip itself is immediate, only its visibility is windowed).
    # 1 = reference-exact synchronous behavior (drain after every step).
    log_fetch_window: int = 16
    # Batch-assembly thread-pool width (torch DataLoader num_workers analog,
    # reference train.py:61; np.load + native collate release the GIL).
    num_workers: int = 4
    # Pad every batch to the dataset-wide maxima (single compiled shape)
    # even in single-host runs; multi-host runs always do this.
    fixed_batch_shapes: bool = False
    symbol_type: int = 1  # Korean jamo symbol inventory variant (1..4)
    # Hand-written BPTT for the decoder scan (models/decoder_bptt.py):
    # ~1.3x faster training than autodiff, gradient-identical (tests/test_bptt).
    use_custom_bptt: bool = True
    # Pallas training-scan kernels (ops/pallas/teacher_fwd.py): run the
    # decoder's teacher-forced forward AND recompute-backward each as one
    # kernel with the LSTM/attention weights pinned in VMEM across steps —
    # removes the per-step weight re-stream that makes the XLA scan
    # HBM-bound (B=64/T=512: 107 -> 79 ms measured, +35%; r=2: 52 ms) AND
    # the latency-bound small-batch regime (B=1: 36 -> 24 ms, B=6:
    # 33 -> 28 ms — the weight pin pays at every batch size).  "auto"
    # enables BOTH kernels (the fwd-only/bwd-only splits measure slower)
    # on a TPU backend with lane-aligned model dims and pinned buffers in
    # the VMEM budget; under a (data[, model]) mesh they run per-device
    # via shard_map.  "on"/"off" force.  T2V_PALLAS_FWD/BWD env vars
    # override for bisection.
    use_pallas_train_scan: str = "auto"
    # Gradient accumulation: each optimizer step runs `grad_accum_steps`
    # micro-batches of batch_size/grad_accum_steps through the model and
    # averages the gradients, reproducing the single big-batch gradient
    # (the reference's summed-KL term is re-scaled so 2 x B=32 micro-steps
    # == one B=64 step) up to the two things that are batch-grouping-
    # dependent in ANY framework: batchnorm batch statistics and per-micro
    # dropout/VAE RNG draws.  tests/test_train.py pins exact equivalence
    # with those held fixed.  Levers: effective batches beyond device
    # memory, and the measured per-step Pallas-kernel sweet spots at
    # smaller B (DESIGN.md batch sweep) at unchanged update semantics.
    grad_accum_steps: int = 1
    # Compute dtype inside the decoder recurrence.  "auto" (default) picks
    # per measured v5e regimes: compute_dtype (bf16) streams for large B*S
    # scans (HBM-bound), fp32 for small ones (latency-bound, where the casts
    # only add per-step ops).  Weights stay VMEM-resident either way.
    decoder_scan_dtype: str = "auto"
    # VAE reference-encoder input layout.  False (default, deliberate fix):
    # a true transpose to a (B, T, n_mels) time/frequency image.  True:
    # bug-compatible with reference modules.py:67, which raw-memory-reshapes
    # the (B, n_mel, T) mel via .view(N, 1, -1, n_mels) — each image row is
    # n_mels consecutive TIME samples of one mel channel, scrambling
    # channel/time.  Upstream pretrained checkpoints were trained on that
    # layout: set True when serving weights converted from the reference.
    ref_enc_raw_reshape: bool = False

    # ------------------------------------------------------------------

    def parse(self, hparams_string: str) -> "HParams":
        """Parse ``name=value,name=value`` overrides (TF1-HParams style)."""
        if not hparams_string:
            return self
        updates = {}
        for key, raw in _split_overrides(hparams_string):
            if not hasattr(self, key):
                raise ValueError(f"Unknown hparam: {key!r}")
            current = getattr(self, key)
            updates[key] = _coerce(raw, current)
        return dataclasses.replace(self, **updates)

    def values(self) -> dict:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> "HParams":
        return dataclasses.replace(self, **kw)


_PAIR_RE = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*=")


def _split_overrides(s: str):
    """Split 'a=1,b=[2,3],c="x,y"' on top-level commas only."""
    pairs = []
    i, n = 0, len(s)
    while i < n:
        m = _PAIR_RE.match(s, i)
        if not m:
            raise ValueError(f"Malformed hparams string at: {s[i:]!r}")
        key = m.group(1)
        j = m.end()
        depth = 0
        in_str = None
        start = j
        while j < n:
            ch = s[j]
            if in_str:
                if ch == in_str:
                    in_str = None
            elif ch in "\"'":
                in_str = ch
            elif ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
            elif ch == "," and depth == 0:
                break
            j += 1
        pairs.append((key, s[start:j].strip()))
        i = j + 1
    return pairs


def _coerce(raw: str, current):
    """Coerce a raw string to the type of the current value."""
    if isinstance(current, bool):
        if raw.lower() in ("true", "1"):
            return True
        if raw.lower() in ("false", "0"):
            return False
        raise ValueError(f"Cannot parse bool from {raw!r}")
    try:
        val = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        val = raw  # bare string
    if isinstance(current, float) and isinstance(val, int):
        val = float(val)
    return val


def create_hparams(hparams_string: str | None = None, verbose: bool = False) -> HParams:
    """Create model hyperparameters, parsing non-default overrides from a string.

    Mirrors the reference API (``hparams.py:3-126``).
    """
    hp = HParams()
    if hparams_string:
        hp = hp.parse(hparams_string)
    if verbose:
        print(f"Final parsed hparams: {hp.values()}")
    # Validate n_symbols against the ACTIVE symbol inventory — every cleaner
    # combo except pure-English routes through the Korean tables
    # (text/__init__.py::_tables), pure-English uses eng_symbols (65).
    # Ids >= n_symbols would be silently CLAMPED by XLA's gather semantics
    # (aliasing many symbols onto the last embedding row) — fail fast on
    # that; an oversized table is merely wasteful, so only warn.
    if tuple(hp.text_cleaners) == ("english_cleaners",):
        from .text.symbols import eng_symbols

        n_inv = len(eng_symbols)
        inv_desc = "english_cleaners inventory"
    else:
        from .text import change_symbol

        n_inv = len(change_symbol(hp.symbol_type))
        inv_desc = f"symbol_type={hp.symbol_type}"
    if hp.n_symbols < n_inv:
        raise ValueError(
            f"{inv_desc} has {n_inv} symbols but "
            f"n_symbols={hp.n_symbols}: ids >= {hp.n_symbols} would be "
            f"silently clamped in the embedding lookup. Set "
            f"n_symbols={n_inv}."
        )
    if hp.n_symbols != n_inv:
        import warnings

        warnings.warn(
            f"{inv_desc} has {n_inv} symbols but "
            f"n_symbols={hp.n_symbols}; set n_symbols={n_inv} so the "
            "embedding table matches the inventory.",
            stacklevel=2,
        )
    # n_frames_per_step r>1 IS supported here (the reference declares it
    # unsupported, hparams.py:87): the decoder emits r frames per scan step,
    # cutting the sequential step count to T/r.  Gate/alignment outputs
    # become per-step (T/r); collate already pads T to a multiple of r.
    if hp.n_frames_per_step < 1:
        raise ValueError(
            f"n_frames_per_step={hp.n_frames_per_step} must be >= 1"
        )
    if hp.use_pallas_train_scan not in ("auto", "on", "off"):
        raise ValueError(
            f"use_pallas_train_scan={hp.use_pallas_train_scan!r} must be "
            "'auto', 'on', or 'off'"
        )
    if hp.grad_accum_steps < 1:
        raise ValueError(
            f"grad_accum_steps={hp.grad_accum_steps} must be >= 1"
        )
    if hp.grad_accum_steps > 1 and hp.batch_size % hp.grad_accum_steps != 0:
        raise ValueError(
            f"batch_size={hp.batch_size} must be divisible by "
            f"grad_accum_steps={hp.grad_accum_steps}"
        )
    # ref-encoder conv geometry is accepted for config-surface parity but
    # fixed at the reference values (3x3, stride 2, pad 1 — modules.py:56-60)
    # in models/vae_gst.py; fail fast rather than silently ignore overrides.
    if (tuple(hp.ref_enc_size) != (3, 3)
            or tuple(hp.ref_enc_strides) != (2, 2)
            or tuple(hp.ref_enc_pad) != (1, 1)):
        raise ValueError(
            "ref_enc_size/ref_enc_strides/ref_enc_pad are fixed at the "
            "reference geometry (3x3 convs, stride 2, pad 1) in this "
            "implementation; adjust ref_enc_filters for capacity instead."
        )
    return hp
