"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): teacher-forced mel frames/sec/chip on the full-size
Tacotron2-VAE model.  Extra context fields (inference RTF, step latency) ride
in the same JSON object.  The reference publishes no numbers (BASELINE.md),
so vs_baseline is null.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.models import tacotron2
    from tacotron2_vae_tpu.training.train_state import (
        create_train_state,
        make_train_step,
    )

    t_start = time.perf_counter()
    # Flagship config, reference-recommended batch size (README.md:53).
    B, S, T = 6, 128, 512
    hp = create_hparams("batch_size=6")
    rng = np.random.RandomState(0)
    batch = {
        "text": rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32),
        "input_lengths": np.full((B,), S, np.int32),
        "mel": (rng.randn(B, hp.n_mel_channels, T) * 0.3).astype(np.float32),
        "gate": np.pad(
            np.zeros((B, T - 1), np.float32), ((0, 0), (0, 1)),
            constant_values=1.0,
        ),
        "output_lengths": np.full((B,), T, np.int32),
        "emotions": np.eye(hp.n_emotions, dtype=np.float32)[
            rng.randint(0, hp.n_emotions, size=B)
        ],
    }
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}

    ts = create_train_state(jax.random.PRNGKey(0), hp)
    # NOTE: no donate_argnums and no block_until_ready — both misbehave
    # through the axon remote-TPU tunnel (block_until_ready returns before
    # execution finishes).  A 4-byte scalar fetch is the only reliable sync.
    step = jax.jit(make_train_step(hp))

    # Warmup / compile (fetch forces completion).
    ts, metrics = step(ts, batch, jax.random.PRNGKey(0))
    float(metrics["loss"])
    for i in range(3):
        ts, metrics = step(ts, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, metrics = step(ts, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])  # sync
    dt = (time.perf_counter() - t0) / n_iters
    frames_per_sec = B * T / dt

    # Secondary: throughput at the hparams-default batch size (64) — the
    # realistic TPU training configuration (B=6 is the reference's command).
    B2 = 64
    batch64 = {
        "text": jax.numpy.asarray(
            rng.randint(2, hp.n_symbols, size=(B2, S)).astype(np.int32)),
        "input_lengths": jax.numpy.full((B2,), S, jax.numpy.int32),
        "mel": jax.numpy.asarray(
            (rng.randn(B2, hp.n_mel_channels, T) * 0.3).astype(np.float32)),
        "gate": jax.numpy.asarray(np.pad(
            np.zeros((B2, T - 1), np.float32), ((0, 0), (0, 1)),
            constant_values=1.0)),
        "output_lengths": jax.numpy.full((B2,), T, jax.numpy.int32),
        "emotions": jax.numpy.asarray(np.eye(hp.n_emotions, dtype=np.float32)[
            rng.randint(0, hp.n_emotions, size=B2)]),
    }
    # AOT-compile the B=64 step ONCE: the same executable serves the timing
    # loop and the cost analysis (a second .lower().compile() costs minutes
    # through the remote-compile tunnel and used to eat the soft budget).
    ts64 = create_train_state(jax.random.PRNGKey(0), hp)
    compiled64 = step.lower(ts64, batch64, jax.random.PRNGKey(0)).compile()
    ts64, m64 = compiled64(ts64, batch64, jax.random.PRNGKey(0))
    float(m64["loss"])
    t0 = time.perf_counter()
    for i in range(8):
        ts64, m64 = compiled64(ts64, batch64, jax.random.PRNGKey(0))
    float(m64["loss"])
    dt64 = (time.perf_counter() - t0) / 8
    frames_per_sec_b64 = B2 * T / dt64

    # FLOPs + MFU from XLA's own cost model for the compiled B=64 step.
    flops_per_step = None
    mfu_b64 = None
    try:
        ca = compiled64.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    if flops_per_step:
        kind = jax.devices()[0].device_kind.lower()
        peak = None
        for key, val in (
            ("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
            ("v6 lite", 918e12), ("v6e", 918e12), ("v4", 275e12),
            ("v3", 123e12), ("v2", 45e12),
        ):
            if key in kind:
                peak = val
                break
        if peak:
            mfu_b64 = flops_per_step / dt64 / peak

    # Capability extension: n_frames_per_step=2 (r>1 is unsupported in the
    # reference, hparams.py:87) halves the sequential scan length — the
    # dominant step cost — for a large opt-in throughput win.
    frames_per_sec_b64_r2 = None
    if time.perf_counter() - t_start < float(
        os.environ.get("BENCH_BUDGET_S", "420")
    ):
        try:
            hp2 = create_hparams("batch_size=64,n_frames_per_step=2")
            step2 = jax.jit(make_train_step(hp2))
            ts2 = create_train_state(jax.random.PRNGKey(0), hp2)
            ts2, m2 = step2(ts2, batch64, jax.random.PRNGKey(0))
            float(m2["loss"])
            t0 = time.perf_counter()
            for i in range(8):
                ts2, m2 = step2(ts2, batch64, jax.random.PRNGKey(i))
            float(m2["loss"])
            frames_per_sec_b64_r2 = B2 * T / ((time.perf_counter() - t0) / 8)
            del ts2
        except Exception:
            import traceback

            traceback.print_exc()
    del ts64, batch64

    # Host input pipeline: featurize->collate throughput on synthetic wavs
    # (4 distinct lengths => 4 STFT compiles), cold (wav decode + STFT +
    # cache write) then warm (np.load from the write-once mel cache).  The
    # pipeline must outrun the device step or the chip starves.
    input_cold_fps = input_warm_fps = None
    try:
        import tempfile

        from tacotron2_vae_tpu.data import DataLoader, TextMelDataset
        from tacotron2_vae_tpu.data.prefetch import prefetch
        from tacotron2_vae_tpu.dsp.audio import save_wav

        tmpd = tempfile.mkdtemp(prefix="bench_data_")
        # 4 batches of 64: enough for the num_workers batch-assembly pool
        # to overlap batches (1 batch/epoch would degenerate to serial).
        n_items, sr = 256, hp.sampling_rate
        lengths_s = [4.0, 5.5, 7.0, 8.5]
        lines = []
        total_frames = 0
        for i in range(n_items):
            n = int(lengths_s[i % 4] * sr)
            t = np.arange(n) / sr
            wav = (0.3 * np.sin(2 * np.pi * (120 + 3 * i) * t)).astype(
                np.float32)
            p = os.path.join(tmpd, f"b{i:03d}.wav")
            save_wav(p, wav, sr)
            total_frames += n // hp.hop_length + 1
            lines.append(f"{p}|벤치마크 입력 파이프라인 문장 {i}|0|{i % 4}")
        filelist = os.path.join(tmpd, "bench.txt")
        with open(filelist, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")

        ds = TextMelDataset(filelist, hp, shuffle=False)
        dl = DataLoader(ds, 64, hp, shuffle=False, drop_last=False)
        t0 = time.perf_counter()
        for _ in prefetch(dl.epoch(0), depth=2):
            pass
        input_cold_fps = total_frames / (time.perf_counter() - t0)
        # Warm path = np.load + native collate through the num_workers pool;
        # single-epoch timings vary ~5x with page-cache state, so report the
        # median of 3 epochs.
        warm_times = []
        for rep in range(3):
            t0 = time.perf_counter()
            for _ in prefetch(dl.epoch(1 + rep), depth=2):
                pass
            warm_times.append(time.perf_counter() - t0)
        input_warm_fps = total_frames / sorted(warm_times)[1]
    except Exception:
        import traceback

        traceback.print_exc()

    # Secondary: autoregressive inference RTF (mel frames vs realtime audio).
    params, state = ts.params, ts.model_state
    text = jax.numpy.asarray(
        rng.randint(2, hp.n_symbols, size=(1, 64)).astype(np.int32)
    )
    style = jax.numpy.zeros((1, hp.E))

    def time_synth(use_pallas):
        def synth(params, state, text, style, rng):
            # gate_threshold > 1 can never fire: forces the full 600 decoder
            # steps so the RTF is an upper bound (a trained gate stops earlier).
            return tacotron2.infer(
                params, state, text, style, hp, rng=rng, max_steps=600,
                gate_threshold=1.1, prenet_dropout_enabled=True,
                use_pallas=use_pallas,
            )

        synth_j = jax.jit(synth)
        out = synth_j(params, state, text, style, jax.random.PRNGKey(0))
        float(out[4][0])  # sync on the lengths output
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            out = synth_j(params, state, text, style, jax.random.PRNGKey(i))
            float(out[4][0])
        return (time.perf_counter() - t0) / reps

    n_frames = 600  # buffer length (upper bound on generated frames)
    audio_secs = n_frames * hp.hop_length / hp.sampling_rate  # 9.6 s
    rtf_xla = time_synth(False) / audio_secs
    # The fused Pallas kernel compiles slowly through the remote-TPU tunnel
    # on a cold cache; skip it if the soft budget is already spent (the JSON
    # line must be printed before any external timeout).
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    rtf = rtf_xla
    if time.perf_counter() - t_start < budget:
        try:
            rtf = time_synth(True) / audio_secs  # fused Pallas decode loop
        except Exception:
            rtf = rtf_xla

    print(
        json.dumps(
            {
                "metric": "mel_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "frames/s",
                "vs_baseline": None,
                "train_step_ms": round(dt * 1e3, 2),
                "batch": B,
                "mel_frames": T,
                "frames_per_sec_batch64": round(frames_per_sec_b64, 1),
                "train_step_ms_batch64": round(dt64 * 1e3, 2),
                "flops_per_step_batch64": flops_per_step,
                "mfu_batch64": round(mfu_b64, 4) if mfu_b64 else None,
                "frames_per_sec_batch64_r2": (
                    round(frames_per_sec_b64_r2, 1)
                    if frames_per_sec_b64_r2 else None),
                "input_pipeline_fps_cold": (
                    round(input_cold_fps, 1) if input_cold_fps else None),
                "input_pipeline_fps_warm": (
                    round(input_warm_fps, 1) if input_warm_fps else None),
                "inference_rtf_600_frames": round(rtf, 4),
                "inference_rtf_xla_while_loop": round(rtf_xla, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
