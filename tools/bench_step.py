"""Quick train-step timer: python tools/bench_step.py [B] [hparam overrides].

Measures the steady-state jitted train step on the current devices; used for
perf bisection (bench.py is the official harness).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.training.train_state import (
        create_train_state,
        make_train_step,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    overrides = sys.argv[2] if len(sys.argv) > 2 else ""
    S, T = 128, 512
    hp = create_hparams(
        f"batch_size={B}" + ("," + overrides if overrides else ""))
    r = hp.n_frames_per_step
    T = ((T + r - 1) // r) * r  # collate pads mel length to a multiple of r
    rng = np.random.RandomState(0)
    batch = {
        "text": rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32),
        "input_lengths": np.full((B,), S, np.int32),
        "mel": (rng.randn(B, hp.n_mel_channels, T) * 0.3).astype(np.float32),
        "gate": np.pad(np.zeros((B, T - 1), np.float32), ((0, 0), (0, 1)),
                       constant_values=1.0),
        "output_lengths": np.full((B,), T, np.int32),
        "emotions": np.eye(hp.n_emotions, dtype=np.float32)[
            rng.randint(0, hp.n_emotions, size=B)],
    }
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    ts, m = step(ts, batch, jax.random.PRNGKey(0))
    loss0 = float(m["loss"])
    for i in range(3):
        ts, m = step(ts, batch, jax.random.PRNGKey(i))
    float(m["loss"])
    iters = 20 if B <= 16 else 10
    t0 = time.perf_counter()
    for i in range(iters):
        ts, m = step(ts, batch, jax.random.PRNGKey(i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"B={B} [{overrides}]: {dt * 1e3:.2f} ms  "
          f"{B * T / dt / 1e3:.1f}k frames/s  loss0={loss0:.4f}")


if __name__ == "__main__":
    main()
