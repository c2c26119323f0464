#!/usr/bin/env python
"""Decompose the B=64 train step: forward-only vs forward+backward vs the
decoder scan core alone.  Guides the partial-VMEM-pin kernel decision
(DESIGN.md "MFU lenses"): if the scan dominates and sits at the measured
HBM roofline, the remaining lever is pinning the ~36 MB bf16 LSTM weights
in VMEM across scan steps.

Usage: python tools/bench_scan_split.py [B] [T] [overrides]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.models import tacotron2
    from tacotron2_vae_tpu.training.loss import tacotron2_vae_loss
    from tacotron2_vae_tpu.training.train_state import (
        create_train_state,
        make_train_step,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    overrides = sys.argv[3] if len(sys.argv) > 3 else ""
    S = 128
    hp = create_hparams(f"batch_size={B}" + ("," + overrides if overrides else ""))

    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(2, hp.n_symbols, (B, S)).astype(np.int32)),
        "input_lengths": jnp.full((B,), S, jnp.int32),
        "mel": jnp.asarray((rng.randn(B, hp.n_mel_channels, T) * 0.3).astype(np.float32)),
        "gate": jnp.asarray(np.pad(np.zeros((B, T - 1), np.float32),
                                   ((0, 0), (0, 1)), constant_values=1.0)),
        "output_lengths": jnp.full((B,), T, jnp.int32),
        "emotions": jnp.asarray(np.eye(hp.n_emotions, dtype=np.float32)[
            rng.randint(0, hp.n_emotions, B)]),
    }
    ts = create_train_state(jax.random.PRNGKey(0), hp)

    def timeit(fn, *args, reps=8):
        out = fn(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])

    # 1. full train step (fwd + bwd + adam)
    step = jax.jit(make_train_step(hp))
    t_full = timeit(lambda: step(ts, batch, jax.random.PRNGKey(0)))

    # 2. forward + loss only (no grad)
    @jax.jit
    def fwd_loss(params, model_state, batch, rng):
        out, _ = tacotron2.forward(params, model_state, batch, hp,
                                   train=True, rng=rng)
        total, _ = tacotron2_vae_loss(out, batch["mel"], batch["gate"],
                                      jnp.int32(1000), hp)
        return total

    t_fwd = timeit(lambda: fwd_loss(ts.params, ts.model_state, batch,
                                    jax.random.PRNGKey(0)))

    # 3. grad-only lens: value_and_grad of the same loss
    @jax.jit
    def vgrad(params, model_state, batch, rng):
        def f(p):
            out, _ = tacotron2.forward(p, model_state, batch, hp,
                                       train=True, rng=rng)
            total, _ = tacotron2_vae_loss(out, batch["mel"], batch["gate"],
                                          jnp.int32(1000), hp)
            return total
        # Return value + a grad contraction: returning only the value lets
        # XLA dead-code-eliminate the entire backward pass.
        v, g = jax.value_and_grad(f)(params)
        return v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    t_vg = timeit(lambda: vgrad(ts.params, ts.model_state, batch,
                                jax.random.PRNGKey(0)))

    print(f"B={B} T={T} S={S} device={jax.devices()[0]}")
    print(f"full train step : {t_full * 1e3:8.2f} ms")
    print(f"fwd+loss only   : {t_fwd * 1e3:8.2f} ms")
    print(f"value_and_grad  : {t_vg * 1e3:8.2f} ms  (bwd ~= {(t_vg - t_fwd) * 1e3:.2f} ms)")
    print(f"optimizer+misc  : {(t_full - t_vg) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
