"""Micro-probe: which (1, N) -> (rows, lanes) reshapes does Mosaic accept?

The training-scan backward retiles per-example rows with
``x[b:b+1].reshape(S, X)``; the committed kernel only ever used X=128
(lane-width target).  Round 5 wants an F=32-lane target for the F-width
location features — this probes whether that reshape (and a 32-lane
output block) compiles on the real chip, isolating the failing op from
the full kernel (whose compile takes ~10 min).

Usage: python tools/reshape_probe.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_reshape(S, X, B=4):
    """x (B, S*X) -> per-b reshape (S, X) -> store into (B*S, X) out."""

    def kernel(x_ref, o_ref):
        x = x_ref[:] + 1.0
        for b in range(B):
            o_ref[b * S:(b + 1) * S, :] = x[b:b + 1].reshape(S, X)

    x = jnp.arange(B * S * X, dtype=jnp.float32).reshape(B, S * X)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * S, X), jnp.float32),
        )(x)
        ok = bool(jnp.allclose(out, x.reshape(B * S, X) + 1.0))
        print(f"reshape (1,{S * X})->({S},{X}): compiles, correct={ok}")
        return ok
    except Exception as e:
        print(f"reshape (1,{S * X})->({S},{X}): FAIL {type(e).__name__}: "
              f"{str(e)[:160]}")
        return False


def probe_out_block(BS=512, F=32, T=4):
    """Per-step (1, BS, F) output block written from a matmul value."""

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32)

    x = jnp.ones((BS, 128), jnp.float32)
    w = jnp.ones((128, F), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1, BS, F), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, BS, F), jnp.float32),
        )(x, w)
        ok = bool(jnp.allclose(out, 128.0))
        print(f"out block (1,{BS},{F}): compiles, correct={ok}")
        return ok
    except Exception as e:
        print(f"out block (1,{BS},{F}): FAIL {type(e).__name__}: "
              f"{str(e)[:160]}")
        return False


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe_reshape(128, 128)   # the proven-legal control
    probe_reshape(128, 32)    # the F-width suspect
    probe_reshape(128, 256)   # wider-than-lane target (multiple of 128)
    probe_out_block()
