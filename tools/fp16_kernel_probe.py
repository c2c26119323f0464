#!/usr/bin/env python
"""Probe: do the Pallas training-scan kernels compile + match at float16?

``pallas_train_scan_enabled`` keeps "auto" OFF under fp16_run /
compute_dtype=float16 (decoder_bptt.py): the TPU MXU is bf16 hardware and
f16 streams were unvalidated there.  Interpret-mode gradient parity is
pinned by tests/test_bptt.py::test_pallas_kernels_fp16_stream_dtype; this
tool answers the REAL-CHIP half of the question — does Mosaic compile an
f16-stream kernel at reference model dims, and if so do its loss/grads
match autodiff of the XLA scan run at the same f16 compute dtype?

Run on a free TPU chip:  python tools/fp16_kernel_probe.py [--batch 16]
Prints one JSON line {compiles, value_ok, grad_ok, max_rel_err, ...};
the result is recorded in DESIGN.md ("fp16 and the training kernels").
"""

from __future__ import annotations

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--s", type=int, default=128)
    p.add_argument("--t", type=int, default=256)
    p.add_argument("--dtype", default="float16",
                   choices=["float16", "bfloat16", "float32"])
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpreter (CPU smoke of this script)")
    args = p.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.models import decoder_bptt as bptt

    hp = create_hparams()  # reference dims: P=256 H=1024 E=512 A=128 F=32
    B, S, T = args.batch, args.s, args.t
    P, H, E = hp.prenet_dim, hp.attention_rnn_dim, hp.encoder_embedding_dim
    A, F = hp.attention_dim, hp.attention_location_n_filters
    K = hp.attention_location_kernel_size

    rng = np.random.RandomState(0)
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    scan_params = {
        "attn_w": r(P + E + H, 4 * H), "attn_b": r(4 * H),
        "dec_w": r(H + E + H, 4 * H), "dec_b": r(4 * H),
        "query_w": r(H, A), "loc_w": r(K, 2, F),
        "loc_dense_w": r(F, A), "v_w": r(A, 1),
    }
    prenet_seq = r(T, B, P)
    memory = r(B, S, E)
    pmem = r(B, S, A)
    lengths = jnp.asarray([S - (i % 5) for i in range(B)])
    valid = jnp.arange(S)[None, :] < lengths[:, None]
    add_mask = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
    km = jax.random.split(jax.random.PRNGKey(3), 4)
    masks = tuple(
        bptt._dropout_mask(km[i], (T, B, H), 0.9) for i in range(4)
    )

    cfg = bptt.ScanConfig(0.9, 0.9, True, compute_dtype=args.dtype)
    cfg_pallas = cfg._replace(use_pallas_fwd=True, use_pallas_bwd=True,
                              pallas_interpret=args.interpret)

    def make_loss(c):
        def loss(scan_params, prenet_seq, memory, pmem):
            h, _, w = bptt.scan_core(
                scan_params, prenet_seq, memory, pmem, add_mask, masks, c
            )
            return jnp.sum(h ** 2) + jnp.sum(w ** 3)
        return loss

    out = {"dtype": args.dtype, "B": B, "S": S, "T": T,
           "device": jax.devices()[0].device_kind}
    argsv = (scan_params, prenet_seq, memory, pmem)
    try:
        v1, g1 = jax.jit(jax.value_and_grad(
            make_loss(cfg_pallas), argnums=(0, 1, 2, 3)))(*argsv)
        v1 = float(v1)
        g1 = jax.tree_util.tree_map(np.asarray, g1)
        out["compiles"] = True
    except Exception as e:  # Mosaic compile / runtime failure
        out["compiles"] = False
        out["error"] = f"{type(e).__name__}: {str(e)[:400]}"
        print(json.dumps(out))
        return

    v2, g2 = jax.jit(jax.value_and_grad(
        make_loss(cfg), argnums=(0, 1, 2, 3)))(*argsv)
    v2 = float(v2)
    g2 = jax.tree_util.tree_map(np.asarray, g2)

    # fp32-stream XLA autodiff as ground truth: two low-precision
    # implementations (Pallas vs XLA at the same compute dtype) can
    # legitimately diverge from EACH OTHER through T steps of recurrence
    # while being equally good approximations of the true gradient — the
    # meaningful check is whether the kernel sits the same distance from
    # fp32 truth as the XLA scan does, not whether their roundings agree.
    v_ref, g_ref = jax.jit(jax.value_and_grad(
        make_loss(cfg._replace(compute_dtype="float32")),
        argnums=(0, 1, 2, 3)))(*argsv)
    g_ref = jax.tree_util.tree_map(np.asarray, g_ref)

    leaf_names = (
        [f"p.{k}" for k, _ in sorted(scan_params.items())]
        + ["prenet_seq", "memory", "pmem"]
    )

    def dist(g, ref):
        """max over leaves of max|g-ref| / max|ref| (floor 1e-3)."""
        errs = []
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(ref)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(1e-3, float(np.max(np.abs(b))))
            errs.append(float(np.max(np.abs(a - b)) / scale))
        return errs

    finite = all(
        bool(np.all(np.isfinite(np.asarray(a, np.float32))))
        for a in jax.tree_util.tree_leaves(g1)
    )
    err_pallas = dist(g1, g_ref)   # kernel vs fp32 truth
    err_xla = dist(g2, g_ref)      # low-precision XLA vs fp32 truth
    err_mutual = dist(g1, g2)      # the two roundings vs each other
    # kernel is "as good as" the XLA scan when its distance to truth is
    # within 2x of XLA's own rounding distance on every leaf (plus an
    # absolute floor for leaves where XLA is nearly exact)
    ratio = max(
        p / max(x, 1e-3) for p, x in zip(err_pallas, err_xla)
    )
    out.update({
        "value_pallas": v1, "value_xla": v2, "value_fp32": float(v_ref),
        "value_ok": abs(v1 - v2) < 1e-2 * (1 + abs(v2)),
        "grads_finite": finite,
        "max_rel_err_pallas_vs_fp32": round(max(err_pallas), 5),
        "max_rel_err_xla_vs_fp32": round(max(err_xla), 5),
        "max_rel_err_mutual": round(max(err_mutual), 5),
        "worst_truth_ratio_pallas_over_xla": round(ratio, 3),
        "grad_ok": finite and ratio < 2.0,
        "per_leaf": {
            n: {"pallas_vs_fp32": round(p, 5), "xla_vs_fp32": round(x, 5)}
            for n, p, x in zip(leaf_names, err_pallas, err_xla)
        },
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
