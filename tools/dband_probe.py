"""Round-5 hardware probe: does the dband-accumulating backward kernel
compile+run on the real chip at flagship dims, and where is the new VMEM
fail point?  (The dband accumulator adds ~20 MiB of pinned fp32 at
S=128/A=128 — the 88 MiB auto-gate threshold was calibrated for the old
kernel and must be re-pinned against Mosaic's actual accept/reject.)

Usage: python tools/dband_probe.py [B S] [B S] ...  (default probes
(64,128) and (64,160))
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))


def probe(B, S, T=64):
    import jax
    import jax.numpy as jnp

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.models.decoder_bptt import (
        _pallas_vmem_estimate,
        teacher_forced,
    )

    hp = create_hparams("use_pallas_train_scan='on'")
    est = _pallas_vmem_estimate(hp, B, S, 2) / 2**20
    print(f"B={B} S={S}: estimate {est:.1f} MiB ... ", end="", flush=True)
    rng = np.random.RandomState(0)
    params_key = jax.random.PRNGKey(0)
    from tacotron2_vae_tpu.models import decoder as dec_mod

    params = dec_mod.init(params_key, hp)
    memory = jnp.asarray(rng.randn(B, S, hp.encoder_embedding_dim)
                         .astype(np.float32) * 0.1)
    mels = jnp.asarray(rng.randn(B, hp.n_mel_channels, T)
                       .astype(np.float32) * 0.3)
    lengths = jnp.full((B,), S, jnp.int32)

    def loss(p):
        mel, gate, align = teacher_forced(
            p, memory, mels, lengths, hp, train=True,
            rng=jax.random.PRNGKey(1), dtype=jnp.bfloat16,
        )
        return jnp.mean(mel ** 2) + jnp.mean(gate ** 2)

    try:
        t0 = time.perf_counter()
        g = jax.jit(jax.grad(loss))(params)
        gn = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0))
        print(f"OK compile+run {time.perf_counter() - t0:.1f}s "
              f"|g|1={gn:.3e} finite={np.isfinite(gn)}")
        return True
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"FAIL: {type(e).__name__}: {msg}")
        return False


if __name__ == "__main__":
    args = sys.argv[1:]
    shapes = ([(int(args[i]), int(args[i + 1]))
               for i in range(0, len(args), 2)]
              if args else [(64, 128), (64, 160)])
    for B, S in shapes:
        probe(B, S)
