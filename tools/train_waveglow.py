#!/usr/bin/env python
"""Train the JAX WaveGlow vocoder on a wav filelist (flow NLL).

The reference never trains its vocoder — it loads a pickled pretrained
model from the NVIDIA submodule (synthesizer.py:79-80; training happens in
the external waveglow repo).  This makes the vocoder trainable inside the
framework: NVIDIA mel2samp-style data (random fixed-length audio segments,
mel computed from the segment) + Adam on the flow negative log-likelihood
(models/waveglow.py::waveglow_loss).

Usage:
  python tools/train_waveglow.py --filelist filelists/koemo_spk_emo_all_train.txt \
      --output_dir /tmp/wg --steps 10000 [--segment 16000] [--batch 4] \
      [--sigma 1.0] [--lr 1e-4]

Checkpoints are orbax PyTree snapshots of the FULL training state
(params + Adam state + step — same convention as training/checkpoint.py);
resume with --resume <dir> for a bit-continuous trajectory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

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

# Honor JAX_PLATFORMS=cpu (this image's site config pins the TPU plugin
# and ignores the env var) — lets tests/CI run the CLI off-chip.
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import optax
import orbax.checkpoint as ocp

from tacotron2_vae_tpu.data import native
from tacotron2_vae_tpu.dsp.stft import TacotronSTFT
from tacotron2_vae_tpu.models import waveglow as wg
from tacotron2_vae_tpu.data.dataset import load_filepaths_and_text


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class SegmentSampler:
    """mel2samp equivalent: random fixed-length segments + segment mel."""

    def __init__(self, filelist, segment, sr, seed=1234):
        self.entries = [e[0] for e in load_filepaths_and_text(filelist)]
        self.segment = segment
        self.sr = sr
        self.rng = np.random.RandomState(seed)
        self.stft = TacotronSTFT(1024, 256, 1024, 80, sr, 0.0, 8000.0)

    def batch(self, n):
        segs, failures = [], 0
        while len(segs) < n:
            if failures >= max(50, 3 * len(self.entries)):
                raise RuntimeError(
                    f"No usable wavs after {failures} attempts — check the "
                    f"filelist paths and that the corpus is "
                    f"{self.sr} Hz (use --sampling_rate)."
                )
            path = self.entries[self.rng.randint(len(self.entries))]
            try:
                audio, sr = native.load_wav(path, scale=32768.0)
            except (FileNotFoundError, OSError, ValueError):
                failures += 1
                continue
            if sr != self.sr:
                failures += 1
                continue
            if len(audio) < self.segment:
                audio = np.pad(audio, (0, self.segment - len(audio)))
                start = 0
            else:
                start = self.rng.randint(len(audio) - self.segment + 1)
            segs.append(audio[start : start + self.segment])
        audio = np.stack(segs).astype(np.float32)
        # fixed-shape prepadded path: matmul DFT, one fast compile (XLA's
        # TPU rfft+gather form compiles in minutes for new batched shapes)
        pad = self.stft.filter_length // 2
        padded = np.stack([
            np.pad(a, pad, mode="reflect") for a in audio
        ])
        mel = np.asarray(self.stft.mel_spectrogram_prepadded(padded))
        n_frames = self.segment // self.stft.hop_length + 1
        return jnp.asarray(audio), jnp.asarray(mel[:, :, :n_frames])


def _export(params, cfg, args):
    """Write the self-describing serving pickle (config + params)."""
    import dataclasses
    import pickle

    store = np.dtype(args.export_dtype)
    blob = {
        "waveglow": jax.tree_util.tree_map(
            lambda x: np.asarray(x, store), params
        ),
        "config": dataclasses.asdict(cfg),
    }
    with open(args.export, "wb") as f:
        pickle.dump(blob, f)
    print("exported", args.export)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--filelist", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--segment", type=int, default=16000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--sampling_rate", type=int, default=16000)
    p.add_argument("--checkpoint_every", type=int, default=2000)
    p.add_argument("--resume", default=None)
    p.add_argument("--n_flows", type=int, default=12)
    p.add_argument("--n_channels", type=int, default=256)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--mesh", default=None, metavar="DATA,MODEL",
                   help="train on a (data, model) device mesh, e.g. 8,1 "
                        "for pure dp or 4,2 for dp+tp over the WN stack")
    p.add_argument("--export", default=None, metavar="PATH.pkl",
                   help="after the last step, also write a self-describing "
                        "serving pickle {waveglow: params, config: ...} that "
                        "Synthesizer.load() consumes directly")
    p.add_argument("--export_dtype", default="float32",
                   choices=["float32", "float16"],
                   help="storage dtype for --export (float16 halves the "
                        "artifact; serving casts back to fp32)")
    p.add_argument("--upsample_kernel", type=int, default=1024)
    p.add_argument("--n_group", type=int, default=8)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    # segment must squeeze into n_group lanes
    assert args.segment % 8 == 0

    cfg = wg.WaveGlowConfig(
        n_flows=args.n_flows, n_channels=args.n_channels,
        n_layers=args.n_layers, upsample_kernel=args.upsample_kernel,
        n_group=args.n_group,
    )
    params = wg.init(jax.random.PRNGKey(0), cfg)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = opt.init(params)
    start_step = 0
    ckptr = ocp.PyTreeCheckpointer()
    if args.resume:
        template = {
            "step": 0,
            "params": _to_host(params),
            "opt_state": _to_host(opt_state),
        }
        payload = ckptr.restore(os.path.abspath(args.resume), item=template)
        start_step = int(payload["step"])
        params = payload["params"]
        # restore leaves into the optax pytree (preserves NamedTuple types)
        opt_state = jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, getattr(t, "dtype", None)),
            opt_state, payload["opt_state"],
        )
    if start_step >= args.steps:
        # export-only invocation: --resume <ckpt> --steps 0 --export <pkl>
        # turns any saved checkpoint into a serving artifact (e.g. the
        # best-held-out-NLL checkpoint rather than the last one).
        if args.export:
            _export(params, cfg, args)
        print(json.dumps({"final_loss": None, "steps": start_step,
                          "note": "resume step >= --steps; exported only"
                          if args.export else
                          "resume step >= --steps; nothing to do"}))
        return
    if args.mesh:
        from tacotron2_vae_tpu.parallel import (
            make_mesh,
            make_waveglow_parallel_train_step,
            shard_waveglow_state,
        )

        data, model = (int(x) for x in args.mesh.split(","))
        if args.batch % data != 0:
            raise SystemExit(f"--batch {args.batch} not divisible by "
                             f"data axis {data}")
        mesh = make_mesh(devices=jax.devices()[: data * model],
                         data=data, model=model)
        params, opt_state = shard_waveglow_state(params, opt_state, mesh)
        step_fn = make_waveglow_parallel_train_step(cfg, opt, mesh,
                                                    args.sigma)
        print(f"mesh: data={data} model={model}")
    else:
        step_fn = jax.jit(wg.make_waveglow_train_step(cfg, opt, args.sigma))

    # advance the segment RNG past the segments earlier steps consumed so a
    # resumed run continues the stream instead of replaying it
    sampler = SegmentSampler(
        args.filelist, args.segment, args.sampling_rate,
        seed=1234 + start_step,
    )
    # Training provenance: every 50-step NLL lands in <output_dir>/nll.csv
    # (append mode so --resume continues the same curve) plus a run-config
    # JSON — the record of what produced a given exported vocoder.
    nll_csv = os.path.join(args.output_dir, "nll.csv")
    write_header = not os.path.exists(nll_csv)
    with open(os.path.join(args.output_dir, "run_config.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()}, f, indent=1)
    csv_f = open(nll_csv, "a")
    if write_header:
        csv_f.write("step,nll,steps_per_sec\n")
        csv_f.flush()  # survive an external kill before the first log row
    t0, loss = None, None
    for i in range(start_step, args.steps):
        audio, mel = sampler.batch(args.batch)
        opt_state, params, loss = step_fn(opt_state, params, audio, mel)
        if i == start_step:
            print(f"step {i}: loss {float(loss):.4f} (compiled)")
            t0 = time.perf_counter()
        elif (i + 1) % 50 == 0:
            rate = (i - start_step) / (time.perf_counter() - t0)
            print(f"step {i + 1}: loss {float(loss):.4f}  {rate:.1f} steps/s")
            csv_f.write(f"{i + 1},{float(loss):.6f},{rate:.2f}\n")
            csv_f.flush()
        if (i + 1) % args.checkpoint_every == 0 or i + 1 == args.steps:
            path = os.path.abspath(
                os.path.join(args.output_dir, f"waveglow_{i + 1}")
            )
            ckptr.save(path, {
                "step": i + 1,
                "params": _to_host(params),
                "opt_state": _to_host(opt_state),
            }, force=True)
            print("saved", path)
    csv_f.close()
    if args.export:
        _export(params, cfg, args)
    print(json.dumps({"final_loss": float(loss), "steps": args.steps}))


if __name__ == "__main__":
    main()
