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

Checkpoints are .npz pytree snapshots loadable with
tools/convert_torch_ckpt.load_waveglow_npz-style flattening; resume with
--resume <path.npz>.
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

import optax

from tacotron2_vae_tpu.data import native
from tacotron2_vae_tpu.dsp.stft import TacotronSTFT
from tacotron2_vae_tpu.models import waveglow as wg
from tacotron2_vae_tpu.data.dataset import load_filepaths_and_text


def flatten_params(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_into(tree, flat, prefix=""):
    if isinstance(tree, dict):
        return {k: unflatten_into(v, flat, f"{prefix}{k}/")
                for k, v in tree.items()}
    if isinstance(tree, list):
        return [unflatten_into(v, flat, f"{prefix}{i}/")
                for i, v in enumerate(tree)]
    if isinstance(tree, tuple):
        return tuple(unflatten_into(v, flat, f"{prefix}{i}/")
                     for i, v in enumerate(tree))
    return jnp.asarray(flat[prefix[:-1]])


class SegmentSampler:
    """mel2samp equivalent: random fixed-length segments + segment mel."""

    def __init__(self, filelist, segment, sr, seed=1234):
        self.entries = [e[0] for e in load_filepaths_and_text(filelist)]
        self.segment = segment
        self.sr = sr
        self.rng = np.random.RandomState(seed)
        self.stft = TacotronSTFT(1024, 256, 1024, 80, sr, 0.0, 8000.0)

    def batch(self, n):
        segs = []
        while len(segs) < n:
            path = self.entries[self.rng.randint(len(self.entries))]
            try:
                audio, sr = native.load_wav(path, scale=32768.0)
            except (FileNotFoundError, OSError, ValueError):
                continue
            if sr != self.sr:
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
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    # segment must squeeze into n_group lanes
    assert args.segment % 8 == 0

    cfg = wg.WaveGlowConfig(
        n_flows=args.n_flows, n_channels=args.n_channels,
        n_layers=args.n_layers,
    )
    params = wg.init(jax.random.PRNGKey(0), cfg)
    start_step = 0
    if args.resume:
        flat = dict(np.load(args.resume))
        start_step = int(flat.pop("__step__", 0))
        params = unflatten_into(params, flat)

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = opt.init(params)
    step_fn = jax.jit(wg.make_waveglow_train_step(cfg, opt, args.sigma))

    sampler = SegmentSampler(args.filelist, args.segment, args.sampling_rate)
    t0 = None
    for i in range(start_step, args.steps):
        audio, mel = sampler.batch(args.batch)
        opt_state, params, loss = step_fn(opt_state, params, audio, mel)
        if i == start_step:
            print(f"step {i}: loss {float(loss):.4f} (compiled)")
            t0 = time.perf_counter()
        elif (i + 1) % 50 == 0:
            rate = (i - start_step) / (time.perf_counter() - t0)
            print(f"step {i + 1}: loss {float(loss):.4f}  {rate:.1f} steps/s")
        if (i + 1) % args.checkpoint_every == 0 or i + 1 == args.steps:
            flat = flatten_params(jax.device_get(params))
            flat["__step__"] = np.asarray(i + 1)
            path = os.path.join(args.output_dir, f"waveglow_{i + 1}.npz")
            np.savez(path, **flat)
            print("saved", path)
    print(json.dumps({"final_loss": float(loss), "steps": args.steps}))


if __name__ == "__main__":
    main()
