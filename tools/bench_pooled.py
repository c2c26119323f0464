#!/usr/bin/env python
"""Measure what length-pooled batching (hp.sort_by_length) actually buys.

The reference defines `sort_by_length` but never uses it (hparams.py:29);
here it is a real feature (data/dataset.py: pool-local sort by cached mel
length).  This tool quantifies the claim on a wide-length-spread corpus:

  * padded-frame ratio  = padded mel frames / true mel frames over an epoch
    (host-side, from the loader's emitted batch shapes);
  * distinct (S, T) batch shapes (= XLA compile count);
  * real train steps/s on the device, pooled vs not (epoch 2, shapes warm).

Usage: python tools/bench_pooled.py [--batch 16] [--items 256] [--steps 24]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def build_corpus(tmpd: str, n_items: int, sr: int = 16000) -> str:
    """Wide spread: 1.0-8.0 s clips (a ~65-510 mel-frame spread), the regime
    real speech corpora live in (koemo clips span ~1-10 s)."""
    from tacotron2_vae_tpu.dsp.audio import save_wav

    rng = np.random.RandomState(0)
    lines = []
    for i in range(n_items):
        secs = 1.0 + 7.0 * rng.rand()
        n = int(secs * sr)
        t = np.arange(n) / sr
        wav = (0.3 * np.sin(2 * np.pi * (120 + 5 * (i % 40)) * t)).astype(
            np.float32
        )
        p = os.path.join(tmpd, f"p{i:03d}.wav")
        save_wav(p, wav, sr)
        # text length loosely tracks audio length (like real transcripts)
        text = "가나다라마바사아자차" * max(1, int(secs * 1.5))
        lines.append(f"{p}|{text[:int(8 + secs * 6)]}|0|{i % 4}")
    filelist = os.path.join(tmpd, "pool.txt")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return filelist


def epoch_stats(dl, ds, hp):
    """(padded_ratio, n_shapes, batches) from one host-side epoch."""
    true_frames = padded_frames = 0
    shapes = set()
    batches = 0
    for b in dl.epoch(0):
        B, T = b.mel.shape[0], b.mel.shape[2]
        padded_frames += B * T
        true_frames += int(np.sum(np.asarray(b.output_lengths)))
        shapes.add((b.text.shape[1], T))
        batches += 1
    return padded_frames / max(true_frames, 1), len(shapes), batches


def device_steps_per_sec(filelist, hp, steps):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from tacotron2_vae_tpu.data.dataset import DataLoader, TextMelDataset
    from tacotron2_vae_tpu.training.train_state import (
        create_train_state, make_train_step,
    )

    ds = TextMelDataset(filelist, hp)
    ds.warm_mel_cache()
    dl = DataLoader(ds, hp.batch_size, hp, shuffle=True)
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    rng = jax.random.PRNGKey(1)

    # Warmup: cycle shuffled epochs until one introduces NO new (S, T)
    # shape (cap 5).  A single epoch-0 pass is not enough — reshuffling
    # regroups lengths into different buckets, and a compile landing inside
    # the timed window dominates it (a full-size train-step compile is
    # ~30s vs a ~50ms step, which inverted the pooled-vs-unpooled verdict
    # in the first version of this tool: pooling makes MORE distinct
    # shapes, so it paid more in-window compiles).
    seen = set()
    epoch = 0
    while epoch < 5:
        new = 0
        for batch in dl.epoch(epoch):
            shape = (batch.text.shape[1], batch.mel.shape[2])
            if shape not in seen:
                seen.add(shape)
                new += 1
            rng, k = jax.random.split(rng)
            ts, m = step(ts, batch.asdict(), k)
        float(m["loss"])
        epoch += 1
        if new == 0:
            break
    # Timed window, per-step blocked.  Shuffled regrouping can surface a
    # rare new shape ARBITRARILY late (warmup can't exhaust the lattice),
    # so per-step timing + median-outlier exclusion is the only robust way
    # to keep a ~30s compile from swamping ~50ms steps.  Blocking adds the
    # tunnel dispatch latency to every step — identically for both
    # variants, so the pooled/unpooled ratio is unaffected.
    times, fcounts = [], []
    n = new_in_timed = 0
    while n < steps:
        for batch in dl.epoch(epoch):
            shape = (batch.text.shape[1], batch.mel.shape[2])
            if shape not in seen:
                seen.add(shape)
                new_in_timed += 1
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            ts, m = step(ts, batch.asdict(), k)
            float(m["loss"])
            times.append(time.perf_counter() - t0)
            fcounts.append(int(np.sum(np.asarray(batch.output_lengths))))
            n += 1
            if n >= steps:
                break
        epoch += 1
    med = float(np.median(times))
    keep = [i for i, t in enumerate(times) if t < 5 * med]
    dt = sum(times[i] for i in keep)
    frames = sum(fcounts[i] for i in keep)
    return len(keep) / dt, frames / dt, new_in_timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--items", type=int, default=256)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--host_only", action="store_true",
                   help="skip device timing (padded-ratio analysis only)")
    p.add_argument("--hparams", default="",
                   help="extra name=value overrides (e.g. a tiny model for "
                        "a CPU smoke run of the tool itself)")
    args = p.parse_args()

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.data.dataset import DataLoader, TextMelDataset

    tmpd = tempfile.mkdtemp(prefix="bench_pool_")
    filelist = build_corpus(tmpd, args.items)

    out = {"batch": args.batch, "items": args.items}
    for pooled in (False, True):
        extra = f",{args.hparams}" if args.hparams else ""
        hp = create_hparams(
            f"batch_size={args.batch},sort_by_length={pooled}{extra}"
        )
        ds = TextMelDataset(filelist, hp)
        ds.warm_mel_cache()
        dl = DataLoader(ds, args.batch, hp, shuffle=True)
        ratio, n_shapes, batches = epoch_stats(dl, ds, hp)
        tag = "pooled" if pooled else "unpooled"
        out[f"padded_frame_ratio_{tag}"] = round(ratio, 3)
        out[f"batch_shapes_{tag}"] = n_shapes
        if not args.host_only:
            sps, fps, cold = device_steps_per_sec(filelist, hp, args.steps)
            out[f"steps_per_sec_{tag}"] = round(sps, 2)
            out[f"true_frames_per_sec_{tag}"] = round(fps, 1)
            out[f"compiles_in_timed_window_{tag}"] = cold

    if "true_frames_per_sec_pooled" in out:
        out["pooled_speedup_true_frames"] = round(
            out["true_frames_per_sec_pooled"]
            / out["true_frames_per_sec_unpooled"], 3)
    out["padding_saving"] = round(
        out["padded_frame_ratio_unpooled"] / out["padded_frame_ratio_pooled"],
        3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
