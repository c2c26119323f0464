#!/usr/bin/env python
"""Full-size training smoke run on synthetic text-conditional data.

Builds a deterministic synthetic task — each mel frame is a character-specific
spectral pattern for the character aligned at that frame (plus noise) — so a
correct model/optimizer must (a) drive the loss down and (b) develop a
near-diagonal attention alignment. Runs a few hundred steps at full model
size and prints a JSON summary.

Usage: python tools/smoke_train.py [--steps 300] [--batch 16]
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
except Exception:
    pass

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.training.train_state import (
    create_train_state,
    make_train_step,
)


def synth_batch(rng, hp, B, S, frames_per_char=4, emotion_tilt=0.0):
    """Synthetic aligned text->mel task.

    With ``emotion_tilt`` > 0, each emotion adds a distinct spectral tilt to
    the mel — reachable only through the VAE latent, so the prosody encoder
    must separate emotions (used by tools/make_result_assets.py for the
    latent scatter/t-SNE result images)."""
    T = S * frames_per_char
    text = rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32)
    # character-specific spectral pattern bank
    bank = np.sin(
        np.arange(hp.n_mel_channels)[None, :] * (1.0 + np.arange(hp.n_symbols)[:, None] * 0.13)
    ).astype(np.float32) * 2.0 - 5.0
    mel = bank[text][:, :, None, :].repeat(frames_per_char, axis=2)
    mel = mel.reshape(B, T, hp.n_mel_channels).transpose(0, 2, 1)
    emo = rng.randint(0, hp.n_emotions, size=B)
    if emotion_tilt:
        tilt = np.cos(
            np.arange(hp.n_mel_channels)[None, :] * (0.05 + 0.11 * emo[:, None])
        ).astype(np.float32) * emotion_tilt
        mel = mel + tilt[:, :, None]
    mel = mel + rng.randn(*mel.shape).astype(np.float32) * 0.05
    # pad T to a multiple of r with gate=1 from the last real frame on,
    # exactly as data.dataset.collate does
    r = hp.n_frames_per_step
    T0 = T
    if T % r:
        pad = r - T % r
        mel = np.pad(mel, ((0, 0), (0, 0), (0, pad)))
        T += pad
    gate = np.zeros((B, T), np.float32)
    gate[:, T0 - 1:] = 1.0
    return {
        "text": jnp.asarray(text),
        "input_lengths": jnp.full((B,), S, jnp.int32),
        "mel": jnp.asarray(mel),
        "gate": jnp.asarray(gate),
        "output_lengths": jnp.full((B,), T0, jnp.int32),
        "emotions": jnp.asarray(np.eye(hp.n_emotions, dtype=np.float32)[emo]),
    }


def alignment_diagonality(align, frames_per_char, frames_per_step=1):
    """Mean attention mass within +-2 chars of the diagonal.

    align rows are decoder steps (r frames each at n_frames_per_step=r)."""
    B, T, S = align.shape
    t = np.arange(T) * frames_per_step
    expected = np.minimum(t // frames_per_char, S - 1)
    window = np.abs(np.arange(S)[None, :] - expected[:, None]) <= 2  # (T, S)
    return float((align * window[None]).sum(axis=2).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=32)
    p.add_argument("--hparams", type=str, default="",
                   help="extra hparam overrides, e.g. n_frames_per_step=2")
    args = p.parse_args()

    hp = create_hparams(
        "anneal_function='constant'"
        + ("," + args.hparams if args.hparams else "")
    )
    rng = np.random.RandomState(0)
    batches = [synth_batch(rng, hp, args.batch, args.seq) for _ in range(8)]

    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))

    losses, t0 = [], None
    for i in range(args.steps):
        ts, m = step(ts, batches[i % len(batches)], jax.random.PRNGKey(i))
        if i == 0:
            float(m["loss"])  # sync after compile
            t0 = time.perf_counter()
        if (i + 1) % 25 == 0:
            losses.append((i + 1, float(m["loss"])))
            print(f"step {i+1}: loss {losses[-1][1]:.4f}")
    wall = time.perf_counter() - t0

    # eval-mode forward for alignment inspection
    from tacotron2_vae_tpu.models import tacotron2

    out, _ = tacotron2.forward(
        ts.params, ts.model_state, batches[0], hp, train=False,
        rng=jax.random.PRNGKey(1),
    )
    diag = alignment_diagonality(
        np.asarray(out.alignments), 4, hp.n_frames_per_step
    )

    first = losses[0][1] if losses else float("nan")
    last = losses[-1][1] if losses else float("nan")
    summary = {
        "steps": args.steps,
        "batch": args.batch,
        "loss_first25": round(first, 4),
        "loss_final": round(last, 4),
        "loss_ratio": round(last / first, 4),
        "alignment_diagonality": round(diag, 4),
        "wall_s_after_compile": round(wall, 1),
        "steps_per_sec": round((args.steps - 1) / wall, 2),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
