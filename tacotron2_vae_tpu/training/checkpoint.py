"""Checkpoint save/load via Orbax.

Same logical payload as the reference (train.py:92-119): model params,
optimizer state, iteration, learning rate — plus batchnorm running stats.
``warm_start`` loads weights only (reference train.py:92-97).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ts: TrainState, learning_rate: float, output_dir: str,
                    iteration: int | None = None) -> str:
    """Write ``output_dir/checkpoint_{iteration}`` (reference naming)."""
    iteration = int(ts.step) if iteration is None else iteration
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint_{iteration}"))
    payload = {
        "iteration": iteration,
        "learning_rate": float(learning_rate),
        "params": _to_host(ts.params),
        "model_state": _to_host(ts.model_state),
        "opt_state": _to_host(ts.opt_state),
    }
    if ts.scaler is not None:  # fp16_run: persist the dynamic loss scale
        payload["scaler"] = list(_to_host(ts.scaler))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str, ts: TrainState) -> tuple[TrainState, int, float]:
    """Full resume: params + optimizer + iteration (reference train.py:100-110)."""
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "iteration": 0,
        "learning_rate": 0.0,
        "params": _to_host(ts.params),
        "model_state": _to_host(ts.model_state),
        "opt_state": _to_host(ts.opt_state),
    }
    if ts.scaler is not None:
        template["scaler"] = list(_to_host(ts.scaler))
    try:
        payload = ckptr.restore(os.path.abspath(path), item=template)
    except Exception:
        if "scaler" not in template:
            raise
        # Pre-fp16 checkpoint resumed with fp16_run=True: keep a fresh scaler.
        template.pop("scaler")
        payload = ckptr.restore(os.path.abspath(path), item=template)
    iteration = int(payload["iteration"])
    scaler = ts.scaler
    if ts.scaler is not None and payload.get("scaler") is not None:
        scaler = type(ts.scaler)(*payload["scaler"])
    new_ts = TrainState(
        step=jax.numpy.asarray(iteration, jax.numpy.int32),
        params=payload["params"],
        model_state=payload["model_state"],
        opt_state=jax.tree_util.tree_map(
            lambda t, s: jax.numpy.asarray(s, getattr(t, "dtype", None)),
            ts.opt_state, payload["opt_state"],
        ),
        scaler=scaler,
    )
    return new_ts, iteration, float(payload["learning_rate"])


def warm_start(path: str, ts: TrainState) -> TrainState:
    """Load model weights only, keep fresh optimizer (train.py:92-97)."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    return ts._replace(
        params=payload["params"], model_state=payload["model_state"]
    )


def latest_checkpoint(output_dir: str) -> str | None:
    if not os.path.isdir(output_dir):
        return None
    best, best_iter = None, -1
    for name in os.listdir(output_dir):
        if name.startswith("checkpoint_"):
            try:
                it = int(name.split("_", 1)[1])
            except ValueError:
                continue
            if it > best_iter:
                best, best_iter = os.path.join(output_dir, name), it
    return best
