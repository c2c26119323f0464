"""Profile the B=64 train step on the real TPU and name the top time sinks.

Captures a ``jax.profiler`` trace around a few steady-state steps, then
parses the xplane protobuf (via tensorboard_plugin_profile) and prints the
top ops by self time.  This is the measurement half of the perf loop the
reference never had (its only instrumentation is a wall-clock ``duration``
scalar, reference train.py:207,234-238).

Usage:  python tools/profile_step.py [batch] [n_steps]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(batch_size: int, n_steps: int, logdir: str) -> float:
    import jax

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
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

    B, S, T = batch_size, 128, 512
    hp = create_hparams(f"batch_size={B}")
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
    float(m["loss"])  # compile + sync

    import time

    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for i in range(n_steps):
            ts, m = step(ts, batch, jax.random.PRNGKey(i))
        float(m["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(f"steady-state step: {dt * 1e3:.2f} ms (B={B})")
    return dt


def summarize(logdir: str, top: int = 25) -> None:
    """Parse the captured xplane and print top ops by self time."""
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured (remote-TPU tunnel may not support "
              "device tracing); falling back to trace.json.gz")
        return summarize_tracejson(logdir, top)
    xplane = max(xplanes, key=os.path.getmtime)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        print("tensorboard_plugin_profile unavailable:", e)
        return summarize_tracejson(logdir, top)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats", params={})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        stats = json.loads(data)
    except Exception:
        print(data[:4000])
        return
    rows = None
    if isinstance(stats, list):
        for table in stats:
            if isinstance(table, dict) and table.get("p") is None:
                pass
        rows = stats
    print(json.dumps(rows, indent=1)[:6000] if rows else "unparsed")


def summarize_tracejson(logdir: str, top: int = 25) -> None:
    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace.json.gz found either")
        return
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find device-side lanes (TPU op events carry 'dur'); aggregate by name.
    agg: dict[str, float] = {}
    cnt: dict[str, int] = {}
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
        cnt[name] = cnt.get(name, 0) + 1
    total = sum(agg.values())
    print(f"\ntrace: {path}")
    print(f"device lanes: {[pid_names.get(p) for p in device_pids] or 'ALL'}")
    print(f"{'us total':>12} {'%':>6} {'count':>7}  op")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us:12.0f} {100 * us / total:6.2f} {cnt[name]:7d}  {name[:110]}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    logdir = os.environ.get("PROFILE_DIR", "/tmp/t2v_profile")
    os.makedirs(logdir, exist_ok=True)
    capture(b, n, logdir)
    summarize(logdir)
