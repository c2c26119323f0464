"""REAL multi-host execution: two JAX processes rendezvous over a local
coordinator and run the full training path — global mesh spanning both
processes, per-host DataLoader shards, `fixed_lengths` same-shape batches,
and `shard_batch`'s `jax.make_array_from_process_local_data` branch
(parallel/mesh.py:117-121).  Reference analog being replaced:
/root/reference/distributed.py:126-174 + train.py:38-50 (NCCL DDP ranks).

These spawn subprocesses (the coordinator can't share this test process's
already-initialized backend), ~2-4 min total.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "multihost_dryrun.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _losses(log: str) -> list[float]:
    return [float(m) for m in re.findall(r"Train loss \d+ ([\d.]+)", log)]


def _clean_env() -> dict:
    env = dict(os.environ)
    # The conftest pins this test process to 8 virtual CPU devices; the
    # subprocesses configure their own device counts and rendezvous.
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "XLA_FLAGS"):
        env.pop(k, None)
    return env


def test_two_process_training_parity(tmp_path):
    work = str(tmp_path / "mh")
    env = _clean_env()
    subprocess.run(
        [sys.executable, TOOL, "--make-corpus", "--workdir", work],
        check=True, env=env, timeout=120,
    )
    port = _free_port()

    def launch(pid):
        return subprocess.Popen(
            [sys.executable, TOOL, "--process_id", str(pid),
             "--num_processes", "2", "--coordinator", f"localhost:{port}",
             "--workdir", work, "--local_devices", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )

    p0, p1 = launch(0), launch(1)
    out0 = p0.communicate(timeout=420)[0]
    out1 = p1.communicate(timeout=120)[0]
    assert p0.returncode == 0, out0[-3000:]
    assert p1.returncode == 0, out1[-3000:]
    assert "MULTIHOST OK pid=0/2 devices=8 local=4" in out0
    assert "MULTIHOST OK pid=1/2 devices=8 local=4" in out1

    l0, l1 = _losses(out0), _losses(out1)
    assert len(l0) == len(l1) == 4
    # both processes compute the same GLOBAL loss each step
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    assert l0[-1] < l0[0]  # it actually trains

    # single-process run on the same corpus/seed: each global step consumes
    # the same SET of items (rank slices interleave one permutation) at the
    # same fixed padded shapes, but per-host collate permutes row order vs
    # the single-host sort, and prenet dropout (always-on, reference quirk)
    # assigns masks by row — so the loss agrees only to dropout noise.
    single = subprocess.run(
        [sys.executable, TOOL, "--process_id", "0", "--num_processes", "1",
         "--coordinator", f"localhost:{_free_port()}",
         "--workdir", work, "--local_devices", "4"],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-2000:]
    ls = _losses(single.stdout)
    assert len(ls) == 4
    np.testing.assert_allclose(ls, l0, rtol=0.05)
