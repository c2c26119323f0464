#!/usr/bin/env python
"""Multi-device launcher shim.

The reference spawns one process per GPU (multiproc.py:6-23). JAX is
single-controller: one process drives every local device through the mesh,
so this launcher simply delegates to train.py. For multi-host pods, start
one process per host with the JAX distributed env (COORDINATOR_ADDRESS etc.)
and call jax.distributed.initialize — no per-rank launcher needed.
"""

import subprocess
import sys

if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--rank")
            and not a.startswith("--group_name")]
    if argv and argv[0].endswith("train.py"):
        argv = argv[1:]
    print("[multiproc] single-controller JAX drives all local devices; "
          "delegating to train.py")
    sys.exit(subprocess.call([sys.executable, "train.py", *argv]))
