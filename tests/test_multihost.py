"""Multi-host data parallelism: 2 processes, jax.distributed, one step.

Exercises the DCN path of SURVEY §2.3 end-to-end at miniature scale:
``jax.distributed.initialize`` joins two CPU processes (one virtual device
each) into one runtime; each feeds its local shard through
``make_host_local_batch`` and runs the production shard_map train step on
the tiny model. Both processes must report the identical globally-psum'd
loss — proving the cross-process collective actually ran.
"""

import os
import re
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # a fresh XLA_FLAGS per worker (the worker sets its own device count)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    losses = {}
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS (\d+) ([0-9.]+)", out)
        assert m, out[-3000:]
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    # both hosts computed the same global (psum'd) loss
    assert abs(losses[0] - losses[1]) < 1e-5, losses
