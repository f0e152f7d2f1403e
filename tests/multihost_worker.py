"""Worker process for the 2-process multi-host test (test_multihost.py).

Each process owns one virtual CPU device; jax.distributed.initialize wires
them into one runtime (the DCN story of SURVEY §2.3 at miniature scale).
Every process runs the SAME SPMD program: tiny-model shard_map DP train
step over the global 2-device mesh, feeding only its local shard via
make_host_local_batch. Prints the (globally psum'd) loss — the parent
asserts both processes computed the identical global value.
"""

import os
import sys


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=1").strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ct_tpu.parallel import distributed

    info = distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == nproc, info

    import numpy as np
    import jax.numpy as jnp  # noqa: F401

    from ct_tpu.config import TINY_64, resolve_task
    from ct_tpu.data.targets import pad_targets
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.parallel import make_mesh, replicate
    from ct_tpu.parallel.distributed import make_host_local_batch
    from ct_tpu.train.solver import SolverConfig, build_optimizer
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    mesh = make_mesh(nproc, devices=jax.devices())
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    priors = prior_boxes(TINY_64)
    cfg = SolverConfig(lr=1e-3, steps=(10 ** 6,), warmup_iters=0)

    state = init_train_state(net, None, jax.random.PRNGKey(0), 64)
    tx = build_optimizer(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats,
                       tx.init(state.params), state.step)
    step = make_train_step(net, priors, task, tx, mesh=mesh)

    # per-host input pipeline: this host contributes its OWN local image
    # (global batch = nproc images, one per process)
    rng = np.random.RandomState(100 + pid)
    t = pad_targets(
        [np.asarray([[0.2, 0.2, 0.6, 0.7, 3, 1.0]], np.float32)], 4
    )
    local = {
        "image": rng.randn(1, 64, 64, 3).astype(np.float32),
        "boxes": t.boxes, "labels": t.labels,
        "weights": t.weights, "valid": t.valid,
    }
    batch = make_host_local_batch(mesh, local)
    state = replicate(mesh, state)
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    total = float(metrics["total_loss"])
    assert np.isfinite(total), total
    print(f"MULTIHOST_LOSS {pid} {total:.6f}", flush=True)


if __name__ == "__main__":
    main()
