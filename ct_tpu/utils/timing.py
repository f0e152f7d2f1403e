"""Device synchronization for wall-clock timing.

``jax.block_until_ready`` is NOT a reliable synchronization point on the
remote-tunnel (axon) TPU backend: measured post-2026-08-17, it returns
immediately while compilation and execution proceed asynchronously — a
timing loop bracketed only by ``block_until_ready`` reported 0.06 ms for
a 16-ms kernel (the work landed in the next device→host fetch, which took
the full elapsed time). A real device→host read is the only operation
that provably waits for execution, because the bytes cannot exist before
the producing program has run and TPU execution is in-order, so fetching
any output of the LAST dispatched program fences everything before it.

Use ``fetch_sync(out)`` wherever a timing window (or a profiler trace
region) must end only after the device has finished.
"""

from __future__ import annotations

import numpy as np


def fetch_sync(tree) -> None:
    """Block until every computation dispatched so far has executed, by
    fetching one element of (a leaf of) ``tree`` to the host.

    The first call on a new array shape compiles a tiny slice program —
    call once during warmup so timed windows pay only the ~bytes-sized
    transfer. Falls back to ``block_until_ready`` for non-array leaves.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    leaf = leaves[-1]
    try:
        # slice before the transfer: fetching one element instead of the
        # whole array keeps the fence cheap over a ~39 MB/s tunnel
        idx = (0,) * getattr(leaf, "ndim", 0)
        np.asarray(jax.device_get(leaf[idx] if idx else leaf))
    except TypeError:  # pragma: no cover - non-indexable leaf
        jax.block_until_ready(leaf)
