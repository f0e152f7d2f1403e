"""Persistent XLA compilation cache.

Big-program compiles through the remote-TPU tunnel are expensive (the
batch-128 serving program was measured at ~6.5 min); the JAX persistent
cache stores the compiled executable keyed by HLO so every later process
skips the compile entirely. Called by the CLIs, the bench, and the graft
entry points.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "CT_TPU_COMPILE_CACHE", os.path.expanduser("~/.ct_tpu_jax_cache")
)


def enable_compilation_cache(path: str = DEFAULT_DIR) -> None:
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax or read-only fs
        pass
    start_tunnel_heartbeat()


_heartbeat_started = False


def start_tunnel_heartbeat(interval: float = 45.0) -> None:
    """Keep the axon tunnel connection warm during long remote compiles.

    The external path drops TCP connections that go quiet for ~8 minutes
    (observed 2026-08-20: three jobs hung on a futex after their ESTAB
    pair vanished mid-compile while the local relay stayed up — the local
    relay, /root/.tpu_init.py, has no timeout of its own). A daemon
    thread issues a tiny device round-trip every ``interval`` seconds so
    the connection always carries traffic. No-op off-axon or when
    CT_TUNNEL_HEARTBEAT=0.
    """
    global _heartbeat_started
    if _heartbeat_started:
        return
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return
    if os.environ.get("CT_TUNNEL_HEARTBEAT", "1") == "0":
        return
    _heartbeat_started = True

    import threading
    import time

    def beat() -> None:
        import jax
        import numpy as np

        while True:
            time.sleep(interval)
            try:
                jax.block_until_ready(
                    jax.device_put(np.zeros(8, np.float32)))
            except Exception:  # pragma: no cover - backend mid-init
                pass

    threading.Thread(target=beat, daemon=True,
                     name="tunnel-heartbeat").start()


def require_tpu_tunnel(port: int = 8083, timeout: float = 2.0) -> None:
    """Fail fast (clear message, nonzero exit) if the axon TPU tunnel relay
    is down, instead of hanging forever inside ``jax.devices()``.

    The relay (`/root/.tpu_init.py`, stdio-pumped by the external
    orchestrator) serves the stateless device-listing RPC on :8083; when it
    exits, every axon-backend call blocks indefinitely. Only meaningful
    when the axon backend is the configured platform — CPU runs skip it.
    """
    import socket
    import sys

    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return
    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(("127.0.0.1", port))
    except OSError:
        sys.exit(
            "TPU tunnel relay is down (127.0.0.1:%d refused) — jax.devices()"
            " would hang. Restore the relay and re-run." % port
        )
    finally:
        s.close()
