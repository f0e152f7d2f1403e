"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices *before* jax is
imported anywhere, so multi-chip sharding tests (`jax.sharding.Mesh` over 8
"devices") run on any host. Bench/production paths use the real TPU; tests
are hardware-independent.
"""

import os
import sys

# force-override: the environment presets JAX_PLATFORMS=axon (real TPU
# tunnel) and a sitecustomize hook registers the axon backend at interpreter
# startup, overriding the env var — so we must also flip the jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # virtual device threads time-share the host cores; don't let XLA-CPU
    # fatally abort a collective just because the host is slow/oversubscribed
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=3600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def import_reference():
    """Put the read-only reference implementation on sys.path so tests can
    use it as a parity oracle (never as a code source).

    APPEND, don't prepend: the reference repo has top-level ``train``/
    ``test`` modules that collide with ours. Its oracle packages
    (``models``/``layers``/``utils``/``data``) have no counterpart at our
    repo root, so they resolve fine from the back of the path; with the
    reference in FRONT, any later ``import train``/``import test`` in the
    same pytest process imported the reference CLI instead of ours (found
    by the gated suite: 5 ImportErrors once the oracle tests and the CLI
    e2e tests shared a process)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
