"""Console + file logging.

Capability parity with ``setup_logger`` (/root/reference/utils/
logger.py:33-89): colored stdout logging (WARNING/ERROR highlighted when
the stream is a tty, like the reference's colored formatter), a persistent
``log.txt`` in the output folder — suffixed ``.rank{N}`` on non-zero hosts
of a multi-process run, with console output on rank 0 only (reference
``distributed_rank`` semantics, logger.py:44-56) — and the rate-limited
helpers (:127-193).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import Counter

_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}

_RED = "\x1b[31;1m"
_YELLOW = "\x1b[33;1m"
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    """Highlight WARNING/ERROR like the reference's colored console."""

    def format(self, record: logging.LogRecord) -> str:
        out = super().format(record)
        if record.levelno >= logging.ERROR:
            return _RED + out + _RESET
        if record.levelno >= logging.WARNING:
            return _YELLOW + out + _RESET
        return out


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def setup_logger(
    output: str | None = None,
    name: str = "ct_tpu",
    level: int = logging.INFO,
    distributed_rank: int | None = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger

    rank = (_process_index() if distributed_rank is None
            else distributed_rank)
    plain = logging.Formatter(
        "[%(asctime)s %(name)s %(levelname)s] %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    if rank == 0:
        # console on the primary process only (reference logger.py:44-56)
        sh = logging.StreamHandler(stream=sys.stdout)
        use_color = hasattr(sys.stdout, "isatty") and sys.stdout.isatty()
        sh.setFormatter(
            _ColorFormatter(plain._fmt, datefmt="%m/%d %H:%M:%S")
            if use_color else plain
        )
        logger.addHandler(sh)

    if output:
        os.makedirs(output, exist_ok=True)
        fname = "log.txt" if rank == 0 else f"log.txt.rank{rank}"
        fh = logging.FileHandler(os.path.join(output, fname))
        fh.setFormatter(plain)
        logger.addHandler(fh)
    return logger


def log_first_n(logger: logging.Logger, msg: str, n: int = 1,
                key: str | None = None):
    key = key or msg
    _LOG_COUNTER[key] += 1
    if _LOG_COUNTER[key] <= n:
        logger.info(msg)


def log_every_n(logger: logging.Logger, msg: str, n: int = 1,
                key: str | None = None):
    key = key or msg
    _LOG_COUNTER[key] += 1
    if (_LOG_COUNTER[key] - 1) % n == 0:
        logger.info(msg)


def log_every_n_seconds(logger: logging.Logger, msg: str, n: float = 1.0,
                        key: str | None = None):
    key = key or msg
    now = time.time()
    last = _LOG_TIMER.get(key)
    if last is None or now - last >= n:
        logger.info(msg)
        _LOG_TIMER[key] = now
