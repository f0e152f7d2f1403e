"""Console + file logging.

Capability parity with ``setup_logger`` (/root/reference/utils/
logger.py:33-89): stdout logging plus a persistent ``log.txt`` in the
output folder, and the rate-limited helpers (:127-193).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import Counter

_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


def setup_logger(
    output: str | None = None,
    name: str = "ct_tpu",
    level: int = logging.INFO,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger

    fmt = logging.Formatter(
        "[%(asctime)s %(name)s %(levelname)s] %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    if output:
        os.makedirs(output, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output, "log.txt"))
        fh.setFormatter(fmt)
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
