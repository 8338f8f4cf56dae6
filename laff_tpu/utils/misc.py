"""Shared utilities: logging, timing, progress meters, idempotent-rerun guards.

Capability parity with the reference L0 layer (reference ``common.py``,
``util.py``, ``generic_utils.py``) without the Keras-era baggage.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time

ROOT_PATH = os.path.join(os.environ.get("HOME", os.path.expanduser("~")), "VisualSearch")

_LOG_FORMAT = "[%(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%d %b %H:%M:%S"


def get_logger(name: str = "laff_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_LOG_FORMAT, _DATE_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


logger = get_logger()


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def makedirs_for_file(filename: str) -> None:
    parent = os.path.dirname(filename)
    if parent:
        makedirs(parent)


def check_to_skip(filename: str, overwrite: bool) -> bool:
    """Return True when ``filename`` exists and must NOT be overwritten.

    Mirrors the reference overwrite-guard semantics (``util.py:17-31``):
    existing file + overwrite=False -> skip (True); otherwise proceed.
    """
    if os.path.exists(filename):
        if overwrite:
            logger.info("%s exists. overwrite", filename)
            return False
        logger.info("%s exists. skip", filename)
        return True
    return False


def timer(fn):
    """Decorator printing wall-clock per call (reference ``util.py:42-53``)."""

    @functools.wraps(fn)
    def _timed(*args, **kwargs):
        start = time.time()
        result = fn(*args, **kwargs)
        logger.info("%s execution time: %.3f seconds", fn.__name__, time.time() - start)
        return result

    return _timed


class AverageMeter:
    """Running mean/sum tracker (reference ``util.py:55-80``)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Progress:
    """Minimal progress meter with ETA (replaces the Keras-style Progbar)."""

    def __init__(self, total: int, label: str = "", interval: float = 2.0) -> None:
        self.total = max(int(total), 1)
        self.label = label
        self.interval = interval
        self.seen = 0
        self.start = time.time()
        self._last_print = 0.0

    def add(self, n: int) -> None:
        self.seen += n
        now = time.time()
        if now - self._last_print < self.interval and self.seen < self.total:
            return
        self._last_print = now
        elapsed = now - self.start
        rate = self.seen / max(elapsed, 1e-9)
        eta = (self.total - self.seen) / max(rate, 1e-9)
        logger.info(
            "%s %d/%d (%.1f%%) %.1f/s eta %.0fs",
            self.label, self.seen, self.total, 100.0 * self.seen / self.total, rate, eta,
        )


_COMPILE_CACHE_DIR: str | None = None


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk XLA compilation cache.

    The reference workflow (``shell/retrieval_task.sh:118-155``) is a sweep of
    many short single-purpose processes — train, predict, score — each of which
    would otherwise re-pay the full XLA compile (~20-40 s on TPU) for programs
    that are byte-identical across seeds.  A shared on-disk cache makes every
    process after the first start at device speed.

    Controlled by ``LAFF_TPU_COMPILE_CACHE``: unset → ``~/.cache/laff_tpu/xla``;
    ``0``/``off`` → disabled; anything else → used as the cache directory.
    Returns the directory in use, or None when disabled.  Idempotent.
    """
    global _COMPILE_CACHE_DIR
    env = os.environ.get("LAFF_TPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable", "disabled"):
        return None
    if path is None and not env and "axon" in os.environ.get("JAX_PLATFORMS", ""):
        # Development-tunnel backends with remote compilation deserialize
        # persisted executables through the tunnel; a large persisted
        # executable was measured loading in 290 s where its cold compile
        # took 5.7 s (small programs do win: 1.26 s -> 0.04 s). Default off
        # there; opt in explicitly via LAFF_TPU_COMPILE_CACHE=<dir>.
        return None
    if _COMPILE_CACHE_DIR is not None:
        return _COMPILE_CACHE_DIR
    cache_dir = path or env or os.path.join(
        os.environ.get("HOME", os.path.expanduser("~")), ".cache", "laff_tpu", "xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache even fast-compiling programs: sweep processes are short-lived,
        # so amortization starts from the second process, not the second call.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # pragma: no cover - cache is best-effort
        logger.warning("compile cache unavailable (%s); continuing without", exc)
        return None
    _COMPILE_CACHE_DIR = cache_dir
    logger.info("persistent XLA compile cache at %s", cache_dir)
    return cache_dir
