"""Logging + progress reporting (reference src/logging.rs:10-66,
src/util.rs:51-120).

The reference configures log4rs with a stderr console appender at Info
(pattern ``> {m}``) plus an optional Trace-level file appender (pattern
``[{f}::{L}][{d}][{l}] {m}``) and echoes the command line into the log;
``log_once``/``debug_once`` de-spam per-record warnings (read_cache.rs:129).
Progress is an indicatif ticker on stderr gated by --suppress-progress.
This module reproduces that surface with the stdlib ``logging`` package and
a lightweight stderr ticker.
"""

from __future__ import annotations

import logging
import sys
import threading
import time

LOGGER_NAME = "modkit_tpu"


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)


def init_logging(
    log_filepath: str | None = None, quiet_stdout: bool = False
) -> logging.Logger:
    """Configure the modkit_tpu logger: stderr at INFO (unless quiet), an
    optional DEBUG-level file appender, and the command line echoed into
    the log (logging.rs:59-60)."""
    logger = get_logger()
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    if not quiet_stdout:
        con = logging.StreamHandler(sys.stderr)
        con.setLevel(logging.INFO)
        con.setFormatter(logging.Formatter("> %(message)s"))
        logger.addHandler(con)
    if log_filepath:
        fh = logging.FileHandler(log_filepath, mode="a")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter(
                "[%(module)s::%(lineno)d][%(asctime)s][%(levelname)s] %(message)s",
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        logger.addHandler(fh)
    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    logger.debug("command line: %s", " ".join(sys.argv))
    return logger


_once_seen: set = set()
_once_lock = threading.Lock()


def log_once(msg: str, level: int = logging.WARNING) -> None:
    """Emit ``msg`` at most once per process (util log_once/debug_once
    de-spam for per-record warnings, read_cache.rs:129, tabix.rs:136)."""
    with _once_lock:
        if msg in _once_seen:
            return
        _once_seen.add(msg)
    get_logger().log(level, msg)


def reset_once_cache() -> None:
    with _once_lock:
        _once_seen.clear()


class ProgressTicker:
    """Minimal stderr progress line (the reference's indicatif spinners,
    util.rs:51-120): throttled in-place updates, silent when suppressed or
    when stderr is not a TTY."""

    def __init__(
        self, label: str, suppress: bool = False, min_interval: float = 0.2
    ):
        self.label = label
        self.enabled = (not suppress) and sys.stderr.isatty()
        self.min_interval = min_interval
        self._last = 0.0
        self._wrote = False

    def update(self, **counts) -> None:
        if not self.enabled:
            return
        now = time.monotonic()
        if now - self._last < self.min_interval:
            return
        self._last = now
        body = " ".join(f"{k} {v}" for k, v in counts.items())
        sys.stderr.write(f"\r{self.label} {body}\x1b[K")
        sys.stderr.flush()
        self._wrote = True

    def finish(self, **counts) -> None:
        if not self.enabled:
            return
        body = " ".join(f"{k} {v}" for k, v in counts.items())
        sys.stderr.write(f"\r{self.label} {body}\n")
        sys.stderr.flush()
        self._wrote = False
