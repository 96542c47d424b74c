"""Leveled logger parity (reference global/logger.go + jwdev42/logger).

The reference logger has syslog-style levels (panic > alert > crit >
error > warning > notice > info > debug), defaults to ``error``, prints
to stdout with a ``" - "`` separator, and ``-loglevel`` sets "the least
severe loglevel that will have its messages printed"
(libcrawl/api.go:60-75). This maps those levels onto Python logging for
the ``bbcrawl_ray`` logger tree — every module logger in the package is
a child, so one setLevel filters them all.
"""

from __future__ import annotations

import logging
import sys

# syslog-ordered levels → Python numeric levels (custom ones registered)
LEVELS = {
    "panic": 70,
    "alert": 60,
    "crit": logging.CRITICAL,      # 50
    "error": logging.ERROR,        # 40
    "warning": logging.WARNING,    # 30
    "notice": 25,
    "info": logging.INFO,          # 20
    "debug": logging.DEBUG,        # 10
}

for _name, _num in (("PANIC", 70), ("ALERT", 60), ("NOTICE", 25)):
    if logging.getLevelName(_num) != _name:
        logging.addLevelName(_num, _name)

DEFAULT_LEVEL = "error"  # Default_Loglevel = logger.LevelError


def parse_loglevel(value: str) -> str:
    """Flag parser: validates the level name (reference errors on junk)."""
    v = value.strip().lower()
    if v not in LEVELS:
        raise ValueError(
            f"invalid loglevel {value!r} (one of {', '.join(LEVELS)})"
        )
    return v


ENV_VAR = "BBCRAWL_LOGLEVEL"
_env_configured = False


def get_logger(name: str) -> logging.Logger:
    """Worker-safe logger accessor: the -loglevel setting travels to Ray
    workers via ``BBCRAWL_LOGLEVEL`` (exported by the CLI before
    ``ray.init`` starts the local cluster, so workers inherit it); the
    first log call in any process binds the level."""
    global _env_configured
    if not _env_configured:
        import os

        try:
            configure(os.environ.get(ENV_VAR, DEFAULT_LEVEL))
        except ValueError:
            configure(DEFAULT_LEVEL)
        _env_configured = True
    return logging.getLogger(name)


def configure(level: str = DEFAULT_LEVEL) -> logging.Logger:
    """Bind the package logger: stdout handler, ' - ' separator, given
    least-severe level. Idempotent. An EXPLICIT configure() wins over
    the lazy env-based binding in get_logger (otherwise the first stage
    log would clobber a programmatic configure('debug') back to the
    default)."""
    global _env_configured
    _env_configured = True
    log = logging.getLogger("bbcrawl_ray")
    if not any(getattr(h, "_bbcrawl", False) for h in log.handlers):
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("%(levelname)s - %(message)s"))
        h._bbcrawl = True
        log.addHandler(h)
        log.propagate = False
    log.setLevel(LEVELS[parse_loglevel(level)])
    return log
