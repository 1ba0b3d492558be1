"""Leveled logging for the engine — the reference's `log` package
(log/log.go:1-274) re-expressed over Python stdlib logging.

Reference semantics kept:
- Levels error < warn < info < debug, plus "disabled" which suppresses
  everything (log/log.go level set, parsed in readConfig — the same set
  `config.read_config` validates).
- A message is emitted iff its level is at or below the configured
  verbosity; the default level is info.
- One process-wide logger configured once (the reference wires it in
  main.go before the run loop); `configure()` is idempotent and
  re-callable with a new level.

Spark note: this logger covers ENGINE control-plane events (batch
applied/skipped, snapshot pruning, stream retries). Executor-side data
plane logging stays with Spark's own log4j — per-row logging from
distributed code is an anti-pattern at any scale.
"""

from __future__ import annotations

import logging
import sys

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "error": logging.ERROR,
    "disabled": logging.CRITICAL + 10,
}

_logger = logging.getLogger("graph_vulcan_assets_spark")


def configure(level: str = "info", stream=None) -> logging.Logger:
    """Set the engine logger's verbosity (log/log.go's SetLevel).

    Unknown levels raise ValueError, matching the reference's parse error
    surfaced through readConfig (config.read_config applies the same
    validation before this is reached).
    """
    if level not in _LEVELS:
        raise ValueError(f"invalid log level: {level!r}")
    _logger.setLevel(_LEVELS[level])
    if not _logger.handlers:
        h = logging.StreamHandler(stream or sys.stderr)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        _logger.addHandler(h)
    elif stream is not None:
        for h in _logger.handlers:
            h.setStream(stream)
    return _logger


def get_logger(name: str | None = None) -> logging.Logger:
    """Child logger for a component (inherits the configured level)."""
    return _logger.getChild(name) if name else _logger
