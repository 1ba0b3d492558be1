"""Leveled-logging tests — mirrors log/log_test.go:8-113: messages emit
iff their level is at or below the configured verbosity; "disabled"
suppresses everything; unknown levels error."""

from __future__ import annotations

import io

import pytest

from graph_vulcan_assets_spark.log import configure, get_logger


def emit_all(logger):
    logger.debug("d-msg")
    logger.info("i-msg")
    logger.warning("w-msg")
    logger.error("e-msg")


@pytest.mark.parametrize(
    ("level", "expected"),
    [
        ("debug", ["d-msg", "i-msg", "w-msg", "e-msg"]),
        ("info", ["i-msg", "w-msg", "e-msg"]),
        ("warn", ["w-msg", "e-msg"]),
        ("error", ["e-msg"]),
        ("disabled", []),
    ],
)
def test_level_filtering(level, expected):
    buf = io.StringIO()
    logger = configure(level, stream=buf)
    emit_all(logger)
    out = buf.getvalue()
    for msg in ["d-msg", "i-msg", "w-msg", "e-msg"]:
        assert (msg in out) == (msg in expected), (level, msg, out)


def test_invalid_level_rejected():
    with pytest.raises(ValueError):
        configure("verbose")


def test_child_logger_inherits_level():
    buf = io.StringIO()
    configure("warn", stream=buf)
    child = get_logger("streaming.ingest")
    child.info("hidden")
    child.error("shown")
    out = buf.getvalue()
    assert "hidden" not in out and "shown" in out
    assert "streaming.ingest" in out  # component name in the record


def test_config_level_set_matches_logger():
    """config.read_config validates the same level set the logger accepts
    (readConfig → log.ParseLevel in the reference)."""
    from graph_vulcan_assets_spark.config import _LOG_LEVELS

    for level in _LOG_LEVELS:
        configure(level, stream=io.StringIO())  # must not raise
