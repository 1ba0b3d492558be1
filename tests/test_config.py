"""Config env matrix — mirrors the reference's readConfig table test
(cmd/graph-vulcan-assets/main_test.go:542-672)."""

from __future__ import annotations

import pytest

from graph_vulcan_assets_spark.config import Config, ConfigError, read_config


def test_defaults():
    cfg = read_config({})
    assert cfg.retry_seconds == 5.0
    assert cfg.kafka_topic == "assets-v0"
    assert cfg.log_level == "info"
    assert cfg.aws_account_annotation_key == "autodiscovery/security/aws-account"
    assert not cfg.sasl_enabled


def test_full_config():
    cfg = read_config(
        {
            "SPARK_GRAFT_KAFKA_BOOTSTRAP": "broker:9092",
            "SPARK_GRAFT_KAFKA_TOPIC": "custom-topic",
            "SPARK_GRAFT_KAFKA_USERNAME": "u",
            "SPARK_GRAFT_KAFKA_PASSWORD": "p",
            "SPARK_GRAFT_RETRY_SECONDS": "0",
            "SPARK_GRAFT_LOG_LEVEL": "DEBUG",
            "SPARK_GRAFT_AWS_ANNOTATION_KEY": "custom/aws-key",
        }
    )
    assert cfg.kafka_bootstrap_servers == "broker:9092"
    assert cfg.kafka_topic == "custom-topic"
    assert cfg.sasl_enabled
    assert cfg.retry_seconds == 0  # 0 = exit on error (main.go:22-26)
    assert cfg.log_level == "debug"
    assert cfg.aws_account_annotation_key == "custom/aws-key"


@pytest.mark.parametrize(
    "env",
    [
        {"SPARK_GRAFT_RETRY_SECONDS": "not-a-number"},
        {"SPARK_GRAFT_RETRY_SECONDS": "-1"},
        {"SPARK_GRAFT_LOG_LEVEL": "loud"},
        {"SPARK_GRAFT_KAFKA_USERNAME": "u"},  # password missing
        {"SPARK_GRAFT_KAFKA_PASSWORD": "p"},  # username missing
    ],
)
def test_invalid_configs_error(env):
    with pytest.raises(ConfigError):
        read_config(env)


def test_config_is_frozen():
    cfg = Config()
    with pytest.raises(Exception):
        cfg.retry_seconds = 1  # type: ignore[misc]
