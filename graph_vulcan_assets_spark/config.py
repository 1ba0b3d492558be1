"""Engine configuration from environment variables.

Mirrors the reference's `readConfig` (cmd/graph-vulcan-assets/main.go:380-436
and its env matrix test main_test.go:542-672): required connection settings,
optional retry duration (0 = exit on error), optional log level, optional
SASL credentials, and the AWS-account annotation key.
"""

from __future__ import annotations

import dataclasses
import os


class ConfigError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class Config:
    # streaming source (required when running the ingestion job)
    kafka_bootstrap_servers: str | None = None
    kafka_topic: str = "assets-v0"
    kafka_username: str | None = None
    kafka_password: str | None = None
    # state sink
    state_dir: str = "/tmp/gvas-state"
    checkpoint_dir: str = "/tmp/gvas-checkpoint"
    # behavior
    retry_seconds: float = 5.0  # 0 = exit on error (main.go:22-26)
    log_level: str = "info"
    aws_account_annotation_key: str = "autodiscovery/security/aws-account"

    @property
    def sasl_enabled(self) -> bool:
        """SCRAM over SASL_SSL iff both credentials set (main.go:51-56)."""
        return bool(self.kafka_username and self.kafka_password)


_LOG_LEVELS = {"error", "warn", "info", "debug", "disabled"}


def read_config(env: dict[str, str] | None = None) -> Config:
    """Build a Config from environment variables (prefix SPARK_GRAFT_).

    Validation mirrors the reference: a missing required source for the
    streaming entrypoint errors, a malformed retry duration errors, an
    unknown log level errors (log/log.go level parse).
    """
    e = os.environ if env is None else env

    retry_raw = e.get("SPARK_GRAFT_RETRY_SECONDS", "5")
    try:
        retry = float(retry_raw)
    except ValueError as exc:
        raise ConfigError(f"invalid retry duration: {retry_raw!r}") from exc
    if retry < 0:
        raise ConfigError(f"invalid retry duration: {retry_raw!r}")

    level = e.get("SPARK_GRAFT_LOG_LEVEL", "info").lower()
    if level not in _LOG_LEVELS:
        raise ConfigError(f"invalid log level: {level!r}")

    user = e.get("SPARK_GRAFT_KAFKA_USERNAME") or None
    password = e.get("SPARK_GRAFT_KAFKA_PASSWORD") or None
    if (user is None) != (password is None):
        # credentials travel together (main.go:51-56 uses both or neither)
        raise ConfigError("kafka username and password must be set together")

    return Config(
        kafka_bootstrap_servers=e.get("SPARK_GRAFT_KAFKA_BOOTSTRAP") or None,
        kafka_topic=e.get("SPARK_GRAFT_KAFKA_TOPIC", "assets-v0"),
        kafka_username=user,
        kafka_password=password,
        state_dir=e.get("SPARK_GRAFT_STATE_DIR", "/tmp/gvas-state"),
        checkpoint_dir=e.get("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/gvas-checkpoint"),
        retry_seconds=retry,
        log_level=level,
        aws_account_annotation_key=e.get(
            "SPARK_GRAFT_AWS_ANNOTATION_KEY", "autodiscovery/security/aws-account"
        ),
    )
