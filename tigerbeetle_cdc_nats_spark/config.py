"""Typed pipeline configuration mirroring the reference's flag surface.

Reference: parseConfig at /root/reference/config.go:164-371 — same defaults
(config.go:30-51), same validation rules and rejection messages
(config.go:220-347), same derived resource naming (config.go:330-343,
clusterScopedResourceName config.go:431-433) and subject routing
(config.go:157-162). NATS-specific transport options map onto their Spark
equivalents (checkpoint dir = progress bucket, streaming-query ownership =
single-writer lock) but the *validation semantics* are preserved so config
tests port 1:1 (config_test.go:9-108).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

# Defaults — config.go:30-51.
DEFAULT_NATS_URL = "nats://127.0.0.1:4222"
DEFAULT_EVENT_STREAM_BASE = "TB_CDC_EVENTS"
DEFAULT_PROGRESS_BUCKET_BASE = "TB_CDC_PROGRESS"
DEFAULT_LOCK_BUCKET_BASE = "TB_CDC_LOCK"
DEFAULT_SUBJECT_PREFIX = "tigerbeetle.cdc"
DEFAULT_SINGLE_SUBJECT = "tigerbeetle.cdc"
DEFAULT_LOCK_TTL_S = 30.0
DEFAULT_LOCK_REFRESH_S = 10.0
DEFAULT_DEDUPE_WINDOW_S = 120.0
DEFAULT_EVENT_COUNT_MAX = 4096
DEFAULT_IDLE_INTERVAL_S = 1.0
DEFAULT_PUBLISH_ACK_TIMEOUT_S = 30.0
DEFAULT_PUBLISH_ASYNC_MAX_PENDING = 4096
MAX_REPLICA_COUNT = 5
MAX_U32 = 2**32 - 1
MAX_U128 = 2**128 - 1

SUBJECT_MODE_STRUCTURED = "structured"
SUBJECT_MODE_SINGLE = "single"
PUBLISH_MODE_ASYNC = "async"
PUBLISH_MODE_SYNC = "sync"


class ConfigError(ValueError):
    """Mirrors parseConfig's error returns (exit code 2 path, app.go:13-21)."""


def cluster_scoped_resource_name(base: str, cluster_decimal: str) -> str:
    """``<base>_<clusterDecimal>`` — config.go:431-433."""
    return f"{base}_{cluster_decimal}"


def parse_uint128_decimal(raw: str) -> str:
    """Validate a base-10 u128 (config.go:392-407); returns canonical form."""
    s = raw.strip()
    if not s or not s.isdigit():
        raise ConfigError(f"invalid --cluster-id: not a decimal integer: {raw!r}")
    v = int(s)
    if v > MAX_U128:
        raise ConfigError("invalid --cluster-id: exceeds 128 bits")
    return str(v)


@dataclass(frozen=True)
class CdcConfig:
    cluster_id: str = ""
    nats_url: str = DEFAULT_NATS_URL
    event_stream: str = ""
    progress_bucket: str = ""
    lock_bucket: str = ""
    subject_mode: str = SUBJECT_MODE_STRUCTURED
    subject_prefix: str = DEFAULT_SUBJECT_PREFIX
    single_subject: str = DEFAULT_SINGLE_SUBJECT
    lock_ttl_s: float = DEFAULT_LOCK_TTL_S
    lock_refresh_s: float = DEFAULT_LOCK_REFRESH_S
    dedupe_window_s: float = DEFAULT_DEDUPE_WINDOW_S
    event_count_max: int = DEFAULT_EVENT_COUNT_MAX
    progress_every_events: int = 0
    idle_interval_s: float = DEFAULT_IDLE_INTERVAL_S
    publish_mode: str = PUBLISH_MODE_ASYNC
    publish_ack_timeout_s: float = DEFAULT_PUBLISH_ACK_TIMEOUT_S
    publish_async_max_pending: int = DEFAULT_PUBLISH_ASYNC_MAX_PENDING
    stream_replicas: int = 1
    kv_replicas: int = 1
    provision: bool = True
    stream_update: bool = False
    requests_per_second_limit: int | None = None
    timestamp_last_override: int | None = None

    def subject_for_event(self, ledger: int, event_type: str) -> str:
        """config.go:157-162."""
        if self.subject_mode == SUBJECT_MODE_SINGLE:
            return self.single_subject
        return f"{self.subject_prefix}.{ledger}.{event_type}"

    def msg_id(self, timestamp: int) -> str:
        """``<cluster>/<timestamp>`` — runner.go:602."""
        return f"{self.cluster_id}/{timestamp}"


def validate(cfg: CdcConfig) -> CdcConfig:
    """Apply parseConfig's validation + derivation (config.go:220-347).
    Returns the resolved config; raises ConfigError with the reference's
    message on the same inputs the reference rejects."""
    if not cfg.cluster_id:
        raise ConfigError("--cluster-id is required")
    cluster_decimal = parse_uint128_decimal(cfg.cluster_id)

    if not (1 <= cfg.event_count_max <= MAX_U32):
        raise ConfigError(f"--event-count-max must be in [1, {MAX_U32}]")
    if not (0 <= cfg.progress_every_events <= MAX_U32):
        raise ConfigError(f"--progress-every-events must be in [0, {MAX_U32}]")
    if cfg.idle_interval_s <= 0:
        raise ConfigError("--idle-interval-ms must be greater than zero")
    if not (1 <= cfg.stream_replicas <= MAX_REPLICA_COUNT):
        raise ConfigError(f"--stream-replicas must be in [1, {MAX_REPLICA_COUNT}]")
    if not (1 <= cfg.kv_replicas <= MAX_REPLICA_COUNT):
        raise ConfigError(f"--kv-replicas must be in [1, {MAX_REPLICA_COUNT}]")
    if cfg.lock_ttl_s <= 0:
        raise ConfigError("--lock-ttl must be greater than zero")
    if cfg.lock_refresh_s <= 0:
        raise ConfigError("--lock-refresh must be greater than zero")
    if cfg.lock_refresh_s >= cfg.lock_ttl_s:
        raise ConfigError("--lock-refresh must be less than --lock-ttl")
    if cfg.dedupe_window_s <= 0:
        raise ConfigError("--dedupe-window must be greater than zero")
    if cfg.publish_ack_timeout_s <= 0:
        raise ConfigError("--publish-ack-timeout must be greater than zero")
    if cfg.publish_async_max_pending <= 0:
        raise ConfigError("--publish-async-max-pending must be greater than zero")
    if not cfg.provision and cfg.stream_update:
        raise ConfigError("--stream-update requires --provision=true")

    mode = cfg.subject_mode.strip().lower()
    if mode == SUBJECT_MODE_STRUCTURED:
        # TrimSuffix semantics: strip exactly ONE trailing dot
        # (config.go:296) — 'a..' resolves to 'a.', not 'a'.
        prefix = cfg.subject_prefix.strip().removesuffix(".")
        if not prefix:
            raise ConfigError("--subject-prefix cannot be empty in structured mode")
        cfg = replace(cfg, subject_prefix=prefix)
    elif mode == SUBJECT_MODE_SINGLE:
        single = cfg.single_subject.strip()
        if not single:
            raise ConfigError("--subject cannot be empty in single mode")
        cfg = replace(cfg, single_subject=single)
    else:
        raise ConfigError("--subject-mode must be one of: structured, single")

    pmode = cfg.publish_mode.strip().lower()
    if pmode not in (PUBLISH_MODE_ASYNC, PUBLISH_MODE_SYNC):
        raise ConfigError("--publish-mode must be one of: async, sync")

    if not cfg.nats_url:
        raise ConfigError("--nats-url cannot be empty")
    if cfg.requests_per_second_limit is not None and cfg.requests_per_second_limit <= 0:
        # the reference parses this as uint32, so negatives are rejected at
        # flag-parse time; zero is rejected by its own validation.
        raise ConfigError("--requests-per-second-limit must be a positive integer")

    # Derived resource names (config.go:330-343).
    derived = {}
    if not cfg.event_stream.strip():
        derived["event_stream"] = cluster_scoped_resource_name(
            DEFAULT_EVENT_STREAM_BASE, cluster_decimal)
    if not cfg.progress_bucket.strip():
        derived["progress_bucket"] = cluster_scoped_resource_name(
            DEFAULT_PROGRESS_BUCKET_BASE, cluster_decimal)
    if not cfg.lock_bucket.strip():
        derived["lock_bucket"] = cluster_scoped_resource_name(
            DEFAULT_LOCK_BUCKET_BASE, cluster_decimal)
    return replace(cfg, cluster_id=cluster_decimal,
                   subject_mode=mode, publish_mode=pmode, **derived)


def parse_addresses(raw: str) -> list[str]:
    """Comma-separated source addresses (config.go:373-390): empty string
    or any empty element is rejected."""
    raw = raw.strip()
    if not raw:
        raise ConfigError("invalid --addresses: must not be empty")
    addresses = []
    for part in raw.split(","):
        address = part.strip()
        if not address:
            raise ConfigError("invalid --addresses: contains an empty address")
        addresses.append(address)
    return addresses


def parse_storage_type(raw: str) -> str:
    """Storage kind for provisioned resources (config.go:409-418):
    'file' | 'memory' (alias 'mem')."""
    s = raw.strip().lower()
    if s == "file":
        return "file"
    if s in ("memory", "mem"):
        return "memory"
    raise ConfigError("invalid storage: must be one of: file, memory")
