"""Idempotent resource provisioning with fail-fast config diffing.

Reference: ensureEventStream / ensureKV (/root/reference/runner.go:207-291):
look up the resource; create it if absent; if present, DIFF the desired vs
actual config field-by-field and fail with an actionable message listing
every mismatch (streamConfigMismatches runner.go:338-386, KV diff
runner.go:293-336) — unless ``update=True`` (--stream-update), which applies
the new config.

Spark analogue: a sink "resource" is a directory + a sidecar ``_resource.json``
carrying the declared config (schema JSON, retention-ish options). The
mismatch message format mirrors the reference: ``field=actual (expected
desired)`` joined with "; ".
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import types as T


class ResourceMismatchError(RuntimeError):
    """Raised when an existing resource's config differs from the desired
    one (the reference's fail-fast path, runner.go:247-251)."""


@dataclass(frozen=True)
class SinkResourceConfig:
    """The 8-ish declared fields of a sink resource (stream analogue)."""
    name: str
    schema_json: str
    format: str = "parquet"
    subjects: tuple[str, ...] = ()
    storage: str = "file"
    replicas: int = 1
    max_bytes: int = -1          # -1 = unlimited (normalizeUnlimitedBytes)
    max_age_s: float = 0.0       # 0 = unlimited
    duplicate_window_s: float = 120.0


def _normalize_unlimited(v: int) -> int:
    return -1 if v <= 0 else v


def config_mismatches(actual: SinkResourceConfig,
                      desired: SinkResourceConfig) -> list[str]:
    """Field-by-field diff in the reference's message format
    (runner.go:338-386)."""
    out: list[str] = []
    if tuple(actual.subjects) != tuple(desired.subjects):
        out.append(f"subjects={list(actual.subjects)} "
                   f"(expected {list(desired.subjects)})")
    if actual.storage != desired.storage:
        out.append(f"storage={actual.storage} (expected {desired.storage})")
    if actual.replicas != desired.replicas:
        out.append(f"replicas={actual.replicas} (expected {desired.replicas})")
    if actual.format != desired.format:
        out.append(f"format={actual.format} (expected {desired.format})")
    if actual.schema_json != desired.schema_json:
        out.append("schema differs (expected declared schema)")
    if _normalize_unlimited(actual.max_bytes) != _normalize_unlimited(desired.max_bytes):
        out.append(f"max_bytes={actual.max_bytes} (expected {desired.max_bytes})")
    if actual.max_age_s != desired.max_age_s:
        out.append(f"max_age={actual.max_age_s} (expected {desired.max_age_s})")
    if actual.duplicate_window_s != desired.duplicate_window_s:
        out.append(f"duplicate_window={actual.duplicate_window_s} "
                   f"(expected {desired.duplicate_window_s})")
    return out


def _marker_path(resource_dir: str) -> str:
    return os.path.join(resource_dir, "_resource.json")


def ensure_resource(resource_dir: str, desired: SinkResourceConfig,
                    *, update: bool = False) -> SinkResourceConfig:
    """Create-or-validate, mirroring ensureEventStream (runner.go:207-255):
    absent -> create; present+equal -> no-op; present+different -> raise
    (or apply when ``update``)."""
    os.makedirs(resource_dir, exist_ok=True)
    marker = _marker_path(resource_dir)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            json.dump(asdict(desired), f, indent=2)
        return desired

    with open(marker) as f:
        raw = json.load(f)
    raw["subjects"] = tuple(raw.get("subjects", ()))
    actual = SinkResourceConfig(**raw)
    mismatches = config_mismatches(actual, desired)
    if not mismatches:
        return actual
    if update:
        with open(marker, "w") as f:
            json.dump(asdict(desired), f, indent=2)
        return desired
    raise ResourceMismatchError(
        f"stream {desired.name!r} config mismatch: " + "; ".join(mismatches)
    )


def schema_to_json(schema: T.StructType) -> str:
    """Canonical schema serialization for the diff."""
    return json.dumps(json.loads(schema.json()), sort_keys=True)
