"""Env-var config surface (entrypoint.sh:19-61).

The reference templates its conf from environment variables at
container start — throttle rate/retain, the tail Exclude_Path, the
cluster identity — so operators tune the pipeline without editing
conf. The Spark job exposes the same knobs: every `LOGPIPE_*` env var
below mirrors one `FLUENTBIT_*` / deploy var, with the reference's
defaults, and the CLI flags override env (flag > env > default —
the same precedence the entrypoint's `if [ -z ... ]` blocks encode).

| env var                  | reference var / default              |
|--------------------------|--------------------------------------|
| LOGPIPE_THROTTLE_RATE    | FLUENTBIT_THROTTLE_RATE (1000)       |
| LOGPIPE_THROTTLE_RETAIN  | FLUENTBIT_THROTTLE_RETAIN (true)     |
| LOGPIPE_EXCLUDE_PATH     | FLUENTBIT_INPUT_TAIL_EXCLUDE_PATH    |
|                          | (comma-separated globs; default      |
|                          | DEFAULT_EXCLUDE_PATHS below)         |
| LOGPIPE_CLUSTER_NAME     | DICE_CLUSTER_NAME ('erda-cluster')   |
| LOGPIPE_PLAN             | CONFIG_FILE select (ds)              |
| LOGPIPE_THROTTLE_BUCKET  | throttle Interval/Window             |
|                          | (conf/ds/fluent-bit.conf:18-19; 'second') |
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# The reference default (entrypoint.sh:19-21) plus a path-agnostic
# complement: fnmatch of the full-path glob only fires under
# /var/log/containers, so a logs dir anywhere else would silently
# re-ingest the collector's own logs without the second pattern. Both
# still exclude ONLY *fluent-bit* logs. LOGPIPE_EXCLUDE_PATH accepts a
# comma-separated list, like FLUENTBIT_INPUT_TAIL_EXCLUDE_PATH.
DEFAULT_EXCLUDE_PATHS: tuple[str, ...] = (
    "/var/log/containers/*fluent-bit*.log",
    "*fluent-bit*.log",
)


def _parse_bool(v: str, name: str) -> bool:
    low = v.strip().lower()
    if low in ("true", "1", "yes", "on"):
        return True
    if low in ("false", "0", "no", "off"):
        return False
    raise ValueError(f"{name}: expected a boolean, got {v!r}")


@dataclass(frozen=True)
class PipelineConfig:
    throttle_rate: int = 1000          # entrypoint.sh:42-44
    throttle_retain: bool = True       # entrypoint.sh:45-47
    throttle_bucket: str = "second"    # conf/ds/fluent-bit.conf:18-19
    exclude_path: tuple[str, ...] = DEFAULT_EXCLUDE_PATHS  # entrypoint.sh:19-21
    cluster_name: str = "erda-cluster"
    plan: str = "ds"                   # ds | dynamic (CONFIG_FILE select)

    def __post_init__(self):
        if self.throttle_rate < 1:
            raise ValueError(
                f"throttle_rate must be >= 1, got {self.throttle_rate}"
            )
        if self.plan not in ("ds", "dynamic"):
            raise ValueError(f"plan must be ds|dynamic, got {self.plan!r}")
        if self.throttle_bucket not in ("second", "minute", "hour", "day"):
            raise ValueError(
                f"throttle_bucket must be second|minute|hour|day, "
                f"got {self.throttle_bucket!r}"
            )
        if not all(isinstance(g, str) and g for g in self.exclude_path):
            raise ValueError(
                f"exclude_path must be non-empty glob strings, "
                f"got {self.exclude_path!r}"
            )


def from_env(env: dict | None = None, **overrides) -> PipelineConfig:
    """Resolve config: explicit overrides (CLI flags; None = unset)
    beat env vars beat the reference's defaults."""
    env = os.environ if env is None else env
    base = PipelineConfig()
    vals = {
        "throttle_rate": int(env.get("LOGPIPE_THROTTLE_RATE", base.throttle_rate)),
        "throttle_retain": (
            _parse_bool(env["LOGPIPE_THROTTLE_RETAIN"], "LOGPIPE_THROTTLE_RETAIN")
            if "LOGPIPE_THROTTLE_RETAIN" in env
            else base.throttle_retain
        ),
        "throttle_bucket": env.get("LOGPIPE_THROTTLE_BUCKET", base.throttle_bucket),
        "exclude_path": (
            tuple(
                g.strip()
                for g in env["LOGPIPE_EXCLUDE_PATH"].split(",")
                if g.strip()
            )
            if "LOGPIPE_EXCLUDE_PATH" in env
            else base.exclude_path
        ),
        "cluster_name": env.get("LOGPIPE_CLUSTER_NAME", base.cluster_name),
        "plan": env.get("LOGPIPE_PLAN", base.plan),
    }
    vals.update({k: v for k, v in overrides.items() if v is not None})
    return PipelineConfig(**vals)
