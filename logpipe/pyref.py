"""Pure-Python reference implementation of the pipeline (SURVEY.md §5).

Row-at-a-time, dict-based — deliberately written the way fluent-bit
processes records (mutable map + tag) so the Spark DAG is checked
against an independent articulation of the same semantics, not against
itself. Used only by tests; never in the hot path.
"""

from __future__ import annotations

import re
from typing import Any

MAX_CONTENT = 51200

_LEVEL = (
    "[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|DEBU|[Ii]nfo|INFO"
    "|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)"
)
# re.ASCII pins \w to [0-9A-Za-z_]: the engines this oracle checks against —
# Java regexp_extract (no UNICODE_CHARACTER_CLASS) and the reference's regex
# engine, fluent-bit's Oniguruma running the conf/ds/parsers.conf patterns
# (Ruby flavor: \w is ASCII unless the pattern opts into Unicode props) —
# are both ASCII-classed, while Python's default \w is Unicode.
# Without the flag the oracle alone matches e.g. "INFO [é,]" (hypothesis
# counterexample, round 9) and the parity test fails on the oracle's side.
ERDA_INFO = re.compile(
    f"({_LEVEL})" + r"(.*?)\[([\w|\-|_]*?)\,"
    r"(\{?\w{8}-?\w{4}-?\w{4}-?\w{4}-?\w{12}\}?)?([\,|\w|\-|_|=]*?)\]",
    re.ASCII,
)
CPUSET = re.compile(r"^/(.*?)/(\w+$)", re.ASCII)

DICE_KEYS = [
    "runtime_id", "runtime_name", "application_id", "application_name",
    "service_name", "workspace", "project_id", "project_name",
    "org_id", "org_name", "cluster_name",
]

PLATFORM_KEYS = [
    "org_id", "org_name", "project_id", "project_name", "application_id",
    "application_name", "service_name", "runtime_id", "runtime_name",
    "workspace",
]


def process_row(
    row: dict[str, Any],
    k8s: dict[str, dict[str, Any]],
    tools: dict[str, str],
    cluster_name: str = "erda-cluster",
) -> list[dict[str, Any]]:
    """One transcript row -> 0..2 LogEvent dicts (list per routed sink)."""
    text = row.get("text")
    if not text:  # Skip_Empty_Lines
        return []
    content = text[:MAX_CONTENT]  # truncate-log

    tags: dict[str, str] = {}
    m = ERDA_INFO.search(content)
    if m:
        if m.group(1):
            tags["level"] = m.group(1)
        if m.group(4):
            tags["request_id"] = m.group(4)

    meta = k8s.get(row["conv_id"], {})
    cpuset = tools.get(row.get("tool") or "")
    tool_cid = None
    if cpuset is not None:
        cm = CPUSET.search(cpuset)
        tool_cid = cm.group(2) if cm else ""

    container_id = meta.get("docker_id") or tool_cid
    rid = container_id or ""

    tags["cluster_name"] = cluster_name
    if meta.get("pod_name"):
        tags["pod_name"] = meta["pod_name"]
    if meta.get("namespace_name"):
        tags["pod_namespace"] = meta["namespace_name"]
    if container_id:
        tags["container_id"] = container_id
    for k in PLATFORM_KEYS:
        if meta.get(k):
            tags[k] = meta[k]
    for k in DICE_KEYS:
        src = cluster_name if k == "cluster_name" else meta.get(k)
        if src:
            tags[f"dice_{k}"] = src

    labels: dict[str, str] = {}
    if meta.get("monitor_log_collector"):
        labels["monitor_log_collector"] = meta["monitor_log_collector"]

    stream = "stderr" if row.get("role") in ("tool", "system") else "stdout"
    # whole-second float + exact integer micros: .timestamp()*1e6 in one
    # float op can truncate 1us low; timegm would mis-shift on non-UTC
    # hosts (Spark collect() returns naive LOCAL-tz datetimes)
    ts = row["ts"]
    ts_nanos = int(ts.replace(microsecond=0).timestamp()) * 10**9 + ts.microsecond * 1000

    sinks = []
    if labels.get("monitor_log_collector"):
        sinks.append("export")
    sinks.append("job" if meta.get("define_tag") else "container")

    out = []
    for sink in sinks:
        is_job = sink == "job"
        out.append(
            {
                "source": "job" if is_job else "container",
                "id": (meta.get("define_tag") or "") if is_job else rid,
                "stream": stream,
                "content": content,
                "offset": 0,
                "timestamp": ts_nanos,
                "tags": dict(tags),
                "labels": dict(labels),
                "sink": sink,
            }
        )
    return out
