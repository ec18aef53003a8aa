"""Schemas for the pipeline (SURVEY.md §1).

- TRANSCRIPT: the input table per BASELINE.json input_hint — the stand-in
  for fluent-bit's tailed container-log stream
  (reference: conf/ds/docker-runtime.conf:1-21).
- K8S_META / TOOL_META: enrichment dimensions (reference: kubernetes
  filter conf/ds/fluent-bit.conf:44-59; Lua lookup
  conf/eci/scripts/enrich-meta.lua:1-21).
- LOG_EVENT: the only fixed output schema in the reference
  (out_erda/sender.go:13-24), plus a ``sink`` routing-audit column.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# kubernetes-filter dimension: pod/platform metadata keyed by conv_id
# (= the tag-encoded pod/container identity, conf/ds/fluent-bit.conf:51).
K8S_META = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("pod_name", T.StringType(), True),
        T.StructField("namespace_name", T.StringType(), True),  # renamed -> pod_namespace
        T.StructField("docker_id", T.StringType(), True),  # renamed -> container_id
        T.StructField("container_hash", T.StringType(), True),  # removed by compat block
        T.StructField("container_image", T.StringType(), True),  # removed by compat block
        T.StructField("org_id", T.StringType(), True),
        T.StructField("org_name", T.StringType(), True),
        T.StructField("project_id", T.StringType(), True),
        T.StructField("project_name", T.StringType(), True),
        T.StructField("application_id", T.StringType(), True),
        T.StructField("application_name", T.StringType(), True),
        T.StructField("service_name", T.StringType(), True),
        T.StructField("runtime_id", T.StringType(), True),
        T.StructField("runtime_name", T.StringType(), True),
        T.StructField("workspace", T.StringType(), True),
        # non-null => row (also) routes to the export sink
        # (labels['monitor_log_collector'], conf/ds/fluent-bit.conf:182-187)
        T.StructField("monitor_log_collector", T.StringType(), True),
        # non-null => conv is a pipeline job -> job sink
        # (__tags_terminus_define_tag, conf/ds/fluent-bit.conf:189-199)
        T.StructField("define_tag", T.StringType(), True),
    ]
)

# Lua-lookup dimension (enrich-meta.lua:5 keyed on container name == tool).
TOOL_META = T.StructType(
    [
        T.StructField("tool", T.StringType(), False),
        T.StructField("cpuset", T.StringType(), True),
    ]
)

# LogEvent (out_erda/sender.go:13-24) + sink audit column.
LOG_EVENT = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("stream", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("sink", T.StringType(), False),
    ]
)

# the 11 dice_* compat copies (conf/ds/fluent-bit.conf:148-161)
DICE_COMPAT_KEYS = [
    "runtime_id",
    "runtime_name",
    "application_id",
    "application_name",
    "service_name",
    "workspace",
    "project_id",
    "project_name",
    "org_id",
    "org_name",
    "cluster_name",
]

MAX_CONTENT_CHARS = 51200  # truncate-log parser, conf/ds/parsers.conf:6-10
