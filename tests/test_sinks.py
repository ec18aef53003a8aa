"""Fan-out writer: salted repartition + per-sink/collector layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpipe.plans.pipeline import run_pipeline
from logpipe.sinks import read_sink, write_sinks


def test_write_read_roundtrip(spark, transcripts, k8s_meta, tool_meta, tmp_path):
    out = run_pipeline(transcripts, k8s_meta, tool_meta)
    base = str(tmp_path / "sinks")
    write_sinks(out, base, n_partitions=8, n_salts=4)

    back = spark.read.parquet(base)
    # routed-row counts survive the write exactly
    a = {r["sink"]: r["count"] for r in out.groupBy("sink").count().collect()}
    b = {r["sink"]: r["count"] for r in back.groupBy("sink").count().collect()}
    assert a == b

    # export sink is partitioned by collector (dynamic-URL key)
    export = read_sink(spark, base, "export")
    collectors = [r["collector"] for r in export.select("collector").distinct().collect()]
    assert collectors and all(c.startswith("collector-") for c in collectors)

    # non-export rows carry the '-' placeholder collector
    assert (
        back.filter((F.col("sink") != "export") & (F.col("collector") != "-")).count()
        == 0
    )

    # content equality through the roundtrip (same multiset per sink)
    cols = ["sink", "source", "id", "stream", "content", "timestamp"]
    assert out.select(cols).exceptAll(back.select(cols)).count() == 0
    assert back.select(cols).exceptAll(out.select(cols)).count() == 0


def test_export_payloads_roundtrip(spark, transcripts, k8s_meta, tool_meta):
    """O3 wire payloads: gunzip+JSON roundtrip reproduces every export
    row exactly; chunks bounded, single-collector, dynamic URL from the
    first record's label; bytes deterministic across builds."""
    import gzip
    import hashlib
    import json

    from logpipe.sinks import build_export_payloads

    out = run_pipeline(transcripts, k8s_meta, tool_meta)
    payloads = build_export_payloads(out, chunk_rows=50).collect()
    assert payloads

    decoded = []
    for p in payloads:
        assert p["content_encoding"] == "gzip"
        assert p["content_type"] == "application/json; charset=UTF-8"
        assert 0 < p["n_events"] <= 50
        events = json.loads(gzip.decompress(bytes(p["body"])))
        assert len(events) == p["n_events"]
        for e in events:
            # single-collector chunk + dynamic URL (sender.go:74-77)
            assert e["labels"]["monitor_log_collector"] == p["collector"] == p["url"]
            assert list(e.keys()) == [
                "source", "id", "stream", "content",
                "offset", "timestamp", "tags", "labels",
            ]  # Go struct tag order (sender.go:13-24)
        decoded.extend(events)

    exp = out.filter("sink = 'export'")
    assert len(decoded) == exp.count()
    a = sorted((e["content"], e["id"], e["timestamp"]) for e in decoded)
    b = sorted(
        (r["content"], r["id"], r["timestamp"])
        for r in exp.select("content", "id", "timestamp").collect()
    )
    assert a == b

    # determinism: same input -> byte-identical payloads (retry-safe)
    h1 = sorted(hashlib.md5(bytes(p["body"])).hexdigest() for p in payloads)
    h2 = sorted(
        hashlib.md5(bytes(p["body"])).hexdigest()
        for p in build_export_payloads(out, chunk_rows=50).collect()
    )
    assert h1 == h2


def test_salting_spreads_hot_key(spark, transcripts, k8s_meta, tool_meta):
    """The hot conv (synth puts ~15% of rows on one conv) must not land
    in a single task partition after the salted write repartition."""
    from logpipe.sinks import salted_repartition

    out = run_pipeline(transcripts, k8s_meta, tool_meta)
    container_only = out.filter(F.col("sink") == "container")
    salted = salted_repartition(container_only, "sink", 8, n_salts=8)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    # single-key data (sink='container') still spreads across partitions
    assert len(counts) > 1
    assert max(counts) < sum(counts) * 0.8


def test_http_payloads_roundtrip(spark, transcripts, k8s_meta, tool_meta):
    """O1/O2 wire bodies (conf/ds/fluent-bit.conf:207-237): per-sink
    gzip JSON arrays with NO injected date key (json_date_key false),
    fixed uri + Retry_Limit per block, deterministic bytes."""
    import gzip
    import hashlib
    import json

    from logpipe.sinks import build_http_payloads

    out = run_pipeline(transcripts, k8s_meta, tool_meta)
    payloads = build_http_payloads(out, chunk_rows=50).collect()
    assert payloads

    decoded = {"container": [], "job": []}
    for p in payloads:
        assert p["content_encoding"] == "gzip"
        assert 0 < p["n_events"] <= 50
        assert (p["uri"], p["retry_limit"]) == (
            ("/collect/logs/container", 1000)
            if p["sink"] == "container"
            else ("/collect/logs/job", 100)
        )
        events = json.loads(gzip.decompress(bytes(p["body"])))
        assert len(events) == p["n_events"]
        for e in events:
            # Go struct tag order; no fluent-bit-injected date key
            assert list(e.keys()) == [
                "source", "id", "stream", "content",
                "offset", "timestamp", "tags", "labels",
            ]
        decoded[p["sink"]].extend(events)

    for sink in ("container", "job"):
        exp = out.filter(F.col("sink") == sink)
        assert len(decoded[sink]) == exp.count()
        a = sorted((e["content"], e["id"], e["timestamp"]) for e in decoded[sink])
        b = sorted(
            (r["content"], r["id"], r["timestamp"])
            for r in exp.select("content", "id", "timestamp").collect()
        )
        assert a == b

    h1 = sorted(hashlib.md5(bytes(p["body"])).hexdigest() for p in payloads)
    h2 = sorted(
        hashlib.md5(bytes(p["body"])).hexdigest()
        for p in build_http_payloads(out, chunk_rows=50).collect()
    )
    assert h1 == h2


def test_export_payload_matches_reference_golden_fixture(spark):
    """Wire parity against the reference's OWN golden LogEvent
    (out_erda/sender_test.go:9-26, the mockLogEvent that doubles as the
    wire-format documentation, decoded by sender_test.go:28-43's
    gunzip+unmarshal): feed that exact record through
    build_export_payloads and assert field-for-field JSON equality
    after gunzip — full dice_* tag map, UnixNano timestamp, Go struct
    tag key order (sender.go:13-24). Red under any field rename,
    reorder, tag drop, or timestamp-unit change."""
    import gzip
    import json

    from logpipe.sinks import build_export_payloads

    golden = {
        "source": "container",
        "id": "b2a9cb046a8275c57307cad907ef0a5553a78d6f4c1da7186566555d1a5383dd",
        "stream": "stderr",
        "content": (
            'time="2021-10-12 16:00:14.130242184" level=info msg="finish to run '
            'the task: executor K8S/MARATHONFORTERMINUSDEV '
            '(id: 1120384ca1, action: 5)"\n'
        ),
        "offset": 0,
        "timestamp": 1634025614130323755,  # UnixNano
        "tags": {
            "pod_name": "scheduler-3feb156fc4-cf6b45b89-cwh5s",
            "pod_namespace": "project-387-dev",
            "pod_id": "ad05d65a-b8b0-4b7c-84f3-88a2abc11bde",
            "container_id": "b2a9cb046a8275c57307cad907ef0a5553a78d6f4c1da7186566555d1a5383dd",
            "dice_cluster_name": "terminus-dev",
            "dice_application_name": "scheduler",
            "msp_env_id": "abc111",
            "cluster_name": "terminus-dev",
            "application_name": "scheduler",
        },
        "labels": {},  # mock carries no labels (nil map)
    }
    row = dict(golden, sink="export", labels={})
    df = spark.createDataFrame(
        [row],
        schema=(
            "source string, id string, stream string, content string, "
            "offset long, timestamp long, tags map<string,string>, "
            "labels map<string,string>, sink string"
        ),
    )
    payloads = build_export_payloads(df).collect()
    assert len(payloads) == 1
    p = payloads[0]
    assert p["n_events"] == 1
    assert p["url"] == ""  # no monitor_log_collector label on the mock
    events = json.loads(gzip.decompress(bytes(p["body"])))
    assert len(events) == 1
    # Go struct tag order on the wire...
    assert list(events[0].keys()) == list(golden.keys())
    # ...and field-for-field equality with the reference fixture
    assert events[0] == golden
