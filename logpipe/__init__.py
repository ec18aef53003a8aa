"""logpipe — a from-scratch PySpark-native log/telemetry pipeline.

Re-expresses the data-processing capabilities of the erda-fluent-bit
ingest pipeline (reference at /root/reference, read-only) as an
idiomatic Spark DataFrame DAG over a transcripts table
``(conv_id, turn_idx, role, text, tool, ts)``:

    parse (regex/grok, vectorized) -> enrich (broadcast lookup joins)
    -> reshape (rename/copy/nest/lift) -> route (tag fan-out)
    -> project (LogEvent) -> per-sink writes

Blueprint: SURVEY.md. Operating envelope: BASELINE.md.
"""

__version__ = "0.1.0"
