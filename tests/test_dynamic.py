"""Dynamic-map pipeline == typed pipeline: two independent
articulations of the reference semantics must produce identical
LogEvents on the same input."""

from __future__ import annotations

from logpipe.plans.dynamic import run_dynamic_pipeline
from logpipe.plans.pipeline import run_pipeline


def test_dynamic_equals_typed(spark, transcripts, k8s_meta, tool_meta):
    typed = run_pipeline(transcripts, k8s_meta, tool_meta)
    dyn = run_dynamic_pipeline(transcripts, k8s_meta, tool_meta)

    key = lambda d: (d["content"], d["sink"], d["id"], d["timestamp"])
    a = sorted((r.asDict(recursive=True) for r in typed.collect()), key=key)
    b = sorted((r.asDict(recursive=True) for r in dyn.collect()), key=key)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x == y, f"dynamic/typed divergence:\ntyped={x}\ndynamic={y}"
