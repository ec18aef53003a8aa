"""Property test: the Spark (Java) erda-info regex and the pure-Python
reference regex agree on adversarial inputs.

Hypothesis generates tricky strings (bracket salads, braces-UUIDs,
mixed-case levels, unicode); all examples are evaluated in ONE Spark
job against the Python `re` results (per-example Spark jobs would be
prohibitively slow)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from logpipe import pyref

LEVELS = ["Alert", "TRACE", "debug", "DEBU", "Info", "warning", "Err", "ERROR", "x"]

piece = st.one_of(
    st.sampled_from(LEVELS),
    st.sampled_from(["[", "]", "{", "}", ",", "-", "_", "=", "|", " ", "\t"]),
    st.sampled_from(
        [
            "svc-a,", "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee",
            "{aaaaaaaabbbbccccddddeeeeeeeeeeee}", "deadbeef",
            "[svc,]", "[s,k=v]", "INFO [a,b]",
        ]
    ),
    # \r, NEL and LINE SEPARATOR exercise the dot-semantics seam: Java's
    # default `.` excludes them while Go RE2 / Python exclude only \n —
    # the engine pins UNIX_LINES via parse._java (round 9). é/世
    # exercise the \w seam (ASCII classes on both engines).
    st.text(alphabet="aZ0 .:[]{},-_=|é世\r\x85\u2028", min_size=0, max_size=12),
)
line = st.builds(lambda xs: "".join(xs), st.lists(piece, min_size=0, max_size=8))


def test_erda_regex_java_python_parity(spark):
    # materialize one corpus of hypothesis-generated lines
    cases: list[str] = [
        "INFO [svc,]",
        "ERROR [a,{deadbeefdeadbeefdeadbeefdeadbeef}]",
        "INFO\r[svc,]",   # dot-vs-\r seam (matches in RE2/Python, and in Java only under (?d))
        "INFO [é,]",      # \w seam (round-9 hypothesis counterexample)
        "INFO\u2028[svc,]",
    ]

    @settings(max_examples=40, deadline=None)
    @given(st.lists(line, min_size=1, max_size=30))
    def gather(lines):
        cases.extend(lines)

    gather()
    cases = list(dict.fromkeys(cases))[:800]

    from pyspark.sql import functions as F

    from logpipe.operators.parse import erda_info_struct

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, s string")
    got = {
        r["i"]: (r["g"]["level"], r["g"]["request_id"])
        for r in df.select("i", erda_info_struct(F.col("s")).alias("g")).collect()
    }
    for i, c in enumerate(cases):
        m = pyref.ERDA_INFO.search(c)
        exp = (m.group(1) or "", m.group(4) or "") if m else ("", "")
        assert got[i] == exp, f"regex divergence on {c!r}: java={got[i]} py={exp}"
