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


def test_truncate_codepoint_parity_four_engines(spark):
    """truncate_log counts CODEPOINTS identically in all four engines
    (round-10 audit of the reference's `[\\s\\S]{0,51200}` truncation —
    see the operator docstring for the Onig encoding-unit residual):
    Spark substring, the pyref Python slice, the pandas str.slice the
    Arrow UDF side would use, and the DuckDB oracle's substring. The
    adversarial rows mix 1/2/3/4-byte UTF-8 — the 4-byte emoji are two
    UTF-16 units, so a Java-String-indexed implementation would cut
    inside a surrogate pair where every codepoint engine keeps the
    whole character."""
    import duckdb
    import pandas as pd

    from logpipe.operators.parse import truncate_log
    from logpipe.pyref import MAX_CONTENT

    assert MAX_CONTENT == 51200  # pyref slices text[:MAX_CONTENT]
    k = 7
    cases = [
        "",                      # empty survives
        "abcdef",                # under the cap
        "abcdefg",               # exactly at it
        "abcdefgh",              # one over (ASCII)
        "é世😀é世😀é世😀",          # multi-byte, cap mid-string
        "😀😀😀😀😀😀😀😀",        # cap between 4-byte chars: UTF-16
                                  # index 7 would split a surrogate pair
        "aé世😀aé世😀",            # mixed widths straddling the cap
        "日本語のログ行です",       # 3-byte chars only
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, s string"
    )
    got_spark = {
        r["i"]: r["t"]
        for r in df.select("i", truncate_log(df.s, k).alias("t")).collect()
    }
    got_python = {i: c[:k] for i, c in enumerate(cases)}
    got_pandas = dict(enumerate(pd.Series(cases).str.slice(0, k)))
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            "SELECT i, substring(s, 1, ?) FROM (SELECT UNNEST(range(?)) i, "
            "UNNEST(?::VARCHAR[]) s)",
            [k, len(cases), cases],
        ).fetchall()
    )
    assert got_spark == got_python == got_pandas == got_duck
    # and the cap never splits a character: every truncation re-encodes
    # to valid UTF-8 that is a byte-prefix of the original
    for i, c in enumerate(cases):
        assert c.encode("utf-8").startswith(got_spark[i].encode("utf-8"))
