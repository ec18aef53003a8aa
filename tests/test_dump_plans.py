"""PLANS.md regeneration must be diff-stable (round-6 verdict: the r6
commit rewrote 22.7k lines of PLANS.md, almost all expression-ID /
plan-id churn from regenerating at a changed HEAD — reviewers should
see only REAL plan changes). dump_plans._normalize strips the
session-volatile tokens; these tests pin (a) the normalizer on the
exact token classes seen in formatted plans and (b) the end-to-end
property: two independent constructions of the same query — which
allocate different expression IDs and checkpoint RDDs — normalize to
byte-identical plan text."""

import sys

sys.path.insert(0, ".")

from scripts.dump_plans import _normalize  # noqa: E402


def test_normalize_token_classes():
    raw = (
        "(3) Exchange\n"
        "Input [2]: [doc_id#4013L, _toks#4107]\n"
        "Arguments: hashpartitioning(doc_id#4013L, 32), "
        "ENSURE_REQUIREMENTS, [plan_id=517]\n"
        "ReusedExchange [sh#99], Exchange [plan_id=233]\n"
        "Scan ExistingRDD rdd-1234[sh#51, poss#52]\n"
        "Arguments: MapPartitionsRDD[22] at localCheckpoint at X.java:0\n"
        "lambdafunction(NOT (lambda x_6#13 = ), lambda x_6#13, false)\n"
        "zip_with(_toks#4107, s#31, lambdafunction(concat(lambda x_45#88, "
        "lambda y_46#89), lambda x_45#88, lambda y_46#89, false))\n"
    )
    got = _normalize(raw)
    assert "#4013" not in got and "#4107" not in got and "#99" not in got
    assert "plan_id=517" not in got and "plan_id=233" not in got
    assert "rdd-1234" not in got
    assert "RDD[22]" not in got and "RDD[N]" in got
    assert "x_6" not in got and "lambda x_K#N" in got
    # Catalyst names 2-arg lambda variables x/y (zip_with — the class
    # the round-7 review caught live in committed PLANS.md): both
    # letters normalize, keeping the letter (left/right identity)
    assert "y_46" not in got and "x_45" not in got
    assert "lambda y_K#N" in got
    # structure preserved: attribute names, operator names, arity
    assert "doc_id#NL" in got
    assert "hashpartitioning(doc_id#NL, 32)" in got
    assert "plan_id=N" in got and "rdd-N" in got
    # idempotent
    assert _normalize(got) == got


def test_same_head_dumps_identically(spark):
    """The end-to-end property behind 'regeneration is a zero diff':
    two fresh constructions of a checkpoint-bearing query (the worst
    churn class — every materialize() allocates new RDD ids and every
    analysis allocates new expression IDs) normalize to identical
    formatted text."""
    from logpipe.traindata.dedup import duplicate_span_trim

    def formatted():
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        df = duplicate_span_trim(docs, k=3, min_docs=2)
        return _normalize(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )

    a, b = formatted(), formatted()
    assert "#N" in a  # the normalizer actually saw expression IDs
    assert a == b
