"""Composed curated-corpus DAGs (v2..v5), the streaming gate, and the
similarity gates (simhash, cosine/ANN) — section 3 of the registry;
see logpipe.plans.driver_queries for the registry-wide docs. The
curation oracles stitch together the per-operator CTE builders from
logpipe.plans.q_traindata so a fix in a standalone gate cannot drift
from the composed replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logpipe.plans.q_pipeline import _FLAGSHIP_SQL
from logpipe.plans.q_traindata import (
    _BLOCKLIST,
    _C4_KEEP_WHERE_SQL,
    _C4_TEXT_SQL,
    _PII_SUFFIX_SQL,
    _TRIGRAM_SQL,
    _WORDS_SQL,
    _closure_ctes,
    _dup_span_ctes,
    _dup_span_trim_ctes,
    _gopher_ctes,
    _hash_frac_sql,
    _lang_id_parts,
    _line_dedup_ctes,
    _minhash_sql,
    _normalize_expr_sql,
    _pii_redact_sql,
    _pii_suffix_cols,
    _pii_suffix_sql,
)
from logpipe.plans.registry import _REGISTRY, _docs, register
from logpipe.sources.events import (
    events_as_transcripts,
    events_k8s_meta,
    events_tool_meta,
    load_events,
)

def _curation_tail_sql(
    kept_cte: str = "keptc4",
    near_threshold: float = 0.1,
    min_overlap: int = 5,
    budget: int = 512,
    gopher_min_tokens: int | None = None,
) -> str:
    """The shared curation TAIL consumed by curated_corpus_v2 AND _v3
    (review finding: the two builders had copy-pasted it, the exact
    drift the shared-CTE helpers exist to prevent): benchmark
    decontamination -> exact-dedup winners -> minhash near-dup winners
    -> [optional Gopher keep] -> mixture -> packing -> per-bucket
    stats. Consumes ``kept_cte`` = (doc_id, source, text); returns the
    CTE chain plus the final SELECT, to be appended after the caller's
    WITH RECURSIVE head. Hot multiply-referenced CTEs are MATERIALIZED
    (DuckDB inlines CTEs per reference; un-hinted, the recursive
    closure re-ran per consumer)."""
    mh = _minhash_sql(threshold=near_threshold, src="kept2").strip()
    if not mh.startswith("WITH "):  # survives python -O, like the gates
        raise AssertionError("minhash oracle SQL no longer starts with WITH")
    mh_body = mh[len("WITH "):]
    mh_ctes, mh_select = mh_body.rsplit("SELECT doc_a, doc_b", 1)
    if gopher_min_tokens is not None:
        gopher_block = (
            f", {_gopher_ctes('final', out='gk', min_tokens=gopher_min_tokens).lstrip()},"
            " gkept AS MATERIALIZED (\n"
            "  SELECT f.doc_id, f.source, f.text\n"
            "  FROM final f JOIN gk ON f.doc_id = gk.doc_id AND gk.keep\n)"
        )
        mix_src = "gkept"
    else:
        gopher_block = ""
        mix_src = "final"
    return f"""kw AS MATERIALIZED (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS words
  FROM {kept_cte}
), dg AS (
  SELECT doc_id, {_TRIGRAM_SQL} AS grams FROM kw
), bwords AS (
  SELECT doc_id AS bench_id,
         list_filter(regexp_split_to_array(trim(array_to_string(words[1:12], ' ')), '\\s+'),
                     x -> x <> '') AS words
  FROM kw WHERE doc_id % 31 = 0
), bg AS (
  SELECT bench_id, {_TRIGRAM_SQL} AS grams FROM bwords
), de AS (
  SELECT doc_id, unnest(grams) AS gram FROM dg
), be AS (
  SELECT DISTINCT bench_id, gram
  FROM (SELECT bench_id, unnest(grams) AS gram FROM bg)
), hits AS (
  SELECT DISTINCT doc_id FROM (
    SELECT de.doc_id FROM de JOIN be USING (gram)
    GROUP BY de.doc_id, be.bench_id HAVING count(*) >= {min_overlap}
  )
), clean AS MATERIALIZED (
  SELECT k.doc_id, k.source, k.text FROM kw k
  WHERE k.doc_id NOT IN (SELECT doc_id FROM hits)
), fpw AS (
  SELECT min(doc_id) AS doc_id
  FROM clean GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
), kept2 AS MATERIALIZED (
  SELECT c.doc_id, c.source, c.text FROM clean c JOIN fpw USING (doc_id)
), {mh_ctes.rstrip()}, mh AS (
  SELECT doc_a, doc_b{mh_select}
), {_closure_ctes(seed_cte="kept2")}, final AS MATERIALIZED (
  SELECT k.doc_id, k.source, k.text
  FROM kept2 k JOIN cl ON k.doc_id = cl.doc_id AND cl.doc_id = cl.cluster_id
){gopher_block}, mr AS (
  SELECT doc_id, source, text,
         CAST(floor(rate) AS INT)
           + CASE WHEN {_hash_frac_sql('mix')} < rate - floor(rate) THEN 1 ELSE 0 END AS n_copies
  FROM (
    SELECT *, CASE WHEN source IN ('src0','src1','src2','src3') THEN 0.5
                   WHEN source IN ('src4','src5') THEN 2.25
                   ELSE 1.0 END AS rate
    FROM {mix_src}
  )
), mexp AS (
  SELECT doc_id, source, text, unnest(generate_series(0, n_copies - 1)) AS copy
  FROM mr WHERE n_copies > 0
), pk AS (
  SELECT doc_id, copy,
         (('0x' || substring(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8) AS bucket,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM mexp
), pc AS (
  SELECT bucket, doc_id, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id, copy
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {budget}.0)
              AS BIGINT) AS chunk
  FROM pk
)
SELECT bucket,
       CAST(count(DISTINCT chunk) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_unique_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM pc GROUP BY bucket
"""


def _curation_tail(kept: DataFrame, gopher_min_tokens: int | None = None) -> DataFrame:
    """Spark twin of _curation_tail_sql — the shared post-quality
    curation stages for v2/v3, composed from the shipped operators.
    ``kept``: (doc_id, source, text), post-quality, pre-decontamination.

    Round-11 shape: the tail's multiply-consumed frames are
    materialize()d at their branch points (mode-injectable,
    logpipe.materialize — the same corpus-sized-checkpoint class as the
    span gate's cut). Un-cut, every consumer of ``kept`` (the bench
    snippet build, the contamination corpus side, the decontaminated
    anti-join), of ``clean`` (exact-dedup winners + the semi-join), of
    ``kept2`` (the whole near-dup pipeline + the winner semi-join) and
    of ``final`` (both gopher passes + the mixture) re-expanded the
    ENTIRE upstream chain back to the previous cut — measured 12.05s
    for the tail-after-clustering at sf0.1, dominated by those repeated
    subtree expansions, vs ~4s with the cuts (the round-5 duplicated-
    subtree class, applied to the tail's own frames). The checkpoints
    attach to the returned frame: ``release(result)`` frees them."""
    from logpipe.materialize import attach_release, materialize
    from logpipe.traindata import textstats as ts
    from logpipe.traindata.dedup import (
        benchmark_contamination,
        exact_dedup,
        near_dup_clusters,
    )
    from logpipe.traindata.sampling import mixture_sample, pack_chunks

    held: list[DataFrame] = []

    def cut(df: DataFrame) -> DataFrame:
        out = materialize(df)
        held.append(out)
        return out

    kept = cut(kept)
    bench = kept.filter(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(ts.tokens(F.col("text")), 1, 12)).alias("text"),
    )
    hits = (
        benchmark_contamination(kept, bench, n=3, min_overlap=5)
        .select("doc_id")
        .distinct()
    )
    clean = cut(kept.join(hits, "doc_id", "left_anti"))
    exact_winners = exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    kept2 = cut(clean.join(exact_winners, "doc_id", "left_semi"))
    cl = near_dup_clusters(kept2, n=2, k=32, bands=8, threshold=0.1)
    held.append(cl)  # lazy over its labels checkpoint — released with the result
    winners = cl.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    final = kept2.join(winners, "doc_id", "left_semi")
    if gopher_min_tokens is not None:
        final = cut(final)
        g_ids = (
            ts.gopher_keep(final, min_tokens=gopher_min_tokens)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        final = final.join(g_ids, "doc_id", "left_semi")
    rates = {f"src{i}": 0.5 for i in range(4)} | {"src4": 2.25, "src5": 2.25}
    mixed = mixture_sample(final, rates)
    packed = pack_chunks(mixed, budget=512, n_buckets=8)
    # n_chunks WITHOUT a second countDistinct: chunk is non-decreasing
    # along pack_chunks' own (bucket / doc_id, copy) order, so distinct
    # chunks == chunk-run starts, countable with a lag over the SAME
    # window spec pack_chunks sorted by (one Window node, no extra
    # exchange). Two distincts in one aggregate would compile through
    # RewriteDistinctAggregates into an Expand that (a) multiplies
    # every row x3 through the final shuffle and (b) assigns grouping-
    # set ids in allocation order — nondeterministic plan text, the
    # PLANS.md churn class. One distinct (doc_id) plans as the
    # deterministic two-phase aggregate.
    from pyspark.sql.window import Window

    order_cols = ["doc_id"] + (["copy"] if "copy" in packed.columns else [])
    w = Window.partitionBy("bucket").orderBy(*order_cols)
    prev_chunk = F.lag("chunk").over(w)
    new_chunk = (
        prev_chunk.isNull() | (F.col("chunk") != prev_chunk)
    ).cast("long")
    return attach_release(
        packed.withColumn("_new_chunk", new_chunk).groupBy("bucket").agg(
            F.sum("_new_chunk").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_unique_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        ),
        *held,
    )


def _curated_corpus_v2_sql(
    near_threshold: float = 0.1, min_overlap: int = 5, budget: int = 512
) -> str:
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source, ({_C4_TEXT_SQL}) || {_PII_SUFFIX_SQL} AS txt
  FROM documents
), c4 AS (
  SELECT doc_id, source, txt,
         list_filter(list_transform(string_split(txt, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines
  FROM base
), keptc4 AS (
  SELECT doc_id, source, {_pii_redact_sql("txt")} AS text
  FROM c4 WHERE {_C4_KEEP_WHERE_SQL}
), {_curation_tail_sql("keptc4", near_threshold, min_overlap, budget)}"""


def curated_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation, v2 — every safety/quality stage in one DAG.

    UNREGISTERED since round 5 (the round-4 verdict's portfolio audit:
    v2 is strictly subsumed by v3/v4 — same tail, fewer stages — and
    the slot was spent on the previously-ungated multimodal family).
    Kept as a bench entry for round-over-round comparability; its
    oracle lives on in _curated_corpus_v2_sql for local crosschecks.

    Stages:

      C4 line-quality keep (textstats.c4_keep)
      -> PII redaction (textstats.redact_pii)
      -> benchmark decontamination drop (dedup.benchmark_contamination,
         bench = first-12-token snippets of doc_id%31==0 docs)
      -> exact-dedup winners (dedup.exact_dedup)
      -> near-dup cluster winners (dedup.near_dup_clusters)
      -> mixture re-weighting (sampling.mixture_sample)
      -> sequence packing (sampling.pack_chunks)
      -> per-bucket chunk/row/token stats.

    Scale shape: every filter stage communicates ids only (left_semi /
    left_anti joins; payloads stay columnar in place); the bench gram
    set is broadcast; mixture is a projection + generator; packing
    shuffles once on the 8-way pack bucket. The only payload-bearing
    exchange end-to-end is the packing bucket shuffle, sized by the
    CURATED corpus, not the input."""
    from logpipe.traindata import textstats as ts

    c4_txt = F.concat(
        F.when(F.col("doc_id") % 17 == 0, F.lit("lorem ipsum dolor sit. "))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit('{"k": 1} ')).otherwise(F.lit("")),
        F.expr("replace(text, ' the ', concat('.', chr(10)))"),
        *_pii_suffix_cols(" contact user"),
    )
    base = _docs(spark, sf_dir).select("doc_id", "source", c4_txt.alias("text"))
    kept = base.filter(ts.c4_keep(F.col("text")))
    red = kept.select(
        "doc_id", "source", ts.redact_pii(F.col("text")).alias("text")
    )
    return _curation_tail(red)


# --- curated_corpus_v3/v4: EVERY curation operator in one DAG -------------
# normalize -> domain blocklist -> global line dedup -> C4 + lang +
# quality keep -> PII redaction -> benchmark decontamination -> exact
# dedup -> near-dup winners -> Gopher keep -> mixture -> packing.
# Subsumes v1 (lang/quality) and adds the round-4 operators to v2's
# composition; the construction plants newline structure, shared
# footer/URL lines, PII, lorem/brace markers, AND control/NBSP garbage
# so no stage is vacuous.

_V3_TEXT_SQL = (
    f"({_C4_TEXT_SQL})"
    " || chr(10) || 'visit https://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.net/x now.'"
    " || chr(10) || 'footer-' || CAST(doc_id % 7 AS VARCHAR) || ' end.'"
    " || " + _pii_suffix_sql("chr(10) || 'contact user'")
    + " || chr(9) || chr(9) || 'a' || chr(7) || 'b ok.'"
)


def _curated_corpus_v3_sql(
    near_threshold: float = 0.1,
    min_overlap: int = 5,
    budget: int = 512,
    quality_min: float = 0.6,
    gopher_min_tokens: int = 20,
    span_gate_frac: float | None = None,
    span_trim_band: tuple[float, float] | None = None,
) -> str:
    scores, case_sql = _lang_id_parts()
    words_lower = _WORDS_SQL.replace("trim(text)", "trim(lower(text))")
    quality_sql = (
        "round(0.4 * least(1.0, CAST(len(words) AS DOUBLE) / 50.0)"
        " + 0.3 * alpha_ratio"
        " + 0.3 * least(1.0, (sw / greatest(CAST(len(words) AS DOUBLE), 1.0)) * 5.0), 4)"
    )
    if span_gate_frac is not None and span_trim_band is not None:
        raise ValueError("span_gate_frac and span_trim_band are exclusive")
    if span_trim_band is not None:
        # v5's trim/drop/keep gate: span-TRIM over the blocklist
        # survivors; rmf = fraction of tokens the winner rule removes.
        # rmf is exact int-over-int double division — bit-identical in
        # Spark (try_divide) and DuckDB (nullif), so the band compares
        # are engine-stable.
        lo, hi = span_trim_band
        rmf = (
            "coalesce(CAST(n_tokens_removed AS DOUBLE)"
            " / nullif(CAST(n_tokens_kept + n_tokens_removed AS DOUBLE), 0.0), 0.0)"
        )
        span_block = (
            f", {_dup_span_trim_ctes('nb', out='dt', k=3, min_docs=2).lstrip()},"
            " dtv AS (\n"
            f"  SELECT doc_id, text AS trimmed, {rmf} AS rmf FROM dt\n"
            "), nbs AS MATERIALIZED (\n"
            "  SELECT nb.doc_id, nb.source,\n"
            f"         CASE WHEN dtv.rmf > {lo} THEN dtv.trimmed ELSE nb.text END AS text\n"
            "  FROM nb JOIN dtv ON nb.doc_id = dtv.doc_id\n"
            f"  WHERE dtv.rmf <= {hi}\n)"
        )
        ld_src = "nbs"
    elif span_gate_frac is not None:
        # v4's duplicate-span drop gate: ds over the blocklist survivors,
        # keep docs whose corpus-duplicated window fraction is bounded
        span_block = (
            f", {_dup_span_ctes('nb', out='ds', k=3, min_docs=2).lstrip()},"
            " nbs AS MATERIALIZED (\n"
            "  SELECT nb.doc_id, nb.source, nb.text FROM nb\n"
            f"  JOIN ds ON nb.doc_id = ds.doc_id AND ds.dup_span_frac <= {span_gate_frac}\n)"
        )
        ld_src = "nbs"
    else:
        span_block = ""
        ld_src = "nb"
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source, {_V3_TEXT_SQL} AS txt0 FROM documents
), nrm AS (
  SELECT doc_id, source, {_normalize_expr_sql("txt0")} AS text FROM base
), bl_u AS (
  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
  FROM nrm
), bl_bad AS (
  SELECT DISTINCT doc_id FROM bl_u
  WHERE domain IN ({", ".join(f"'{d}'" for d in _BLOCKLIST)})
), nb AS MATERIALIZED (
  SELECT doc_id, source, text FROM nrm
  WHERE doc_id NOT IN (SELECT doc_id FROM bl_bad)
){span_block}, {_line_dedup_ctes(ld_src, out="ld").lstrip()}, c4 AS (
  SELECT ld.doc_id, nb.source, ld.text AS txt,
         list_filter(list_transform(string_split(ld.text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         {_WORDS_SQL.replace("trim(text)", "trim(ld.text)")} AS words,
         {scores.replace("trim(text)", "trim(ld.text)").replace("lower(text)", "lower(ld.text)")},
         CAST(len(list_filter({words_lower.replace("trim(lower(text))", "trim(lower(ld.text))")},
              w -> list_contains(['the','a','and','of','to','is','in'], w))) AS DOUBLE) AS sw,
         CAST(length(regexp_replace(ld.text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / CAST(length(ld.text) AS DOUBLE) AS alpha_ratio
  FROM ld JOIN nb ON ld.doc_id = nb.doc_id
), keptc4 AS MATERIALIZED (
  SELECT doc_id, source, {_pii_redact_sql("txt")} AS text
  FROM c4
  WHERE {_C4_KEEP_WHERE_SQL}
    AND ({case_sql}) = 'en'
    AND {quality_sql} >= {quality_min}
), {_curation_tail_sql("keptc4", near_threshold, min_overlap, budget,
                       gopher_min_tokens=gopher_min_tokens)}"""


def _curated_corpus_dag(
    spark: SparkSession,
    sf_dir: str,
    span_gate_frac: float | None = None,
    span_trim_band: tuple[float, float] | None = None,
) -> DataFrame:
    """Shared builder for curated_corpus_v3 (no span gate; benched),
    curated_corpus_v4 (+ duplicate-span DROP gate; benched) and
    curated_corpus_v5 (the registered gate, + the trim/drop/keep span
    gate — Lee et al.'s actual remedy wired into the DAG):

      normalize_controls -> domain_blocklist_filter
      [-> duplicate-span gate: v4 drops on window frac; v5 drops docs
       with token-removal frac rmf > hi, REWRITES docs with
       lo < rmf <= hi to their span-trimmed text (duplicate_span_trim),
       keeps the rest verbatim] -> line_dedup
      -> C4 keep + lang_id=='en' + quality_score>=0.6 -> redact_pii
      -> benchmark decontamination drop -> exact-dedup winners
      -> near-dup cluster winners -> gopher_keep -> mixture_sample
      -> pack_chunks -> per-bucket chunk/row/token stats.

    Scale shape (same discipline as v2): normalization/quality/PII are
    projections; blocklist, span-gate, decontamination-hit,
    dedup-winner, and gopher verdicts travel as ids-only semi/anti
    joins (v5's trim verdict additionally carries the trimmed text for
    the mid-band docs — a one-shot equi-join on doc_id, sized by the
    trim band, not the corpus); line_dedup's winner table shuffles
    (md5(line), id) scalars; the one payload-bearing exchange is the
    8-way pack-bucket shuffle over the final curated corpus."""
    from logpipe.traindata import textstats as ts
    from logpipe.traindata.dedup import (
        duplicate_span_stats,
        duplicate_span_trim,
        line_dedup,
    )

    txt0 = F.concat(
        F.when(F.col("doc_id") % 17 == 0, F.lit("lorem ipsum dolor sit. "))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit('{"k": 1} ')).otherwise(F.lit("")),
        F.expr("replace(text, ' the ', concat('.', chr(10)))"),
        F.lit("\nvisit https://cdn"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".net/x now."),
        F.lit("\nfooter-"), (F.col("doc_id") % 7).cast("string"), F.lit(" end."),
        *_pii_suffix_cols("\ncontact user"),
        F.lit("\t\ta"), F.expr("chr(7)"), F.lit("b ok."),
    )
    base = _docs(spark, sf_dir).select("doc_id", "source", txt0.alias("txt0"))
    nrm = base.select(
        "doc_id", "source", ts.normalize_controls(F.col("txt0")).alias("text")
    )
    nb = ts.domain_blocklist_filter(nrm, list(_BLOCKLIST))
    if span_gate_frac is not None and span_trim_band is not None:
        raise ValueError("span_gate_frac and span_trim_band are exclusive")
    if span_gate_frac is not None or span_trim_band is not None:
        from logpipe.materialize import materialize_mode

        # measured, not theoretical: persist keeps the gate's full
        # logical tree inside InMemoryRelation, and merely BUILDING the
        # cache (CachedRDDBuilder.cachedName stringifies the plan)
        # OOMs the driver heap on this composed DAG even at sf0.001 —
        # fail with the reason instead
        if materialize_mode(spark) == "persist":
            raise ValueError(
                "curated corpus span gates need a checkpoint materialize "
                "mode (local/reliable): persist does not truncate the "
                "logical plan and the composed DAG OOMs the driver "
                "stringifying it (set spark.logpipe.materialize.mode)"
            )
    if span_trim_band is not None:
        from logpipe.materialize import materialize, release

        lo, hi = span_trim_band
        # nb is consumed twice (the span pipeline + the verdict
        # rejoin): materialize it so the normalize/blocklist head runs
        # once, then release it as soon as the gated frame lands
        nb = materialize(nb)
        span_held: list[DataFrame] = []
        trimmed = None
        try:
            trimmed = materialize(
                duplicate_span_trim(
                    nb.select("doc_id", "text"), k=3, min_docs=2,
                    _materialized=span_held,
                )
            )
            # trim's internal per-(window, doc) checkpoint is dead once
            # the trimmed table is materialized
            release(*span_held)
            span_held = []
            tot = (F.col("n_tokens_kept") + F.col("n_tokens_removed")).cast(
                "double"
            )
            # try_divide: ANSI mode throws on double x/0.0; NULL -> 0.0
            # matches the oracle's nullif/coalesce exactly (int-over-int
            # double division is bit-identical across engines)
            rmf = F.coalesce(
                F.try_divide(F.col("n_tokens_removed").cast("double"), tot),
                F.lit(0.0),
            )
            verdicts = trimmed.select(
                "doc_id", F.col("text").alias("_trimmed"), rmf.alias("_rmf")
            )
            # branch non-vacuity IS part of the gate's evidence (round-5
            # verdict task 7): raise, don't assert (survives python -O).
            # One cheap aggregate over the materialized scalar table.
            branch = F.when(F.col("_rmf") > hi, "drop").when(
                F.col("_rmf") > lo, "trim"
            ).otherwise("keep")
            counts = {
                r["branch"]: r["count"]
                for r in verdicts.select(branch.alias("branch"))
                .groupBy("branch")
                .count()
                .collect()
            }
            if not all(counts.get(b) for b in ("keep", "trim", "drop")):
                raise AssertionError(
                    f"v5 span gate vacuous: branch counts {counts}"
                )
            gated = (
                nb.join(verdicts, "doc_id")
                .filter(F.col("_rmf") <= hi)
                .select(
                    "doc_id",
                    "source",
                    F.when(F.col("_rmf") > lo, F.col("_trimmed"))
                    .otherwise(F.col("text"))
                    .alias("text"),
                )
            )
            # the lineage cut every downstream stage compiles against —
            # same plan-size control as v4's gate (ExistingRDD leaf,
            # zero FileScans downstream, pinned in tests)
            gated = materialize(gated)
        except BaseException:
            # error path (round-6 ADVICE): anything raising between the
            # eager materialize calls — the non-vacuity check included —
            # must not pin nb/trimmed blocks for the rest of the session
            # (nor, in reliable mode, leave their checkpoint files
            # behind). release() ignores frames not yet materialized.
            held = [nb, *span_held]
            if trimmed is not None:
                held.append(trimmed)
            release(*held)
            raise
        release(nb, trimmed)
        nb = gated
    if span_gate_frac is not None:
        from logpipe.materialize import materialize, release

        stats_held: list[DataFrame] = []
        try:
            keep_ids = (
                duplicate_span_stats(
                    nb.select("doc_id", "text"), k=3, min_docs=2,
                    _materialized=stats_held,
                )
                .filter(F.col("dup_span_frac") <= span_gate_frac)
                .select("doc_id")
            )
            # materialize: cut the lineage at the gate. Without it the
            # span subtree (which consumes nb twice more) rides INSIDE
            # nb's lineage, and every downstream consumer of nb
            # (line-dedup's three readers, c4, the tail) re-expands it
            # — measured 222s wall / 24s plan-compile at sf0.1 vs v3's
            # 85s/5.6s; with the cut the downstream plan is v3-shaped.
            # Same trade the clustering iterations already make; the
            # cut point is mode-injectable (logpipe.materialize) — a
            # cluster run sets reliable mode and this dataset-sized
            # intermediate lands in the checkpoint dir instead of
            # executor-local blocks.
            nb = materialize(nb.join(keep_ids, "doc_id", "left_semi"))
        except BaseException:
            # error path: stats' eager checkpoint must not stay pinned
            # (nor leak files in reliable mode) if the gate's own
            # materialize fails — same discipline as the v5 trim gate
            release(*stats_held)
            raise
        # stats' internal per-(window, doc) checkpoint is dead once the
        # gated frame lands (same pattern as the v5 trim gate)
        release(*stats_held)
    ld = line_dedup(nb.select("doc_id", "text"))
    ldd = ld.join(nb.select("doc_id", "source"), "doc_id")
    kept = ldd.filter(
        ts.c4_keep(F.col("text"))
        & (ts.lang_id(F.col("text")) == "en")
        & (ts.quality_score(F.col("text")) >= 0.6)
    ).select("doc_id", "source", ts.redact_pii(F.col("text")).alias("text"))
    return _curation_tail(kept, gopher_min_tokens=20)


def curated_corpus_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 TOTAL curation DAG. UNREGISTERED since round 5: v4
    strictly subsumes it (identical stages + the duplicate-span gate),
    the same subsumption rule that folded v2. Kept as a bench entry for
    round-over-round comparability; _curated_corpus_v3_sql() remains
    for local crosschecks."""
    return _curated_corpus_dag(spark, sf_dir)


# v4's span-gate threshold: measured on the sf0.01 construction the
# dup_span_frac population spans 0.24-0.92 with median ~0.43, so 0.45
# drops ~40% of blocklist survivors — both branches non-vacuous, and
# the gate's verdict flows through every downstream stage of the hash-
# matched per-bucket stats.
_V4_SPAN_GATE_FRAC = 0.45


def curated_corpus_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOTAL curation DAG, round-5 edition: v3's eleven stages plus
    the duplicate-span DROP gate. UNREGISTERED since round 6: v5
    strictly subsumes it (same stages, and the binary drop gate becomes
    the trim/drop/keep band with the trim branch actually rewriting
    text) — the same subsumption rule that retired v2 and v3. Kept as a
    bench entry for round-over-round comparability;
    _curated_corpus_v3_sql(span_gate_frac=...) remains for local
    crosschecks."""
    return _curated_corpus_dag(spark, sf_dir, span_gate_frac=_V4_SPAN_GATE_FRAC)


# v5's band over rmf (= fraction of a doc's tokens removed by the
# span-dedup winner rule): measured on the construction at sf0.01 AND
# sf0.001 the rmf population is stable (quantiles 5/25/50/75/90:
# ~0.15/0.35/0.52/0.65/0.75), so keep <=0.45 retains ~40%, trim
# (0.45, 0.70] rewrites ~45%, drop >0.70 removes ~15% — all three
# branches non-vacuous by construction, and enforced in-run by the
# builder's branch-count check.
_V5_SPAN_TRIM_BAND = (0.45, 0.70)


@register("curated_corpus_v5", None)  # SQL attached below (needs builder)
def curated_corpus_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOTAL curation DAG, round-6 edition: every shipped curation
    operator in ONE hash-matched query — v4's twelve stages with the
    span drop gate upgraded to the trim/drop/keep band, so
    duplicate_span_trim's output (Lee et al. 2021's actual remedy) now
    flows through line-dedup, quality, dedup, packing and the final
    per-bucket stats. See _curated_corpus_dag for stages, the 100TB
    shape, and the in-run branch non-vacuity check."""
    return _curated_corpus_dag(spark, sf_dir, span_trim_band=_V5_SPAN_TRIM_BAND)


_REGISTRY["curated_corpus_v5"] = (
    _REGISTRY["curated_corpus_v5"][0],
    _curated_corpus_v3_sql(span_trim_band=_V5_SPAN_TRIM_BAND),
)


@register("streaming_route_counts", _FLAGSHIP_SQL)
def streaming_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-vs-batch equivalence as a DRIVER gate (round-3 verdict
    task #8 — the streaming DAG was pytest-only): materialize the
    transcripts to a scratch dir, run the foreachBatch Structured
    Streaming pipeline to completion (availableNow trigger, multiple
    micro-batches via maxFilesPerTrigger), read every batch's sink
    output back and aggregate per-sink counts — which must equal the
    BATCH flagship oracle exactly (per-sink totals are additive across
    micro-batch commits; the checkpoint dir is fresh per run, so the
    stream always processes the full input)."""
    import shutil
    import tempfile

    from logpipe.streaming.stream_pipeline import start_stream_pipeline

    ev = load_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="logpipe_stream_gate_")
    # the aggregate is 3 rows — materialize it inside the try so the
    # dataset-sized scratch dir (input copy + per-batch sinks +
    # checkpoint) is deleted even when the stream or read-back fails,
    # instead of leaking per grading run
    try:
        # 8 input files + maxFilesPerTrigger=4 -> at least two micro-batches
        events_as_transcripts(ev).repartition(8).write.mode("overwrite").parquet(
            f"{tmp}/in"
        )
        q = start_stream_pipeline(
            spark,
            f"{tmp}/in",
            events_k8s_meta(ev),
            events_tool_meta(ev),
            out_base=f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            max_files_per_trigger=4,
        )
        q.awaitTermination()
        # pacing audit (F1 retain analog): maxFilesPerTrigger=4 over 8
        # input files must yield >= 2 triggers, each reading at most
        # half the input — measured from the query's own progress log,
        # not inferred from config
        # unconditional raises (not bare asserts): this audit is the
        # driver-gated pacing evidence and must survive python -O
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        total_rows = sum(p["numInputRows"] for p in progress)
        if len(progress) < 2:
            raise AssertionError(
                f"pacing: expected >=2 triggers, got {len(progress)}"
            )
        if max(p["numInputRows"] for p in progress) >= total_rows:
            raise AssertionError(
                "pacing: one trigger consumed the whole input despite maxFilesPerTrigger"
            )
        # rate CONFORMANCE (the throttle-retain analog, quantitative):
        # maxFilesPerTrigger=4 bounds every trigger at the sum of its 4
        # largest possible files — check each trigger's numInputRows
        # against the cap computed from the ACTUAL per-file row counts,
        # not inferred from config (round-5 verdict task 8)
        file_counts = sorted(
            r["c"]
            for r in spark.read.parquet(f"{tmp}/in")
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        per_trigger_cap = sum(file_counts[-4:])
        worst = max(p["numInputRows"] for p in progress)
        if worst > per_trigger_cap:
            raise AssertionError(
                f"rate conformance: a trigger read {worst} rows > the "
                f"4-file cap {per_trigger_cap} (file row counts {file_counts})"
            )
        back = spark.read.parquet(f"{tmp}/out")
        rows = (
            back.groupBy("sink")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.length("content")).alias("content_bytes"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "sink string, n_rows bigint, content_bytes bigint"
    )


def _simhash_sql() -> str:
    from logpipe.traindata.dedup import SIMHASH_BITS

    words = _WORDS_SQL.replace("trim(text)", "trim(lower(text))")
    votes = ", ".join(
        f"sum(((h >> {i}) & 1) * 2 - 1) AS v{i}" for i in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({words})) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tok
), votes AS (
  SELECT doc_id, {votes} FROM h GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce({sig}, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
"""


def _simhash_pairs_sql(max_hamming: int = 3, bands: int = 4) -> str:
    from logpipe.traindata.dedup import SIMHASH_BITS

    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    sig_sql = _simhash_sql().strip()
    union = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS chunk FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH sigs AS ({sig_sql}), banded AS ({union}), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


@register("simhash_near_dups", None)
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs; the oracle recomputes the 64-bit
    signatures from scratch in SQL, so this row also gates
    dedup.simhash_table end-to-end (its own registry slot was folded —
    round-3 verdict's 50-row driver window; signature values stay
    pytest-gated in tests/test_traindata.py)."""
    from logpipe.traindata.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=3, bands=4)


_REGISTRY["simhash_near_dups"] = (
    _REGISTRY["simhash_near_dups"][0],
    _simhash_pairs_sql(),
)


# --- similarity search ----------------------------------------------------

_COSINE_TOPK_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id < 8),
c AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         round(list_dot_product(q.qe, n.emb) / (q.qn * n.nrm), 4) AS cosine
  FROM q, n WHERE n.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS "rank"
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM c
) WHERE rn <= 5
"""


@register("embedding_cosine_topk", _COSINE_TOPK_SQL)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logpipe.traindata.ann import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, query_filter=F.col("vec_id") < 8, k=5)


# --- deterministic DuckDB replays of the hyperplane/IVF ANN paths ---------
# The planes and the centroid rule are pure functions — planes are
# md5-derived Box-Muller Gaussians of (seed, plane, coord) (see
# ann._hyperplanes); centroids are the lowest-md5(vec_id) sample — so the
# "approximate" queries are exactly reproducible: the oracle re-runs the
# SAME banding /
# probing pipeline in SQL with the planes inlined as double literals
# (repr() round-trips IEEE doubles bit-exactly through DuckDB's parser).

_EMB_NORM_CTE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e)
"""


def _banded_sql(n_planes: int, n_tables: int, dim: int = 64) -> str:
    """UNION ALL of per-table sign-bit bucket selects over CTE `n`."""
    from logpipe.traindata.ann import _hyperplanes

    def plane_lit(p: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in p) + "]"

    selects = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=7 + 13 * t)
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(emb, {plane_lit(p)}) > 0 THEN {2**i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        selects.append(f"SELECT vec_id, {t} AS tbl, {bucket} AS bucket FROM n")
    return " UNION ALL ".join(selects)


def _cosine_lsh_near_dups_sql(
    threshold: float = 0.4, n_planes: int = 3, n_tables: int = 12
) -> str:
    return f"""
WITH {_EMB_NORM_CTE},
banded AS ({_banded_sql(n_planes, n_tables)}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
v AS (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm), 4) AS cosine
  FROM cand c JOIN n x ON c.id_a = x.vec_id JOIN n y ON c.id_b = y.vec_id
)
SELECT id_a, id_b, cosine FROM v WHERE cosine >= {threshold}
"""


@register("cosine_lsh_near_dups", None)  # SQL attached below (needs builder)
def cosine_lsh_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100TB embedding-dedup path (bucketed). ann.cosine_near_dups
    is its O(n²) exactness oracle — its own registry slot was folded
    (round-3 verdict's 50-row driver window): this row's SQL replays
    the exact all-pairs cosine values over the banded candidates, and
    tests/test_traindata.py::test_cosine_lsh_near_dups_vs_exact pins
    the Spark exact path bit-for-bit."""
    from logpipe.traindata.ann import cosine_lsh_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_lsh_near_dups(emb, threshold=0.4, n_planes=3, n_tables=12)


_REGISTRY["cosine_lsh_near_dups"] = (
    _REGISTRY["cosine_lsh_near_dups"][0],
    _cosine_lsh_near_dups_sql(),
)


def _ann_lsh_topk_sql(k: int = 5, n_planes: int = 4, n_tables: int = 4) -> str:
    qids = ",".join(str(i) for i in range(8))
    return f"""
WITH {_EMB_NORM_CTE},
banded AS ({_banded_sql(n_planes, n_tables)}),
qb AS (SELECT vec_id AS query_id, tbl, bucket FROM banded WHERE vec_id IN ({qids})),
cand AS (
  SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id
  FROM qb q JOIN banded b
    ON b.tbl = q.tbl AND b.bucket = q.bucket AND b.vec_id <> q.query_id
),
c AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_dot_product(qq.emb, nn.emb) / (qq.nrm * nn.nrm), 4) AS cosine
  FROM cand JOIN n qq ON qq.vec_id = cand.query_id
            JOIN n nn ON nn.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS "rank"
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn FROM c)
WHERE rn <= {k}
"""


@register("ann_lsh_topk", None)  # SQL attached below (needs builder)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logpipe.traindata.ann import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb, query_ids=list(range(8)), k=5)


_REGISTRY["ann_lsh_topk"] = (_REGISTRY["ann_lsh_topk"][0], _ann_lsh_topk_sql())


@register("ann_ivf_topk", None)  # SQL attached below (needs builder)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logpipe.traindata.ann import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, query_ids=list(range(8)), k=5, n_centroids=16, n_probe=4)


def _ann_ivf_topk_sql(k: int = 5, n_centroids: int = 16, n_probe: int = 4) -> str:
    qids = ",".join(str(i) for i in range(8))
    return f"""
WITH {_EMB_NORM_CTE},
cents AS (
  SELECT cell, emb AS cemb, nrm AS cnrm FROM (
    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell,
           emb, nrm
    FROM n
  ) WHERE cell <= {n_centroids}
),
assigned AS (
  SELECT vec_id, emb, nrm, cell FROM (
    SELECT n.vec_id, n.emb, n.nrm, c.cell,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.emb, c.cemb) / (n.nrm * c.cnrm) DESC,
                                       c.cell) AS rn
    FROM n, cents c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id IN ({qids})),
probes AS (
  SELECT query_id, qe, qn, cell FROM (
    SELECT q.query_id, q.qe, q.qn, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qe, c.cemb) / (q.qn * c.cnrm) DESC,
                                       c.cell) AS rn
    FROM q, cents c
  ) WHERE rn <= {n_probe}
),
c AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(p.qe, a.emb) / (p.qn * a.nrm), 4) AS cosine
  FROM probes p JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS "rank"
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn FROM c)
WHERE rn <= {k}
"""


_REGISTRY["ann_ivf_topk"] = (_REGISTRY["ann_ivf_topk"][0], _ann_ivf_topk_sql())
