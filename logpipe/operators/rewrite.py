"""Config-driven rewrite_tag rule engine (SURVEY.md §2.3 F12, generic).

The reference's router is DECLARED, not coded: each fluent-bit
`[FILTER] name rewrite_tag` block carries `Rule $key regex new_tag keep`
lines (conf/ds/fluent-bit.conf:181-193), and adding a route means adding
a conf line. `operators.route` hardcodes the two shipped rules; this
module is the general engine — parse the same conf syntax, compile the
rule cascade to ONE columnar expression, and statically unroll
fluent-bit's re-emission loop.

Reference semantics reproduced (fluent-bit rewrite_tag docs +
plugins/filter_rewrite_tag):

- a record flows through the rewrite_tag FILTER STAGES in conf order;
  a stage applies iff the record is still alive and its CURRENT tag
  matches the stage's Match glob;
- within a stage, rules are tested in order and the FIRST whose
  accessor value matches the regex fires: a COPY of the record is
  emitted under new_tag, and the original survives iff keep=true;
- emitted copies are RE-INJECTED at the head of the pipeline under
  their new tag (the in_emitter), where they traverse the stages
  again — matched by the new tag this time.

Spark-first shape: the WHOLE cascade — including fluent-bit's
re-injection loop — compiles to ONE pure array<string> expression of
final tags per input row, then one `explode`. This is possible because
new_tags are literals (no $0 captures): an emitted copy's entire
subsequent trajectory through the stages depends only on (its literal
tag, the row's fields), so the re-injection recursion expands at PLAN
time instead of requiring union-of-rounds branches. One scan, one
generator, no Union, no UDF, no shuffle — identical plan shape to the
hardcoded operators.route (a union formulation would re-read the input
and re-run the upstream joins once per re-injection round; at 100TB
that's k extra full passes).

The literal-tag reachability graph is still walked driver-side first
(_reentry_rounds) to REJECT cyclic configs loudly — a tag cycle would
loop forever in fluent-bit too; here it's a plan-time error.
(Capture-group tags would force a data-dependent fixpoint loop with a
count() per round; unsupported, loudly.)
"""

from __future__ import annotations

import re
import shlex
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One `Rule $key regex new_tag keep` line."""

    key: str       # raw accessor: $field or $map['k'] (nesting allowed)
    regex: str     # match regex, search semantics (rlike / Onigmo parity)
    new_tag: str   # literal tag for the emitted copy
    keep: bool     # original survives?


@dataclass(frozen=True)
class Stage:
    """One [FILTER] name rewrite_tag block."""

    match: str            # fluent-bit Match glob, e.g. kube.*
    rules: tuple[Rule, ...]


# subkeys may arrive quoted ($m['k']) or, post-shlex, unquoted ($m[k])
_ACCESSOR_RE = re.compile(r"^\$([A-Za-z_][\w\-]*)((?:\['?[^'\[\]]+'?\])*)$")
_SUBKEY_RE = re.compile(r"\['?([^'\[\]]+?)'?\]")


def parse_accessor(key: str) -> Column:
    """$field -> col; $field['k']['k2'] -> nested map/struct access."""
    m = _ACCESSOR_RE.match(key)
    if not m:
        raise ValueError(f"rewrite_tag: unsupported record accessor {key!r}")
    col = F.col(m.group(1))
    for sub in _SUBKEY_RE.findall(m.group(2)):
        col = col[sub]
    return col


def glob_to_regex(glob: str) -> str:
    """fluent-bit Match glob (* only) -> anchored Java regex."""
    return "^" + ".*".join(re.escape(part) for part in glob.split("*")) + "$"


def parse_rewrite_tag_conf(text: str) -> list[Stage]:
    """Parse the rewrite_tag [FILTER] blocks out of a fluent-bit conf.

    Recognizes exactly the reference's syntax (conf/ds/fluent-bit.conf):
    `[FILTER]` section headers, `name rewrite_tag`, `match <glob>`,
    `Rule $key regex new_tag true|false` (shlex-split, so a quoted regex
    may contain spaces). Non-rewrite_tag blocks are skipped.
    """
    stages: list[Stage] = []
    cur: dict | None = None

    def flush():
        nonlocal cur
        if cur and cur.get("is_rewrite") and cur["rules"]:
            stages.append(Stage(match=cur["match"], rules=tuple(cur["rules"])))
        cur = None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if line.startswith("["):
            flush()
            if line.lower() == "[filter]":
                cur = {"is_rewrite": False, "match": "*", "rules": []}
            continue
        if cur is None:
            continue
        parts = shlex.split(line)
        k = parts[0].lower()
        if k == "name":
            cur["is_rewrite"] = len(parts) > 1 and parts[1] == "rewrite_tag"
        elif k == "match" and len(parts) > 1:
            cur["match"] = parts[1]
        elif k == "rule":
            if len(parts) != 5:
                raise ValueError(f"rewrite_tag: malformed Rule line {line!r}")
            _, key, regex, new_tag, keep = parts
            if "$" in new_tag:
                raise ValueError(
                    f"rewrite_tag: capture-group tags unsupported ({new_tag!r}); "
                    "literal tags only (keeps the re-emission unroll static)"
                )
            cur["rules"].append(
                Rule(key=key, regex=regex, new_tag=new_tag,
                     keep=keep.lower() == "true")
            )
    flush()
    return stages


def _reentry_rounds(stages: list[Stage], max_rounds: int = 8) -> int:
    """How many re-injection rounds literal-tag reachability needs.

    Walks new_tag -> matching-stage edges; raises on depth > max_rounds
    (a tag cycle would loop forever in fluent-bit too — emitter loops
    are a misconfiguration there; here they're a plan-time error).
    """
    def matches_some_stage(tag: str) -> bool:
        return any(re.match(glob_to_regex(s.match), tag) for s in stages)

    frontier = {
        r.new_tag for s in stages for r in s.rules if matches_some_stage(r.new_tag)
    }
    rounds = 1
    while frontier:
        rounds += 1
        if rounds > max_rounds:
            raise ValueError(
                "rewrite_tag: tag re-emission graph does not terminate "
                f"within {max_rounds} rounds (cycle in new_tag -> Match edges?)"
            )
        nxt = set()
        for s in stages:
            glob_re = glob_to_regex(s.match)
            if any(re.match(glob_re, t) for t in frontier):
                for r in s.rules:
                    if matches_some_stage(r.new_tag):
                        nxt.add(r.new_tag)
        if nxt == frontier:  # reached a fixpoint that keeps re-matching
            raise ValueError(
                "rewrite_tag: cyclic re-emission between tags "
                f"{sorted(frontier)} — fluent-bit would loop; refusing"
            )
        frontier = nxt
    return rounds


def _empty_tags() -> Column:
    return F.array().cast("array<string>")


def _final_tags_expr(
    stages: list[Stage],
    tag: Column | None,
    tag_literal: str | None,
    depth: int,
    conds: dict[tuple[int, int], Column],
    matches: dict[int, Column],
) -> Column:
    """Array of FINAL tags a record ends up under, cascade + re-injection
    fully expanded. ``tag_literal`` set = we're expanding the trajectory
    of an emitted copy whose tag is known at plan time (stage Match
    tests collapse to plan-time booleans); otherwise ``tag`` is the
    input tag column. ``conds``/``matches`` are PRE-MATERIALIZED boolean
    columns (one per rule regex / stage glob) — the expression here is
    pure boolean algebra over them, so referencing a rule's condition
    several times (fire, first-match mask, consumed) never duplicates
    the underlying accessor expression (which in the dynamic map plan
    is an enormous tree; inlining it per reference blew the driver heap
    at plan time)."""
    if depth < 0:  # _reentry_rounds bounds recursion; this is a backstop
        raise RuntimeError("rewrite_tag: re-emission recursion exceeded bound")
    alive: Column = F.lit(True)
    parts: list[Column] = []
    for si, stage in enumerate(stages):
        glob_re = glob_to_regex(stage.match)
        if tag_literal is not None:
            if not re.match(glob_re, tag_literal):
                continue
            applicable = alive
        else:
            applicable = alive & matches[si]
        # first-match-wins: rule i fires iff applicable and rules <i missed
        prev_miss: Column = F.lit(True)
        consumed: Column | None = None
        for ri, r in enumerate(stage.rules):
            cond = conds[(si, ri)]
            fire = applicable & prev_miss & cond
            parts.append(
                F.when(
                    fire, _literal_finals(stages, r.new_tag, depth, conds, matches)
                ).otherwise(_empty_tags())
            )
            if not r.keep:
                consumed = fire if consumed is None else (consumed | fire)
            prev_miss = prev_miss & ~cond
        if consumed is not None:
            alive = alive & ~consumed
    survivor_tag = F.lit(tag_literal) if tag_literal is not None else tag
    survivor = F.when(alive, F.array(survivor_tag)).otherwise(_empty_tags())
    return F.concat(*parts, survivor) if parts else survivor


def _literal_finals(
    stages: list[Stage],
    new_tag: str,
    depth: int,
    conds: dict[tuple[int, int], Column],
    matches: dict[int, Column],
) -> Column:
    """Final tags of an emitted copy with literal tag ``new_tag``: if no
    stage's Match glob covers it, it is terminal; otherwise expand its
    pass through the cascade (one recursion level per re-injection)."""
    if not any(re.match(glob_to_regex(s.match), new_tag) for s in stages):
        return F.array(F.lit(new_tag))
    return _final_tags_expr(stages, None, new_tag, depth - 1, conds, matches)


def apply_rewrite_tags(
    df: DataFrame, stages: list[Stage], tag_col: str = "tag"
) -> DataFrame:
    """Run the full rewrite_tag cascade; returns one row per FINAL record
    (surviving originals keep their tag; emitted copies carry new_tag),
    all other columns passed through verbatim. Two projections + one
    generator — the input is scanned once regardless of how many
    re-injection rounds the config implies.

    The first projection materializes every rule condition and stage
    Match test ONCE as a boolean column; the finals expression is
    boolean algebra over those. This matters beyond tidiness: Catalyst's
    CollapseProject declines to inline non-cheap expressions referenced
    more than once, so upstream plans whose accessor columns are huge
    expression trees (the dynamic map-record pipeline) are evaluated
    once per row instead of once per reference — without the split, the
    inlined tree grew multiplicatively and planning OOMed the driver.
    """
    rounds = _reentry_rounds(stages)  # also rejects cyclic configs

    cond_cols: dict[tuple[int, int], str] = {}
    match_cols: dict[int, str] = {}
    staged = df
    for si, stage in enumerate(stages):
        mc = f"_rw_m{si}"
        match_cols[si] = mc
        staged = staged.withColumn(
            mc, F.col(tag_col).rlike(glob_to_regex(stage.match))
        )
        for ri, r in enumerate(stage.rules):
            cc = f"_rw_c{si}_{ri}"
            cond_cols[(si, ri)] = cc
            staged = staged.withColumn(
                cc,
                F.coalesce(
                    parse_accessor(r.key).cast("string").rlike(r.regex), F.lit(False)
                ),
            )

    finals = _final_tags_expr(
        stages,
        F.col(tag_col),
        None,
        rounds,
        {k: F.col(v) for k, v in cond_cols.items()},
        {k: F.col(v) for k, v in match_cols.items()},
    )
    # withColumn + explode + drop, NOT select(explode, *others): the
    # select form asked the optimizer to rebuild every passthrough
    # column inside the Generate's child projection, which on plans
    # whose columns are deep expression trees (the dynamic map-record
    # pipeline) exploded optimization memory; this shape is the same
    # one operators.route uses and plans in constant space
    helper = list(cond_cols.values()) + list(match_cols.values())
    return (
        staged.withColumn("_rw_final_tag", F.explode(finals))
        .drop(tag_col, *helper)
        .withColumnRenamed("_rw_final_tag", tag_col)
        .select(*df.columns)  # restore original column order
    )


# --- the reference's shipped router, declared as conf -----------------------

#: Semantics of conf/ds/fluent-bit.conf:181-193 in the engine's input
#: column names (labels map is built by then; define_tag is the
#: pre-nest __pri_terminus_define_tag).
REFERENCE_ROUTER_CONF = """
[FILTER]
    name rewrite_tag
    match kube.*
    Rule $labels['monitor_log_collector'] .+ erda.log.export true
    Emitter_Name erda_log_export

[FILTER]
    name rewrite_tag
    match kube.*
    Rule $define_tag .+ erda.log.job false
    Emitter_Name erda_log_job
"""

#: Output-side Match dispatch (conf/ds/fluent-bit.conf:207-243): final
#: tag glob -> sink name. First glob wins, like fluent-bit match order.
REFERENCE_SINK_DISPATCH: list[tuple[str, str]] = [
    ("erda.log.export", "export"),
    ("erda.log.job", "job"),
    ("kube.*", "container"),
]


def dispatch_sinks(
    df: DataFrame,
    dispatch: list[tuple[str, str]] = REFERENCE_SINK_DISPATCH,
    tag_col: str = "tag",
) -> DataFrame:
    """Map final tags to sink names (F13 Match) — first glob wins."""
    sink: Column | None = None
    for glob, name in dispatch:
        cond = F.col(tag_col).rlike(glob_to_regex(glob))
        sink = F.when(cond, name) if sink is None else sink.when(cond, name)
    return df.withColumn("sink", sink)


def route_with_rules(
    df: DataFrame,
    conf_text: str = REFERENCE_ROUTER_CONF,
    dispatch: list[tuple[str, str]] = REFERENCE_SINK_DISPATCH,
    initial_tag: Column | None = None,
) -> DataFrame:
    """Drop-in alternative to operators.route.route(): tag the rows,
    run the declared cascade, dispatch tags to sinks, drop the tag.

    The initial tag mirrors the tail input's path-derived
    `kube.<pod>...` tag (conf/ds/docker-runtime.conf:4 Tag kube.*);
    any kube.* value routes identically, so the default uses conv_id
    when present.
    """
    if initial_tag is None:
        base = F.col("conv_id") if "conv_id" in df.columns else F.lit("var.log")
        # null-safe: a NULL conv_id must not produce a NULL tag (NULL
        # poisons every rlike in the cascade and the row would vanish
        # where route() still routes it)
        initial_tag = F.concat(
            F.lit("kube."), F.coalesce(base.cast("string"), F.lit(""))
        )
    tagged = df.withColumn("tag", initial_tag)
    routed = apply_rewrite_tags(tagged, parse_rewrite_tag_conf(conf_text))
    return dispatch_sinks(routed, dispatch).drop("tag")
