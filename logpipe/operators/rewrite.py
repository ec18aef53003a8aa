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

Spark-first shape: the per-round cascade is a fold over stages
producing two pure columns — `_alive` (bool) and `_emitted`
(array<string> of new tags) — then `filter(_alive)` keeps originals and
`explode(_emitted)` materializes the copies. No UDF, no shuffle: one
projection + one generator per round, exactly like operators.route.

Re-injection is unrolled STATICALLY: new_tags here are literals (no $0
captures), so the tag->stage reachability graph is known at plan time.
We walk it driver-side, emit one round per graph level, and raise on a
cycle — the plan stays a fixed DAG with no data-dependent driver loop,
which is what you want at 100TB (capture-group tags would force a
fixpoint loop with a count() per round; unsupported, loudly).
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


def _cascade(stages: list[Stage], tag: Column) -> tuple[Column, Column]:
    """Fold the stage list into (_alive, _emitted) pure columns."""
    alive: Column = F.lit(True)
    emitted: Column = F.array().cast("array<string>")
    for stage in stages:
        applicable = alive & tag.rlike(glob_to_regex(stage.match))
        # first-match-wins across the stage's rules
        fired: Column | None = None
        for r in stage.rules:
            cond = parse_accessor(r.key).cast("string").rlike(r.regex)
            branch = F.struct(
                F.lit(r.new_tag).alias("tag"), F.lit(r.keep).alias("keep")
            )
            fired = (
                F.when(cond, branch) if fired is None else fired.when(cond, branch)
            )
        hit = applicable & fired.isNotNull()
        emitted = F.when(
            hit, F.concat(emitted, F.array(fired["tag"]))
        ).otherwise(emitted)
        alive = alive & ~(hit & ~fired["keep"])
    return alive, emitted


def apply_rewrite_tags(
    df: DataFrame, stages: list[Stage], tag_col: str = "tag"
) -> DataFrame:
    """Run the full rewrite_tag cascade; returns one row per FINAL record
    (surviving originals keep their tag; emitted copies carry new_tag),
    all other columns passed through verbatim.
    """
    rounds = _reentry_rounds(stages)
    others = [c for c in df.columns if c != tag_col]

    def one_round(d: DataFrame) -> tuple[DataFrame, DataFrame]:
        alive, emitted = _cascade(stages, F.col(tag_col))
        d2 = d.withColumn("_alive", alive).withColumn("_emitted", emitted)
        survivors = d2.filter(F.col("_alive")).drop("_alive", "_emitted")
        copies = (
            d2.filter(F.size("_emitted") > 0)
            .select(F.explode("_emitted").alias(tag_col), *others)
            .select(*d.columns)  # restore original column order
        )
        return survivors, copies

    # static unroll: round k processes only records whose tag can still
    # match a stage (copies from round k-1 plus, in round 1, the input)
    final_parts: list[DataFrame] = []
    current = df
    for i in range(rounds):
        survivors, copies = one_round(current)
        final_parts.append(survivors)
        if i == rounds - 1:
            # reachability proved no copy from the last round re-matches
            final_parts.append(copies)
        current = copies
    out = final_parts[0]
    for p in final_parts[1:]:
        out = out.unionByName(p)
    return out


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
        initial_tag = F.concat(F.lit("kube."), base.cast("string"))
    tagged = df.withColumn("tag", initial_tag)
    routed = apply_rewrite_tags(tagged, parse_rewrite_tag_conf(conf_text))
    return dispatch_sinks(routed, dispatch).drop("tag")
