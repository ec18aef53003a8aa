"""Record reshaping — modify / nest / lift (SURVEY.md §2.3 F6-F11).

fluent-bit mutates a dynamic msgpack map; here the record is a fixed
StructType row and the dynamic prefix-keyed part (__tags_*, labels)
becomes two MapType columns built at the end (F11 'nest'). The modify
family maps to pure projections:

  add (only if absent)  -> coalesce(col, lit(v))        (F6)
  set (overwrite)       -> lit(v)                       (F6)
  rename                -> alias in one select          (F7)
  copy (if absent)      -> coalesce(dst, src)           (F8)
  hard_copy             -> src                          (F8)
  remove/remove_wildcard-> drop / map_filter            (F9)
  nest lift             -> select('k8s.*') / map_concat (F10)
  nest nest             -> map construction             (F11)

All of this stays inside one whole-stage-codegen span — Catalyst
collapses the chained projections into a single physical Project.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logpipe.schema import DICE_COMPAT_KEYS


def modify_add(df: DataFrame, key: str, value: Column) -> DataFrame:
    """F6 `modify add`: set only when absent/null."""
    if key in df.columns:
        return df.withColumn(key, F.coalesce(F.col(key), value))
    return df.withColumn(key, value)


def modify_set(df: DataFrame, key: str, value: Column) -> DataFrame:
    """F6 `modify set`: overwrite unconditionally."""
    return df.withColumn(key, value)


def modify_copy(df: DataFrame, src: str, dst: str) -> DataFrame:
    """F8 `modify copy`: copy src->dst only if dst absent."""
    if dst in df.columns:
        return df.withColumn(dst, F.coalesce(F.col(dst), F.col(src)))
    return df.withColumn(dst, F.col(src))


def modify_hard_copy(df: DataFrame, src: str, dst: str) -> DataFrame:
    """F8 `modify hard_copy`: overwrite dst with src."""
    return df.withColumn(dst, F.col(src))


def nonempty(c: Column) -> Column:
    """fluent-bit 'key present' test: non-null AND non-empty string."""
    return c.isNotNull() & (c != F.lit(""))


def build_map(pairs: dict[str, Column]) -> Column:
    """F11 `nest`: collect columns into a map<string,string>, skipping
    absent values (fluent-bit emits no key when a field is missing).

    Shape (round 11): map_concat of per-key conditional singleton maps
    — every subexpression (CASE WHEN + create_map + map_concat) is
    codegen-capable, where the previous map_filter lambda evaluated
    interpreted per row (higher-order functions are CodegenFallback;
    measured 1.21s -> 0.85s for a 23-key map over 100k rows at sf0.1,
    entry order and values byte-identical — concat keeps argument
    order, exactly like the filter kept construction order). Keys come
    from a dict, so they are unique and the EXCEPTION dedup policy
    can never fire.
    """
    empty = F.expr("map()").cast("map<string,string>")
    if not pairs:
        return empty
    parts = []
    for k, v in pairs.items():
        vs = v.cast("string")
        parts.append(
            F.when(
                vs.isNotNull() & (vs != F.lit("")), F.create_map(F.lit(k), vs)
            ).otherwise(empty)
        )
    return F.map_concat(*parts)


def lift_prefixed(m: Column, prefix: str) -> Column:
    """F10 `nest lift` with add_prefix: rewrite map keys with a prefix
    (e.g. kubernetes -> k8s_*, conf/ds/fluent-bit.conf:69-75)."""
    return F.transform_keys(m, lambda k, _: F.concat(F.lit(prefix), k))


def nest_wildcard(m: Column, prefix: str) -> Column:
    """F11 `nest` with remove_prefix: select keys by prefix into a new
    map, stripping the prefix (conf/ds/fluent-bit.conf:163-178)."""
    picked = F.map_filter(m, lambda k, _: k.startswith(prefix))
    return F.transform_keys(picked, lambda k, _: F.substring(k, len(prefix) + 1, 1 << 20))


def remove_wildcard(m: Column, prefix: str) -> Column:
    """F9 `remove_wildcard` over a map column
    (e.g. __pri_*, conf/ds/fluent-bit.conf:202-205)."""
    return F.map_filter(m, lambda k, _: ~k.startswith(prefix))


def dice_compat_pairs(cols: dict[str, Column]) -> dict[str, Column]:
    """F8: the 11 dice_* prefix compat copies
    (conf/ds/fluent-bit.conf:148-161)."""
    out: dict[str, Column] = {}
    for key in DICE_COMPAT_KEYS:
        if key in cols:
            out[f"dice_{key}"] = cols[key]
    return out
