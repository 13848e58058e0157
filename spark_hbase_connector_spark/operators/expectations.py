"""Declarative data-quality expectations — the validation gate a pipeline
runs before publishing a table (the Great-Expectations/dbt-test shape,
engine-native).

Rule catalogue: ``not_null``, ``in_range``, ``matches`` (regex),
``accepted_values`` — ROW-level rules, all compiled into ONE aggregation
pass (conditional sums; the table is scanned once no matter how many
rules); ``unique`` — one partial-aggregated groupBy per rule (duplicate
keys found map-side first); ``foreign_key`` — one LEFT ANTI join per rule
(join strategy left to AQE by default so fact-sized references shuffle
instead of OOMing; pass ``broadcast=True`` for known-small dimensions).

At 100 TB: row-level rules are free (they ride the single scan); each
unique/FK rule is one keyed shuffle you opted into — the report says
which rule a violation count came from, so an operator can run row-level
rules continuously and the shuffle rules on a schedule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str
    col: str | None = None
    predicate: Column | None = None
    keys: list[str] = field(default_factory=list)
    ref: DataFrame | None = None
    ref_col: str | None = None
    broadcast: bool = False


def not_null(col: str) -> Rule:
    return Rule(name=f"not_null({col})", kind="row", col=col,
                predicate=F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(name=f"in_range({col},{lo},{hi})", kind="row", col=col,
                predicate=F.col(col).between(lo, hi))


def matches(col: str, regex: str) -> Rule:
    return Rule(name=f"matches({col})", kind="row", col=col,
                predicate=F.col(col).rlike(regex))


def accepted_values(col: str, values: list) -> Rule:
    return Rule(name=f"accepted_values({col})", kind="row", col=col,
                predicate=F.col(col).isin(values))


def unique(*cols: str) -> Rule:
    return Rule(name=f"unique({','.join(cols)})", kind="unique",
                keys=list(cols))


def foreign_key(
    col: str, ref: DataFrame, ref_col: str, broadcast: bool = False
) -> Rule:
    """``broadcast=True`` force-broadcasts the distinct reference keys —
    opt-in for known-small dimensions only. Default lets AQE /
    autoBroadcastJoinThreshold pick the join strategy, so a fact-sized
    reference table (the 100 TB case) falls back to a shuffled anti join
    instead of OOMing the driver."""
    return Rule(name=f"foreign_key({col})", kind="fk", col=col, ref=ref,
                ref_col=ref_col, broadcast=broadcast)


def expect(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule -> (rule, n_violations, passed), ordered by
    rule name. Row-level rules share one aggregation pass over ``df``."""
    if not rules:
        raise ValueError(
            "expect: no rules given — an empty gate would vacuously pass"
        )
    spark = df.sparkSession
    pieces: list[DataFrame] = []

    row_rules = [r for r in rules if r.kind == "row"]
    if row_rules:
        # violation = predicate NOT TRUE (so a NULL input violates a range/
        # regex expectation rather than silently passing through SQL
        # three-valued logic; compose not_null explicitly to report the
        # null-ness itself)
        aggs = [
            F.sum(F.when(r.predicate, 0).otherwise(1))
            .cast("bigint")
            .alias(str(i))
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{r.name.replace(chr(39), '')}', `{i}`"
            for i, r in enumerate(row_rules)
        )
        pieces.append(
            wide.selectExpr(
                f"stack({len(row_rules)}, {stack}) as (rule, n_violations)"
            )
        )

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.keys)
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            pieces.append(dup)
        elif r.kind == "fk":
            ref_keys = r.ref.select(F.col(r.ref_col).alias(r.col)).distinct()
            if r.broadcast:
                ref_keys = F.broadcast(ref_keys)
            orphans = (
                df.join(
                    ref_keys,
                    r.col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            pieces.append(orphans)

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("rule")
