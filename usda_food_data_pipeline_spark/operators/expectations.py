"""Data-quality expectations: declarative constraint checks as one DataFrame.

A 100 TB ingest needs a validation gate before data reaches training
(the reference enforces this implicitly through its hand-tuned dtype
map and threshold null-outs — `/root/reference/utils/data_processing
.py`; here the checks are first-class and composable, in the spirit of
Great Expectations / Deequ but as plain Spark plans).

Design for scale: every row-level check compiles to a conditional
count inside ONE aggregation over the table — a single scan + a single
1-row-per-partition partial agg, no matter how many checks. Only
set-level checks (uniqueness, referential integrity) add work: each is
one key-shuffled aggregate. Results are tiny (one row per check) and
union together driver-free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    predicate: Column  # True = row passes


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNotNull())


def in_set(col: str, values: list) -> Check:
    return Check(f"in_set:{col}", F.col(col).isin(values))


def in_range(col: str, lo, hi) -> Check:
    return Check(f"in_range:{col}", (F.col(col) >= lo) & (F.col(col) <= hi))


def matches(col: str, regex: str) -> Check:
    return Check(f"matches:{col}", F.col(col).rlike(regex))


def _result_row(name: Column | str, n_rows: Column, n_failed: Column) -> list[Column]:
    nm = F.lit(name) if isinstance(name, str) else name
    return [
        nm.alias("check_name"),
        n_rows.cast("bigint").alias("n_rows"),
        n_failed.cast("bigint").alias("n_failed"),
        (n_failed == 0).alias("ok"),
    ]


def run_row_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All row-level checks in one scan: each check is a conditional
    count in a single global aggregate; the 1×(2k+1) result row is then
    unpivoted to one row per check (driver-free — the explode runs on
    the single aggregate row)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(checks):
        # null predicate = failed (SQL three-valued logic must not hide rows)
        failed = F.when(c.predicate.isNull() | (~c.predicate), 1).otherwise(0)
        aggs.append(F.sum(failed).alias(f"_f{i}"))
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"), F.col(f"_f{i}").alias("n_failed")
            )
            for i, c in enumerate(checks)
        ]
    )
    ex = one.select(F.col("_n"), F.explode(pairs).alias("p"))
    return ex.select(
        *_result_row(F.col("p.check_name"), F.col("_n"), F.col("p.n_failed"))
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """n_failed = rows carrying a duplicated key (all members of any
    key group with count > 1). One shuffle on the key."""
    name = "unique:" + ",".join(cols)
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_key.agg(
        F.sum("_c").alias("_n"),
        F.coalesce(F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)).alias("_f"),
    )
    return agg.select(*_result_row(name, F.col("_n"), F.col("_f")))


def check_ref_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """n_failed = NON-NULL child keys with no parent. One left join with
    a hit marker + one aggregate — the child is scanned ONCE (an
    anti-join + separate total count would scan it twice). The parent
    side reduces to distinct keys first, so the join's build side is
    keys-only; AQE broadcasts it when small.

    NULL-FK policy (explicit, SQL-standard FK semantics): a NULL child
    key is NOT a referential failure — it is unverifiable, and belongs
    to a ``not_null`` row check if the column is mandatory. The DuckDB
    oracle twin mirrors this as a LEFT JOIN counting non-null misses
    (a NOT IN subquery would silently degenerate to zero matches if the
    parent ever contained a NULL key)."""
    name = f"ref:{child_key}->{parent_key}"
    parents = (
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    marked = child.select(child_key).join(parents, child_key, "left")
    agg = marked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(
            F.sum(F.when(F.col("_hit").isNull() & F.col(child_key).isNotNull(), 1)),
            F.lit(0),
        ).alias("_f"),
    )
    return agg.select(*_result_row(name, F.col("_n"), F.col("_f")))


def expectation_suite(
    df: DataFrame,
    row_checks: list[Check],
    unique_keys: list[list[str]] | None = None,
    refs: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Union of all check results: one row per check,
    ``(check_name, n_rows, n_failed, ok)``."""
    out = run_row_checks(df, row_checks)
    for cols in unique_keys or []:
        out = out.unionByName(check_unique(df, cols))
    for child_key, parent, parent_key in refs or []:
        out = out.unionByName(check_ref_integrity(df, child_key, parent, parent_key))
    return out
