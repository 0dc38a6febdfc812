"""CDC merge / upsert: apply a change stream onto a base table.

The reference pipeline rebuilds its serving dataset from scratch on every
run (`/root/reference/main.py` re-downloads + re-uploads the full CSV set).
At 100 TB a full rebuild is not viable: the scale-correct primitive is an
incremental MERGE — latest-change-wins upsert/delete applied to the base
snapshot, the same contract as Delta Lake's ``MERGE INTO`` / Hudi's
copy-on-write upsert, expressed here with plain DataFrame ops so it works
on any parquet-backed table.

Plan shape (scales to 1000 executors):

1. one shuffle of the *changes* on the merge key to pick the latest change
   per key (window ``row_number`` — changes are a small fraction of base);
2. one shuffle of the base on the same key for the full-outer join
   (co-partitioned by AQE; with a bucketed base table the base-side
   exchange disappears entirely — see ``sources/sinks.py`` bucketing);
3. a projection picks, per key, the change row (op='U'), drops the row
   (op='D'), or passes the base row through untouched.

No collect, no broadcast of the base, shuffle volume = |base| + |changes|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Reduce a change stream to the single latest change per key.

    ``seq_cols`` is the total order within a key (e.g. commit timestamp
    then a monotonic id as tiebreak) — with a genuinely total order the
    result is deterministic under any partitioning.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE INTO semantics: upsert/delete ``changes`` into ``base``.

    Both inputs must share the non-key value columns. Each key's outcome:

    - no change row            -> base row unchanged
    - latest change op != 'D'  -> change's values (update or brand-new key)
    - latest change op == 'D'  -> row removed

    Returns the merged snapshot with ``base``'s column order.
    """
    value_cols = [c for c in base.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_cols, op_col)
    ch = latest.select(
        *keys,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_ch_{c}") for c in value_cols],
    )
    joined = base.join(ch, on=keys, how="full_outer")

    def pick(c: str) -> Column:
        return (
            F.when(F.col("_op").isNotNull(), F.col(f"_ch_{c}"))
            .otherwise(F.col(c))
            .alias(c)
        )

    return (
        joined.filter(F.col("_op").isNull() | (F.col("_op") != delete_op))
        .select(*keys, *[pick(c) for c in value_cols])
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Reconcile two table versions: one row per differing key with
    status ``added`` (key only in new), ``removed`` (only in old) or
    ``changed`` (present in both, compared columns differ). Identical
    rows produce no output — on a 100 TB table the result is
    delta-sized, and this is the operator that COMPUTES the change
    stream :func:`merge_apply` consumes (CDC capture's batch twin,
    and the verification step after a backfill/migration).

    Shape: each side reduces to (keys, row fingerprint) in its scan
    projection — the fingerprint replaces W comparison columns with one
    32-char value, so the full-outer join shuffles two slim key+hash
    tables regardless of row width, co-partitioned on the join key.

    Semantics:

    - keys join NULL-SAFELY (``<=>``): a row whose key is NULL in both
      versions compares as the same row (changed/unchanged), not as an
      unrelated ``added`` + ``removed`` pair;
    - the fingerprint is INJECTIVE over the stringified column tuple:
      each column md5-hashes individually (fixed 32 hex chars, NULL →
      the single non-hex char ``N``) before concatenation, so no value
      containing a would-be separator can make two different rows
      collide, and no literal string collides with the NULL sentinel.

    Caller contract: compare_cols must be exactly-typed columns
    (strings/ints/dates) — float columns should be quantized or
    string-formatted first, or cross-engine hash parity breaks.
    """
    def fingerprint(df: DataFrame) -> Column:
        tagged = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N"))
            for c in compare_cols
        ]
        return F.md5(F.concat(*tagged))

    o = old.select(*key_cols, fingerprint(old).alias("_fp_old")).alias("o")
    n = new.select(*key_cols, fingerprint(new).alias("_fp_new")).alias("n")
    cond = None
    for k in key_cols:
        clause = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = clause if cond is None else (cond & clause)
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols
    ]
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*out_keys, "status")
    )


def table_diff_cdc(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "_seq",
) -> DataFrame:
    """CDC CAPTURE: the change stream that transforms ``old`` into
    ``new`` — the closure of :func:`table_diff` (statuses) with
    :func:`merge_apply` (application):

    ``merge_apply(old, table_diff_cdc(old, new, keys), keys, [seq_col])``
    reproduces ``new`` exactly (pinned by a randomized roundtrip
    property test). Added/changed keys emit op='U' carrying NEW's
    values; removed keys emit op='D' with NULL values.

    Shape: the slim key+fingerprint diff runs first (delta-sized
    output), then ONE delta-keyed join re-attaches new's values for the
    upserts — wide rows are read once and only for keys that actually
    changed; at 100 TB the stream is delta-sized end to end.

    Precondition: non-NULL keys (merge semantics — ``merge_apply``'s
    key join, like SQL MERGE, never matches NULL keys). ``table_diff``
    itself handles NULL keys; this CDC wrapper documents them out.
    """
    value_cols = [c for c in new.columns if c not in key_cols]
    diff = table_diff(old, new, key_cols, value_cols)
    ups = (
        new.join(
            diff.filter(F.col("status") != "removed").select(*key_cols), key_cols
        )
        .select(
            *key_cols,
            F.lit("U").alias(op_col),
            *value_cols,
            F.lit(1).alias(seq_col),
        )
    )
    dels = diff.filter(F.col("status") == "removed").select(
        *key_cols,
        F.lit("D").alias(op_col),
        *[F.lit(None).cast(dict(new.dtypes)[c]).alias(c) for c in value_cols],
        F.lit(1).alias(seq_col),
    )
    return ups.unionByName(dels)


def table_checksum(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    seed: int = 47,
) -> DataFrame:
    """Order-independent content checksum per group: ``group_cols…,
    n_rows, checksum`` where checksum is the SUM of per-row 48-bit
    portable hashes (decimal-exact, commutative).

    This is the anti-entropy primitive for verifying replicas /
    migrations at 100 TB: two copies of a table compare by shipping
    |groups| rows each — no sort, no co-located join, no full-table
    shuffle; the only exchange carries (group, partial_sum) and the
    aggregation combines map-side. Summing hashes (vs hashing a sorted
    concatenation) is what makes it partitioning- and order-independent.

    Rows encode with :func:`table_diff`'s injective per-column-md5
    scheme (NULL-safe, separator-proof). Same caller contract: cast
    float/timestamp columns onto an exactly-stringifiable grid first.
    """
    from .dedup import md5_int

    tagged = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N"))
        for c in value_cols
    ]
    h = md5_int(F.concat(*tagged), seed=seed, nibbles=12)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).alias("checksum"),
    )
