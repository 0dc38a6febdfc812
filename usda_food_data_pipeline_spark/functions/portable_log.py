"""Single-sourced transcendental tables: evaluate ``ln`` with the
oracle's own libm instead of the JVM's.

Why this exists (r06 verdict, What's-wrong #1): queries that round an
engine-computed natural log onto a decimal grid and then rely on exact
decimal sums are only as portable as the *libm* that computed the log.
Spark's JVM ``Math.log`` and DuckDB's ``std::log`` differ by an ULP on
some inputs; when the true value sits within that ULP of a rounding
boundary the grid value flips and the whole document-level decimal sum
hash-mismatches — on *some* DuckDB builds and not others, which is how
``lm_doc_scores``/``dsir_select`` passed a local gate and failed the
driver's on identical code.

The fix is to stop comparing two libms.  Every log table in this engine
is bounded (distinct count-value pairs, 4096 DSIR buckets, classes,
query terms — never corpus-sized), so we:

1. collect the bounded integer inputs to the driver,
2. evaluate the *exact oracle expression* over them with the in-process
   ``duckdb`` module — the same build the correctness oracle runs, so
   the values agree with the oracle BY CONSTRUCTION on any machine, and
3. inject the results into the Spark plan as a broadcast literal table.

The Spark plan then contains no transcendental at all (enforced by
tests/test_rotation_gate.py); everything downstream of the lookup is
integer/decimal/IEEE-basic arithmetic, which both engines define
bit-exactly.

At 100 TB the shape is unchanged: the collected tables are bounded by
count-value cardinality (heavy-tailed counts ⇒ ≪ vocab), not corpus
size, and the scoring join is the same broadcast it always was.  The
"compute the model head driver-side, broadcast it" seam is exactly
where a production pipeline loads externally-trained weights.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


# a literal table is driver memory AND a broadcast: enforce the
# "bounded count tables only" contract instead of assuming it — vocab-
# or bucket-bounded inputs sit orders of magnitude below this, and a
# caller hitting it is collecting something corpus-sized by mistake
MAX_LITERAL_ROWS = 2_000_000


def duckdb_eval_table(
    spark: SparkSession,
    rows: Iterable[tuple],
    in_schema: Sequence[tuple[str, str]],
    exprs: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Evaluate DuckDB scalar expressions over collected rows; return a
    Spark literal DataFrame of inputs + results.

    - ``rows``: driver-collected tuples (must be bounded — count-value
      pairs, buckets, classes; never corpus rows).
    - ``in_schema``: [(col_name, duckdb/spark type), ...] for the inputs
      (types must be exact-portable: BIGINT / VARCHAR / DOUBLE-of-int).
    - ``exprs``: [(out_name, duckdb_expr_sql, spark_type), ...]; each
      expr references input column names and must textually mirror the
      oracle SQL's expression so the doubles fed to ``ln`` are
      bit-identical.

    DECIMAL results come back as :class:`decimal.Decimal`, DOUBLE as
    Python floats — both round-trip bit-exactly into Spark literals.
    """
    import duckdb
    import pandas as pd

    rows = list(rows)
    if len(rows) > MAX_LITERAL_ROWS:
        raise ValueError(
            f"duckdb_eval_table received {len(rows)} rows (> {MAX_LITERAL_ROWS}): "
            "log tables must be bounded (count-value pairs / buckets / "
            "classes) — a corpus-sized input belongs in the engine, not "
            "a driver literal"
        )
    in_cols = [c for c, _ in in_schema]
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in in_schema] + [f"{n} {t}" for n, _, t in exprs]
    )
    if not rows:
        return spark.createDataFrame([], schema=out_schema)

    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(rows, columns=in_cols)
        # pin input types so pandas ints arrive as BIGINT (not the
        # platform default) and the expression sees the oracle's types
        casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in in_schema)
        con.register("_in", pdf)
        sel = ", ".join(f"{e} AS {n}" for n, e, _ in exprs)
        out = con.execute(
            f"SELECT {', '.join(in_cols)}, {sel} FROM (SELECT {casts} FROM _in)"
        ).fetchall()
    finally:
        con.close()
    return spark.createDataFrame(out, schema=out_schema)


def duckdb_ln_9dp(x_sql: str) -> str:
    """The shared oracle spelling of a 9-dp-grid log value."""
    return f"CAST(round(ln({x_sql}), 9) AS DECIMAL(18,9))"
