"""Column profiling: per-column cardinality/null/extrema summary of a
table in one unpivot + two-level aggregation — the data-quality
snapshot step a pipeline runs before/after ingest (the engine analog
of the reference's manual dtype/NA inspection pass around its CSV
cleaning, utils/data_processing_utils.py).

Scale shape: values are unpivoted to (column, value) rows, partially
aggregated map-side to distinct (column, value) counts — so the single
value-keyed exchange carries one row per distinct value per column per
task, not the table — then reduced to one summary row per column. The
per-column final step handles |columns| keys: trivially skew-free.
Exact distinct counts without an Expand (no multi-countDistinct
blowup); swap stage 1 for approx_count_distinct at petabyte scale if
exactness isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Profile the given columns: each maps a name to a STRING-typed
    expression (cast numerics to decimal first so the string form is
    engine-portable; raw doubles stringify differently across engines).

    Returns one row per column: (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max over the string form,
    nulls excluded.
    """
    stacked = df.select(
        [c.cast("string").alias(n) for n, c in cols.items()]
    ).unpivot([], list(cols), "col_name", "value")
    per_value = stacked.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return per_value.groupBy("col_name").agg(
        F.sum("_cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("_cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count("value").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
