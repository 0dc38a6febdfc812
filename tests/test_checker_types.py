"""The local correctness checker must fail on Arrow-level type divergence.

Round-1 post-mortem: events_agg/funnel_conversion passed locally but failed
the driver's type-sensitive value hash because DuckDB returns integer
``sum()`` as HUGEINT (decimal128 over Arrow) while Spark returns int64, and
the old checker canonicalized both through Python ``int``. These tests pin
the hardened checker (ADVICE r1): an uncast ``sum(BIGINT)`` or ``count_if``
oracle must produce ``type_mismatch`` locally, and the cast version must
pass.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import compare  # noqa: E402


def _spark_sum(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    from pyspark.sql import functions as F

    return df.agg(F.sum("v").alias("s"))


def test_uncast_int_sum_fails_type_check(spark):
    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT * FROM (VALUES (1),(2),(3)) v(v)")
    res = compare("uncast", _spark_sum(spark), "SELECT sum(v) AS s FROM t", con)
    assert res["status"] == "type_mismatch"
    assert res["type_diffs"]["s"][0] == "int"
    assert res["type_diffs"]["s"][1].startswith("decimal")


def test_cast_int_sum_passes(spark):
    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT * FROM (VALUES (1),(2),(3)) v(v)")
    res = compare(
        "cast", _spark_sum(spark), "SELECT CAST(sum(v) AS BIGINT) AS s FROM t", con
    )
    assert res["status"] == "match"


def test_count_if_hugeint_fails_type_check(spark):
    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT * FROM (VALUES (1),(2),(3)) v(v)")
    from pyspark.sql import functions as F

    sdf = (
        spark.createDataFrame([(1,), (2,), (3,)], "v long")
        .agg(F.count_if(F.col("v") > 1).alias("n"))
    )
    res = compare("cif", sdf, "SELECT count_if(v > 1) AS n FROM t", con)
    assert res["status"] == "type_mismatch"
