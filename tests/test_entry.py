"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0
    # stable, named schema
    assert df.columns == [
        "customer_key", "customer_name", "order_key", "order_total",
        "avg_price_a", "avg_price_n", "avg_price_r",
    ]


def test_queries_oracle_keys_align(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query; queries without oracle are the
    # documented rows-only set
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    # documented rows-only set: engine-specific sketches or iterative
    # driver decisions with no SQL twin (bpe_train's per-step argmax)
    assert rows_only <= {"approx_distinct", "approx_quantiles", "bpe_train"} | {
        n for n in qs if n.startswith("stream_")
    }


def test_each_query_runs_at_smoke_sf(spark, sf_dir):
    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
