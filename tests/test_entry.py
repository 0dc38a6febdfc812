"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as e
import pytest


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


@pytest.mark.slow
def test_each_query_runs_at_smoke_sf(spark, sf_dir):
    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_bench_compact_counts_raised_queries():
    """r04 verdict task 6: a query that raised must show up in n_errors
    and by name in errors, even though its timing is just -1."""
    import json

    from bench import build_compact

    timings = {"ok_a": 1.5, "ok_b": 0.3, "boom": -1.0}
    compact = build_compact(timings, ["boom"], sf=0.1, repeats=2)
    assert compact["n_errors"] == 1
    assert compact["errors"] == ["boom"]
    assert compact["value"] == 1.8  # errored run excluded from the sum
    assert compact["n_queries"] == 3
    # stays a single parseable line within the driver's tail window
    assert len(json.dumps(compact)) < 2000

    clean = build_compact({"ok_a": 1.0}, [], sf=0.1, repeats=2)
    assert clean["n_errors"] == 0
    assert "errors" not in clean

    # char budget still trims the per-query map, never the error list
    many = {f"q{i:03d}": float(i) for i in range(300)}
    trimmed = build_compact(many, ["q001"], sf=0.1, repeats=1, max_chars=500)
    assert len(json.dumps(trimmed)) < 700
    assert trimmed["errors"] == ["q001"]


def test_bench_compact_ab_payload_budgeted():
    """r08 verdict task 4: the AB_NOTES payload pushed the headline out
    of the driver's 2000-char stdout tail (BENCH_r08 parsed=null). The
    compact line must carry only {query: ratio} pairs and the WHOLE line
    must respect the budget no matter how large AB_NOTES grows."""
    import json

    from bench import ab_ratios, build_compact

    ab = {
        "protocol": "prose " * 200,
        "change_summary": "prose " * 200,
        f"q{0:02d}": {"change": "x" * 500, "sf0.1": {"old_sec": 2.0, "new_sec": 1.0, "ratio": 0.5}},
    }
    for i in range(1, 40):
        ab[f"q{i:02d}"] = {
            "change": "y" * 300,
            "sf0.1": {"old_sec": 1.0, "new_sec": 1.1, "ratio": 1.1},
        }
    assert ab_ratios(ab)["q00"] == 0.5
    assert "protocol" not in ab_ratios(ab)

    timings = {f"q{i:03d}": float(i) for i in range(150)}
    compact = build_compact(timings, [], sf=0.1, repeats=2, ab=ab)
    line = json.dumps(compact)
    assert len(line) <= 1500, len(line)
    # the headline metric survives and the ab entries are bare ratios
    assert compact["metric"] == "sum_query_sec"
    assert all(isinstance(v, float) for v in compact.get("same_session_ab", {}).values())
    assert compact["queries"], "query fill should still have room"
