"""End-to-end tests of the user-facing facade: pipeline CSV→CSV,
index build, retrieval — the three things a reference user does."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest

from usda_food_data_pipeline_spark import api
from usda_food_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="api_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def landing_dir(spark, workdir):
    """Stage USDA-shaped CSVs (same fixtures as the golden pipeline
    test, written as single-file CSVs like the reference's landing)."""
    import csv
    import os

    d = f"{workdir}/landing"
    os.makedirs(d)
    tables = {
        "branded_food": (
            ["fdc_id", "gtin_upc", "ingredients", "serving_size", "serving_size_unit"],
            [
                [10, "u1", "  sugar, salt ", "12.5", "g"],
                [11, "u1", "sugar, salt", "12.5", "g"],
                [20, "u2", "water", "n/a", "ml"],
                [30, "u3", "vitamins", "5", "IU"],
            ],
        ),
        "food": (
            ["fdc_id", "description"],
            [[11, " Choc Bar "], [20, "Water"], [30, "Vites"], [99, "NotBranded"]],
        ),
        "nutrient": (
            ["id", "name", "unit_name"],
            [[1, "Protein", "G"], [2, "Energy", "KCAL"]],
        ),
        "food_nutrient": (
            ["fdc_id", "nutrient_id", "amount"],
            [[11, 1, 10.0], [11, 1, 20.0], [11, 2, 5000.0], [20, 2, 100.0]],
        ),
    }
    for name, (header, rows) in tables.items():
        with open(f"{d}/{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
    return d


@pytest.mark.slow
def test_run_pipeline_end_to_end(spark, landing_dir, workdir):
    out = f"{workdir}/wide_csv"
    api.run_pipeline(spark, landing_dir, out, fmt="csv")
    back = spark.read.option("header", True).csv(out)
    rows = back.collect()
    assert len(rows) == 1  # only the deduped u1 survivor (golden test logic)
    r = rows[0].asDict()
    assert r["FOOD_NAME"] == "CHOC BAR"
    assert r["PROTEIN (G)"] == "15.0"
    raw = open(glob.glob(out + "/part-*.csv")[0]).readline()
    assert raw.startswith('"')  # quoted output like the reference sink


def test_index_and_retrieve(spark, sf_dir, workdir):
    docs = load_table(spark, sf_dir, "documents")
    index_path = f"{workdir}/index"
    api.build_index(spark, docs, "text", "doc_id", index_path, dim=32)
    meta = docs.select("doc_id", "lang", "source")
    hits = api.retrieve(
        spark, index_path, "key agg row scan slow fast table", metadata_df=meta,
        k=5, dim=32,
    )
    assert len(hits) == 5
    assert all({"doc_id", "score", "lang"} <= set(h) for h in hits)
    assert hits == sorted(hits, key=lambda h: (-h["score"], h["doc_id"]))


def test_retrieve_empty_query_returns_nothing(spark, sf_dir, workdir):
    """A whitespace-only query embeds to the zero vector; NaN cosine
    scores must not surface as arbitrary 'top' matches."""
    import os

    from usda_food_data_pipeline_spark.sources.tables import load_table

    index_path = f"{workdir}/index_empty_q"
    if not os.path.exists(index_path):
        docs = load_table(spark, sf_dir, "documents").limit(20)
        api.build_index(spark, docs, "text", "doc_id", index_path, dim=16)
    assert api.retrieve(spark, index_path, "   ", k=5, dim=16) == []


def test_read_usda_csv_schema_by_name(spark, workdir):
    """Explicit schema is bound by header NAME: extra columns and a
    different column order must not shift types (the failure mode of
    positional StructType over real USDA exports)."""
    import os

    from usda_food_data_pipeline_spark.sources.tables import read_usda_csv

    d = f"{workdir}/landing2"
    os.makedirs(d, exist_ok=True)
    with open(f"{d}/food_nutrient.csv", "w") as f:
        f.write("amount,extra_col,fdc_id,nutrient_id\n1.5,x,11,1\n")
    df = read_usda_csv(spark, f"{d}/food_nutrient.csv", "food_nutrient")
    assert dict(df.dtypes) == {
        "amount": "double", "extra_col": "string",
        "fdc_id": "bigint", "nutrient_id": "bigint",
    }
    r = df.collect()[0]
    assert r["amount"] == 1.5 and r["fdc_id"] == 11


def test_read_usda_csv_glob_with_divergent_headers(spark, workdir):
    """r03 verdict item 7: with explicit schema + header=True, Spark
    binds CSV columns POSITIONALLY per file, so a glob whose files
    disagree on column order silently transposes values. read_usda_csv
    must detect the divergence and bind per-file."""
    import os

    from usda_food_data_pipeline_spark.sources.tables import read_usda_csv

    d = f"{workdir}/landing_glob"
    os.makedirs(d, exist_ok=True)
    with open(f"{d}/part1.csv", "w") as f:
        f.write("fdc_id,nutrient_id,amount\n11,1,1.5\n")
    with open(f"{d}/part2.csv", "w") as f:
        f.write("amount,fdc_id,nutrient_id\n2.5,22,2\n")
    df = read_usda_csv(spark, f"{d}/*.csv", "food_nutrient")
    rows = {r["fdc_id"]: (r["nutrient_id"], r["amount"]) for r in df.collect()}
    assert rows == {11: (1, 1.5), 22: (2, 2.5)}
    assert dict(df.dtypes)["amount"] == "double"


def test_cli_query_subcommand(spark, workdir):
    from usda_food_data_pipeline_spark.__main__ import main

    out = f"{workdir}/vocab_out"
    rc = main(
        ["query", "vocab_topk", "--sf-dir", "/root/testdata/sf0.001", "--output", out]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() > 0 and set(got.columns) == {"rank", "token", "n"}
    assert main(["query", "not_a_query"]) == 2


@pytest.mark.slow
def test_retrieve_hybrid_fuses_both_sides(spark, sf_dir, workdir):
    import os

    from usda_food_data_pipeline_spark.sources.tables import load_table

    index_path = f"{workdir}/index_hybrid"
    docs = load_table(spark, sf_dir, "documents").limit(50)
    if not os.path.exists(index_path):
        api.build_index(spark, docs, "text", "doc_id", index_path, dim=16)
    out = api.retrieve_hybrid(
        spark, index_path, docs, "spark join dup", dim=16, k=5, candidates=10
    )
    assert 0 < len(out) <= 5
    # fused order is by descending rrf; every hit carries its text and
    # at least one side's rank
    rrfs = [r["rrf"] for r in out]
    assert rrfs == sorted(rrfs, reverse=True)
    for r in out:
        assert r["text"] is not None
        assert r["rank_lexical"] is not None or r["rank_vector"] is not None
    # empty query -> no candidates, not k arbitrary rows
    assert api.retrieve_hybrid(spark, index_path, docs, "   ", dim=16) == []


def test_read_usda_csv_header_probe_cached(spark, workdir):
    """ADVICE r04: multi-file loads must not re-pay O(files) header
    probes on every call — results are cached per resolved file list.
    Proof of use: poisoning the cached probe result with divergent
    headers flips the second call onto the per-file union path."""
    import os

    from usda_food_data_pipeline_spark.sources.tables import (
        _HEADER_PROBE_CACHE,
        read_usda_csv,
    )

    d = f"{workdir}/landing_cache"
    os.makedirs(d, exist_ok=True)
    for i in (1, 2):
        with open(f"{d}/part{i}.csv", "w") as f:
            f.write(f"fdc_id,nutrient_id,amount\n{i}1,{i},{i}.5\n")
    _HEADER_PROBE_CACHE.clear()
    df1 = read_usda_csv(spark, f"{d}/*.csv", "food_nutrient")
    assert df1.count() == 2
    assert len(_HEADER_PROBE_CACHE) == 1  # one probe set, cached
    key = next(iter(_HEADER_PROBE_CACHE))  # key = resolved file tuple
    sig = _HEADER_PROBE_CACHE[key][0]
    # poison: pretend the files disagree (same stat signature, so no
    # re-probe); the divergent-path switch proves the cache was used
    files = list(key)
    _HEADER_PROBE_CACHE[key] = (
        sig,
        {
            files[0]: ("fdc_id", "nutrient_id", "amount"),
            files[1]: ("amount", "fdc_id", "nutrient_id"),
        },
    )
    df2 = read_usda_csv(spark, f"{d}/*.csv", "food_nutrient")
    # per-file path binds part2 by the poisoned header order
    rows = {r["fdc_id"]: r["amount"] for r in df2.collect()}
    assert rows != {11: 1.5, 21: 2.5}
    _HEADER_PROBE_CACHE.clear()


def test_read_usda_csv_header_cache_invalidates_on_rewrite(spark, workdir):
    """r05 ADVICE: the probe cache is keyed by (path, mtime, size) — a
    staged CSV rewritten IN PLACE with a different column order must be
    re-probed, not served stale headers that would transpose values."""
    import os
    import time

    from usda_food_data_pipeline_spark.sources.tables import (
        _HEADER_PROBE_CACHE,
        read_usda_csv,
    )

    d = f"{workdir}/landing_rewrite"
    os.makedirs(d, exist_ok=True)
    with open(f"{d}/p1.csv", "w") as f:
        f.write("fdc_id,nutrient_id,amount\n11,1,1.5\n")
    with open(f"{d}/p2.csv", "w") as f:
        f.write("fdc_id,nutrient_id,amount\n21,2,2.5\n")
    _HEADER_PROBE_CACHE.clear()
    df1 = read_usda_csv(spark, f"{d}/*.csv", "food_nutrient")
    assert {r["fdc_id"] for r in df1.collect()} == {11, 21}

    time.sleep(0.05)  # ensure a distinct mtime_ns
    with open(f"{d}/p2.csv", "w") as f:  # rewritten: columns reordered
        f.write("amount,fdc_id,nutrient_id\n2.5,21,2\n")
    df2 = read_usda_csv(spark, f"{d}/*.csv", "food_nutrient")
    rows = {r["fdc_id"]: r["amount"] for r in df2.collect()}
    assert rows == {11: 1.5, 21: 2.5}  # re-probed, no transposition
    # ADVICE r06: the re-probe must REPLACE the superseded entry (cache
    # indexed by path tuple), not accumulate one entry per re-stage
    assert len(_HEADER_PROBE_CACHE) == 1
    _HEADER_PROBE_CACHE.clear()
