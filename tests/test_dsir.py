"""DSIR hashed-bigram importance resampling — unit semantics.

The oracle gate (`test_oracle_gate.py::dsir_select`) pins cross-engine
exactness at fixture scale; these tests pin the *math* on a corpus small
enough to recompute by hand in Python, including the exact nano grid.
"""

import math

import pytest
from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.functions.dsir import dsir_select


def _nanos(x: int) -> int:
    """Per-term snap of ln(x) onto the 1e-9 grid — recomputed with
    math.log here (accuracy ~1e-13 vs the portable chain; these tiny
    hand corpora sit nowhere near a grid tie, asserted below)."""
    v = math.log(x)
    n = math.floor(v * 1e9 + 0.5)
    assert abs((v * 1e9 + 0.5) - round(v * 1e9 + 0.5)) > 1e-3, "tie-adjacent input"
    return n


def _py_dsir(raw_docs, tgt_docs, n_buckets, bucket_of):
    """Reference recomputation, mirroring the per-term BIGINT snapping:
    lr[b] = ((n(ct+1) + n(nq+B)) - n(cq+1)) - n(nt+B) in integer nanos,
    per-doc sum of cnt·lr shipped as exact BIGINT nanos."""
    cq, ct, dc = {}, {}, {}
    for doc_id, toks in raw_docs:
        for a, b in zip(toks, toks[1:]):
            bk = bucket_of(f"{a} {b}")
            cq[bk] = cq.get(bk, 0) + 1
            dc.setdefault(doc_id, {})[bk] = dc.setdefault(doc_id, {}).get(bk, 0) + 1
    for toks in tgt_docs:
        for a, b in zip(toks, toks[1:]):
            bk = bucket_of(f"{a} {b}")
            ct[bk] = ct.get(bk, 0) + 1
    nq, nt = sum(cq.values()), sum(ct.values())
    lr = {
        bk: ((_nanos(ct.get(bk, 0) + 1) + _nanos(nq + n_buckets))
             - _nanos(cq[bk] + 1)) - _nanos(nt + n_buckets)
        for bk in cq
    }
    return {
        doc_id: sum(cnt * lr[bk] for bk, cnt in buckets.items())
        for doc_id, buckets in dc.items()
    }


def test_dsir_exact_nanos_and_ranking(spark):
    # Target slice is all about "spark sql"; raw doc 1 repeats the target
    # phrase, doc 2 is disjoint vocabulary -> doc 1 must outrank doc 2
    # with the exact hand-computed integer nano sums.
    rows = [
        (1, "spark sql spark sql spark", "raw"),
        (2, "cat dog cat dog cat", "raw"),
        (3, "spark sql runs spark sql", "tgt"),
        (4, "spark sql", "tgt"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = dsir_select(docs, target_source="tgt", n_buckets=64, top_n=10)
    got = {r["doc_id"]: r for r in out.collect()}

    from usda_food_data_pipeline_spark.operators.dedup import md5_int
    from usda_food_data_pipeline_spark.functions.dsir import HASH_SEED

    probe = spark.createDataFrame(
        [(g,) for g in ["spark sql", "sql spark", "cat dog", "dog cat", "sql runs", "runs spark"]],
        ["g"],
    ).select("g", (md5_int(F.col("g"), seed=HASH_SEED, nibbles=8) % 64).alias("b"))
    bmap = {r["g"]: r["b"] for r in probe.collect()}

    exp = _py_dsir(
        [(1, "spark sql spark sql spark".split()), (2, "cat dog cat dog cat".split())],
        ["spark sql runs spark sql".split(), "spark sql".split()],
        64,
        bmap.__getitem__,
    )
    assert set(got) == {1, 2}
    for d in (1, 2):
        assert got[d]["n_bigrams"] == 4
        assert got[d]["sum_lw_nanos"] == exp[d]
    assert exp[1] > exp[2]
    assert got[1]["rank"] == 1 and got[2]["rank"] == 2


def test_dsir_skips_target_and_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "raw"),
            (2, "solo", "raw"),  # <=1 token: no bigrams, unranked
            (3, "a b", "tgt"),
        ],
        ["doc_id", "text", "source"],
    )
    out = dsir_select(docs, target_source="tgt", n_buckets=16, top_n=10)
    ids = [r["doc_id"] for r in out.collect()]
    assert ids == [1]
