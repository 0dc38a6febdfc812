"""Randomized brute-force parity for the global line dedup and the
shared chunk builder.

Seeded random corpora over a tiny vocabulary (maximal chunk-collision
pressure) are re-deduped by a direct Python implementation; the Spark
operator must agree exactly on every (doc, clean_text, n_chunks,
n_removed) row.  chunk_array is additionally pinned at k=1 and k=3
(tail shorter than k) since the registry only exercises k=2.
"""

import pytest
import random

from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.functions.textstats import (
    chunk_array,
    dedup_lines_global,
)


def _chunks(toks, k):
    return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]


def _brute_line_dedup(corpus, k):
    first_owner = {}
    for doc_id, toks in corpus:
        for pos, c in enumerate(_chunks(toks, k)):
            first_owner.setdefault(c, (doc_id, pos))
    out = {}
    for doc_id, toks in corpus:
        cs = _chunks(toks, k)
        kept = [
            c for pos, c in enumerate(cs) if first_owner[c] == (doc_id, pos)
        ]
        out[doc_id] = (" ".join(kept), len(cs), len(cs) - len(kept))
    return out


def _random_corpus(rnd, n_docs, vocab=("a", "b", "c")):
    return [
        (i, [rnd.choice(vocab) for _ in range(rnd.randint(0, 12))])
        for i in range(n_docs)
    ]


@pytest.mark.slow
def test_line_dedup_global_matches_bruteforce(spark):
    rnd = random.Random(42)
    for trial in range(3):
        for k in (1, 2, 3):
            corpus = _random_corpus(rnd, n_docs=20)
            docs = spark.createDataFrame(
                [(i, " ".join(t)) for i, t in corpus], ["doc_id", "text"]
            )
            got = {
                r["doc_id"]: (r["clean_text"], r["n_chunks"], r["n_removed"])
                for r in dedup_lines_global(
                    docs, "doc_id", "text", chunk_tokens=k
                ).collect()
            }
            assert got == _brute_line_dedup(corpus, k), (trial, k)


def test_chunk_array_tail_and_degenerate_k(spark):
    rows = [
        (1, "a b c d e"),   # k=3 -> ["a b c", "d e"]
        (2, "a"),           # shorter than any k
        (3, ""),            # empty
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    from usda_food_data_pipeline_spark.operators.dedup import tokenize

    for k, expect in [
        (1, {1: ["a", "b", "c", "d", "e"], 2: ["a"], 3: []}),
        (2, {1: ["a b", "c d", "e"], 2: ["a"], 3: []}),
        (3, {1: ["a b c", "d e"], 2: ["a"], 3: []}),
        (5, {1: ["a b c d e"], 2: ["a"], 3: []}),
        (7, {1: ["a b c d e"], 2: ["a"], 3: []}),
    ]:
        got = {
            r["doc_id"]: r["cs"]
            for r in docs.select(
                "doc_id", chunk_array(tokenize(F.col("text")), k).alias("cs")
            ).collect()
        }
        assert got == expect, k
