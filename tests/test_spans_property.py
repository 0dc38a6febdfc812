"""Randomized brute-force parity for dup_substring_spans.

Seeded random corpora over a tiny vocabulary (maximal k-gram collision
pressure) are re-spanned by a direct Python implementation; the Spark
operator must agree exactly on every (doc, start, end, n_grams) tuple.
"""

import random

from usda_food_data_pipeline_spark.functions.spans import dup_substring_spans


def _brute_spans(corpus, k):
    occ = {}
    for doc_id, toks in corpus:
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), set()).add(doc_id)
    dup = {g for g, docs in occ.items() if len(docs) >= 2}
    out = []
    for doc_id, toks in corpus:
        starts = [
            p + 1
            for p in range(len(toks) - k + 1)
            if tuple(toks[p : p + k]) in dup
        ]
        spans, cur = [], None
        for p in starts:
            if cur and p <= cur[2] + k:  # overlaps or touches the span
                cur[2] = p
                cur[3] += 1
            else:
                if cur:
                    spans.append(cur)
                cur = [doc_id, p, p, 1]  # [doc, first, last, n]
        if cur:
            spans.append(cur)
        for d, first, last, n in spans:
            out.append((d, first, last + k - 1, last + k - 1 - first + 1, n))
    return sorted(out)


def test_randomized_spans_match_brute_force(spark):
    vocab = ["a", "b", "c", "d"]
    for seed in (7, 21, 99):
        rng = random.Random(seed)
        corpus = [
            (i, [rng.choice(vocab) for _ in range(rng.randint(0, 30))])
            for i in range(25)
        ]
        docs = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in corpus], ["doc_id", "text"]
        )
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_len"], r["n_grams"])
            for r in dup_substring_spans(docs, k=3).collect()
        )
        assert got == _brute_spans(corpus, 3), f"seed {seed}"
