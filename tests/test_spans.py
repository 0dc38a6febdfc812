"""Duplicated-substring span semantics on a hand-built corpus."""

from usda_food_data_pipeline_spark.functions.spans import dup_substring_spans


def _doc(*parts):
    return " ".join(parts)


def test_spans_merge_overlap_and_adjacency(spark):
    # shared run of 10 tokens between docs 1 and 2 -> three k=3 windows
    # in doc 1 merge into ONE maximal span; doc 3 shares nothing.
    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, f"x1 {shared} y1"),
            (2, f"pad pad2 {shared} tail"),
            (3, "q r s t u v w"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["span_start"]): r
        for r in dup_substring_spans(docs, k=3).collect()
    }
    # doc 1: tokens x1 a b c ... j y1; shared 3-grams start at pos 2..9
    # (1-based), merged span covers tokens 2..11
    r1 = out[(1, 2)]
    assert (r1["span_end"], r1["span_len"], r1["n_grams"]) == (11, 10, 8)
    # doc 2: shared run starts at pos 3, covers 3..12
    r2 = out[(2, 3)]
    assert (r2["span_end"], r2["span_len"], r2["n_grams"]) == (12, 10, 8)
    assert not any(d == 3 for d, _ in out)


def test_spans_split_on_gap_and_intra_doc_repeat(spark):
    # the SAME doc repeating a 3-gram counts df=1 (distinct docs) -> not
    # duplicated; two far-apart shared windows stay separate spans.
    docs = spark.createDataFrame(
        [
            (1, "a b c z1 z2 z3 z4 z5 d e f"),
            (2, "a b c k1 k2 k3 k4 k5 d e f"),
            (3, "m n o a b c m n o"),  # intra-doc repeat of "m n o"
        ],
        ["doc_id", "text"],
    )
    rows = dup_substring_spans(docs, k=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert sorted(by_doc[1]) == [(1, 3), (9, 11)]
    assert sorted(by_doc[2]) == [(1, 3), (9, 11)]
    # doc 3 only shares "a b c" (pos 4..6); its self-repeated "m n o"
    # has df_docs=1 and must NOT mark a span
    assert sorted(by_doc[3]) == [(4, 6)]
