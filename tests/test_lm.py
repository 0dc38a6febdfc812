"""Stupid-backoff LM scoring: branch coverage with hand-computed scores."""

import math

from usda_food_data_pipeline_spark.functions.lm import lm_score_stupid_backoff


def _grid(x: float) -> int:
    """Per-term snap onto the 1e-9 grid in integer nanos — the exact
    form the engine sums and ships (sum_lp_nanos)."""
    return math.floor(x * 1e9 + 0.5)


def test_lm_backoff_branches_hand_computed(spark):
    # train corpus (src0): "a b a b" and "a c" ->
    #   uni: a=3, b=2, c=1, N=6
    #   bigrams: (a,b)=2, (b,a)=1, (a,c)=1
    docs = spark.createDataFrame(
        [
            (1, "a b a b", "src0"),
            (2, "a c", "src0"),
            # scored doc: bigrams (a,b) seen; (b,z) unseen w/ unseen cur;
            # (z,c) unseen w/ seen cur
            (3, "a b z c", "srcX"),
            # zero-bigram doc
            (4, "solo", "srcX"),
            (5, "", "srcX"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: r
        for r in lm_score_stupid_backoff(docs, train_source="src0").collect()
    }
    assert set(out) == {3, 4, 5}

    exp = (
        _grid(math.log(2 / 3))  # S(b|a) = c(a,b)/c(a)
        + _grid(math.log((0.4 * 1) / 6))  # z unseen -> ALPHA*1/N
        + _grid(math.log((0.4 * 1) / 6))  # (z,c) unseen bigram -> ALPHA*c(c)/N
    )
    assert out[3]["n_bigrams"] == 3
    assert out[3]["sum_lp_nanos"] == exp
    # mean lp ~= -1.94 >= -8 -> keep
    assert out[3]["keep"] is True

    for d in (4, 5):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["sum_lp_nanos"] == 0
        assert out[d]["keep"] is True


def test_lm_keep_threshold_exact_integer(spark):
    # one scored doc whose mean log-prob is exactly the threshold:
    # keep uses >= so it survives; a doc strictly below is dropped.
    docs = spark.createDataFrame(
        [
            (1, "x y", "src0"),  # uni: x=1,y=1 N=2; bigram (x,y)=1
            (2, "x y", "srcX"),  # seen bigram: ln(1/1)=0 -> mean 0 >= thr
            (3, "q q q q q q q q q q q", "srcX"),  # 10 unseen bigrams
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: r
        for r in lm_score_stupid_backoff(
            docs, train_source="src0", keep_lp_per_token="0.0"
        ).collect()
    }
    assert out[2]["keep"] is True  # sum 0 >= 0*1
    assert out[3]["keep"] is False  # ln(0.4*1/2)*10 < 0
