"""Property-based tests (hypothesis): operator semantics vs naive
Python reference implementations on arbitrary small inputs."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.operators.dedup import dedup_latest
from usda_food_data_pipeline_spark.operators.skew import salted_group_sum

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=30,
)


@SLOW
@given(rows=rows_strategy)
def test_dedup_latest_matches_naive(spark, rows):
    df = spark.createDataFrame(rows, "k string, ord long, v long")
    got = {
        (r["k"]): (r["ord"])
        for r in dedup_latest(df, ["k"], "ord").collect()
    }
    expected = {}
    for k, o, _v in rows:
        expected[k] = max(expected.get(k, -1), o)
    assert got == expected


@SLOW
@given(rows=rows_strategy)
def test_salted_sum_matches_plain_sum(spark, rows):
    df = spark.createDataFrame(rows, "k string, ord long, v long")
    salted = {
        r["k"]: r["sum_v"] for r in salted_group_sum(df, ["k"], "v", n_salts=4).collect()
    }
    plain = {
        r["k"]: float(r["s"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert salted == plain


@SLOW
@given(rows=rows_strategy)
def test_replicate_broadcast_join_matches_plain(spark, rows):
    from usda_food_data_pipeline_spark.operators.skew import replicate_broadcast_join

    big = spark.createDataFrame(rows, "k string, ord long, v long")
    small = spark.createDataFrame([("k1", 10), ("k2", 20)], "k string, w long")
    got = sorted(
        (r["k"], r["ord"], r["w"])
        for r in replicate_broadcast_join(big, small, "k", n_salts=4).collect()
    )
    want = sorted((r["k"], r["ord"], r["w"]) for r in big.join(small, "k").collect())
    assert got == want


asof_rows = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=100),  # ts
        st.booleans(),                            # is right-side row
        st.integers(min_value=-50, max_value=50), # value
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(rows=asof_rows)
def test_asof_join_matches_naive(spark, rows):
    """Includes duplicate (key, ts) right rows: the tie rule is
    latest ts first, then greatest value (the documented deterministic
    ordering)."""
    from usda_food_data_pipeline_spark.operators.asof import asof_join

    left = [(k, t, i) for i, (k, t, r, _v) in enumerate(rows)]
    right = [(k, t, v) for (k, t, r, v) in rows if r]
    ldf = spark.createDataFrame(left, "k string, ts long, row_id long")
    rdf = spark.createDataFrame(right or [("zz", -1, 0)], "k string, ts long, v long")
    got = {
        r["row_id"]: r["asof_v"]
        for r in asof_join(ldf, rdf, "ts", ["k"], ["v"]).collect()
    }
    for k, t, row_id in left:
        cands = [(rt, v) for (rk, rt, v) in (right or []) if rk == k and rt <= t]
        want = max(cands)[1] if cands else None  # (max ts, then max value)
        assert got[row_id] == want, (k, t, got[row_id], want)


band_edges = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=2, max_size=6, unique=True
)
band_values = st.lists(
    st.floats(min_value=-60, max_value=60, allow_nan=False, width=32),
    min_size=1,
    max_size=25,
)


@SLOW
@given(edges=band_edges, values=band_values)
def test_band_join_matches_naive_range_join(spark, edges, values):
    """band_join (bucketed equi-join + residual) must equal the naive
    per-row band lookup for arbitrary non-overlapping bands — including
    boundary values, tiny caps forcing the clamped-bucket path, and
    values outside every band."""
    from usda_food_data_pipeline_spark.operators.range_join import band_join

    edges = sorted(edges)
    bands = [
        (float(lo), float(hi), f"b{i}") for i, (lo, hi) in enumerate(zip(edges, edges[1:]))
    ]
    naive = {}
    for i, v in enumerate(values):
        for lo, hi, name in bands:
            if lo <= v < hi:
                naive[i] = name
    bands_df = spark.createDataFrame(bands, "lo double, hi double, band string")
    fact = spark.createDataFrame(list(enumerate(values)), "id long, v double")
    got = {
        r["id"]: r["band"]
        for r in band_join(fact, bands_df, "v", bucket_width=7.0, bucket_cap=5).collect()
    }
    assert got == naive


overlap_bands = st.lists(
    st.tuples(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        st.floats(min_value=0.125, max_value=200, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=6,
)
adversarial_width = st.one_of(
    st.none(),  # auto-derive path
    st.sampled_from([1e-6, 0.5, 3.0, 1e7]),  # tiny width forces the clamp path
)


@SLOW
@given(bands=overlap_bands, values=band_values, width=adversarial_width)
@pytest.mark.slow
def test_band_join_overlapping_and_adversarial_width(spark, bands, values, width):
    """Overlapping bands must yield one output row per (value, matching
    band) pair, for any bucket_width — including widths so small every
    bucket clamps to the cap, and the auto-derived width (None)."""
    from usda_food_data_pipeline_spark.operators.range_join import band_join

    bands = [(float(lo), float(lo + w), f"b{i}") for i, (lo, w) in enumerate(bands)]
    naive = {
        (i, name)
        for i, v in enumerate(values)
        for lo, hi, name in bands
        if lo <= v < hi
    }
    bands_df = spark.createDataFrame(bands, "lo double, hi double, band string")
    fact = spark.createDataFrame(list(enumerate(values)), "id long, v double")
    out = band_join(fact, bands_df, "v", bucket_width=width, bucket_cap=16).collect()
    got = {(r["id"], r["band"]) for r in out}
    assert len(out) == len(got), "duplicate (value, band) pairs emitted"
    assert got == naive


def test_band_join_rejects_bad_width(spark):
    import pytest

    from usda_food_data_pipeline_spark.operators.range_join import band_join

    bands_df = spark.createDataFrame([(0.0, 1.0, "b")], "lo double, hi double, band string")
    fact = spark.createDataFrame([(1, 0.5)], "id long, v double")
    for bad in (0.0, -1.0, float("inf")):
        with pytest.raises(ValueError):
            band_join(fact, bands_df, "v", bucket_width=bad)


chunk_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=60),
    min_size=1,
    max_size=8,
)
chunk_params = st.tuples(st.integers(1, 10), st.integers(1, 10)).filter(
    lambda cs: cs[1] <= cs[0]  # stride <= chunk size (operator contract)
)


@SLOW
@given(texts=chunk_texts, params=chunk_params)
def test_chunk_documents_covers_every_token(spark, texts, params):
    """Every token of every non-empty doc appears in >= 1 chunk at its
    correct position; chunk starts advance by exactly the stride; chunk
    lengths are full-size except possibly the tail."""
    from usda_food_data_pipeline_spark.functions.textstats import chunk_documents

    c, s = params
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = chunk_documents(df, "doc_id", "text", c, s).collect()
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in enumerate(texts)}
    for i, tk in toks.items():
        got = sorted(
            (r["chunk_idx"], r["chunk_text"]) for r in rows if r["doc_id"] == i
        )
        if not tk:
            assert got == []
            continue
        # no empty chunks ever emitted
        assert all(text for _j, text in got)
        # reconstruct: chunk j must equal tokens[j*s : j*s+c]
        n_chunks = 1 + max(0, -(-(len(tk) - c) // s))
        assert len(got) == n_chunks
        covered = set()
        for j, text in got:
            expect = tk[j * s : j * s + c]
            assert text.split() == expect if text else expect == []
            covered.update(range(j * s, min(j * s + c, len(tk))))
        assert covered == set(range(len(tk)))


def test_chunk_documents_rejects_gapping_stride(spark):
    import pytest

    from usda_food_data_pipeline_spark.functions.textstats import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=2, stride=3)


# --- BM25 vs a naive pure-Python reference --------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=8),
    min_size=1,
    max_size=12,
)


@SLOW
@given(docs=docs_strategy, query=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3, unique=True))
def test_bm25_matches_naive(spark, docs, query):
    import math

    from usda_food_data_pipeline_spark.functions.retrieval import bm25_scores

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25"])
        for r in bm25_scores(df, "doc_id", "text", query).collect()
    }

    # naive reference
    k1, b = 1.2, 0.75
    N = len(docs)
    avgdl = sum(len(d) for d in docs) / N
    dfreq = {t: sum(1 for d in docs if t in d) for t in query}
    expected = {}
    for i, d in enumerate(docs):
        terms = [t for t in query if t in d]
        if not terms:
            continue
        total = 0
        for t in terms:
            tf = d.count(t)
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            sat = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(d) / avgdl))
            total += round(idf * sat, 9)
        expected[i] = (len(terms), round(total, 9))
    assert set(got) == set(expected)
    for i, (n, s) in expected.items():
        assert got[i][0] == n
        assert abs(got[i][1] - s) < 1e-9


@SLOW
@given(
    vec=st.lists(
        st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
        min_size=64,
        max_size=64,
    )
)
@pytest.mark.slow
def test_sign_bitpack_matches_naive(spark, vec):
    from usda_food_data_pipeline_spark.operators.similarity import sign_bitpack

    df = spark.createDataFrame([(vec,)], "embedding: array<float>")
    w0, w1 = sign_bitpack("embedding", 64)
    row = df.select(w0.alias("w0"), w1.alias("w1")).first()
    import struct as _struct

    f32 = [_struct.unpack("f", _struct.pack("f", v))[0] for v in vec]
    exp0 = exp1 = 0
    for i in range(32):
        exp0 = exp0 * 2 + (1 if f32[i] > 0 else 0)
    for i in range(32, 64):
        exp1 = exp1 * 2 + (1 if f32[i] > 0 else 0)
    assert (row["w0"], row["w1"]) == (exp0, exp1)


@SLOW
@given(texts=chunk_texts, k=st.integers(1, 6))
def test_boilerplate_and_intra_doc_reference_semantics(spark, texts, k):
    """Both scrubbers must match a straight Python reference on random
    corpora: chunking is non-overlapping k-token windows (tail kept),
    boilerplate = chunks with corpus count >= 3, intra-doc keeps first
    occurrences only."""
    from collections import Counter

    from usda_food_data_pipeline_spark.functions.textstats import (
        boilerplate_scrub,
        dedup_intra_doc,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in enumerate(texts)}
    chunks = {
        i: [" ".join(tk[j : j + k]) for j in range(0, len(tk), k)]
        for i, tk in toks.items()
    }
    counts = Counter(c for cs in chunks.values() for c in cs)

    bp = {r["doc_id"]: r for r in boilerplate_scrub(df, "doc_id", "text", k, 3).collect()}
    for i, cs in chunks.items():
        keep = [c for c in cs if counts[c] < 3]
        assert bp[i]["clean_text"] == " ".join(keep)
        assert bp[i]["n_chunks"] == len(cs)
        assert bp[i]["n_removed"] == len(cs) - len(keep)

    intra = {r["doc_id"]: r for r in dedup_intra_doc(df, "doc_id", "text", k).collect()}
    for i, cs in chunks.items():
        seen, keep = set(), []
        for c in cs:
            if c not in seen:
                seen.add(c)
                keep.append(c)
        assert intra[i]["clean_text"] == " ".join(keep)
        assert intra[i]["n_removed"] == len(cs) - len(keep)


# ---------------------------------------------------------------------------
# Round-6 operators
# ---------------------------------------------------------------------------

merge_changes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),            # key
        st.sampled_from(["U", "D"]),                      # op
        st.integers(min_value=-50, max_value=50),         # value
        st.integers(min_value=0, max_value=20),           # seq
    ),
    min_size=0,
    max_size=25,
)


@SLOW
@given(changes=merge_changes_strategy)
@pytest.mark.slow
def test_merge_apply_matches_naive_and_is_idempotent(spark, changes):
    from usda_food_data_pipeline_spark.operators.merge import merge_apply

    base_rows = [(k, k * 10) for k in range(4)]
    base = spark.createDataFrame(base_rows, "k int, v int")
    # make (key, seq) a total order the way real CDC seqs are: dedup
    # equal (k, seq) pairs keeping the last listed
    dedup = {}
    for k, op, v, s in changes:
        dedup[(k, s)] = (k, op, v, s)
    changes = list(dedup.values())
    if changes:
        ch = spark.createDataFrame(changes, "k int, op string, v int, seq int")
    else:
        ch = spark.createDataFrame([], "k int, op string, v int, seq int")

    got = {r["k"]: r["v"] for r in merge_apply(base, ch, ["k"], ["seq"]).collect()}

    latest = {}
    for k, op, v, s in changes:
        if k not in latest or s > latest[k][2]:
            latest[k] = (op, v, s)
    expected = {}
    for k, v in base_rows:
        if k not in latest:
            expected[k] = v
        elif latest[k][0] != "D":
            expected[k] = latest[k][1]
    for k, (op, v, _s) in latest.items():
        if k not in dict(base_rows) and op != "D":
            expected[k] = v
    assert got == expected

    # idempotence: re-applying the same change set onto the merged
    # snapshot yields the same snapshot
    merged = merge_apply(base, ch, ["k"], ["seq"])
    again = {r["k"]: r["v"] for r in merge_apply(merged, ch, ["k"], ["seq"]).collect()}
    assert again == got


interval_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),   # start minute
        # duration 0 = empty interval: the bucketing's end-exclusive
        # sequence degenerates (descending 2-bucket span on edges) but
        # the exact overlap filter must keep the naive semantics
        st.integers(min_value=0, max_value=400),   # duration minutes
    ),
    min_size=1,
    max_size=12,
)


@SLOW
@given(ls=interval_strategy, rs=interval_strategy)
def test_interval_overlap_matches_naive_on_random_intervals(spark, ls, rs):
    import datetime as dt

    from usda_food_data_pipeline_spark.operators.sessionize import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def mk(rows, a, b, prefix):
        data = [
            (f"{prefix}{i}", t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=s + d))
            for i, (s, d) in enumerate(rows)
        ]
        return spark.createDataFrame(data, f"{prefix}name string, {a} timestamp, {b} timestamp"), data

    left, ldata = mk(ls, "ls", "le", "l")
    right, rdata = mk(rs, "rs", "re", "r")
    got = {
        (r["lname"], r["rname"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=3600
        ).collect()
    }
    want = {
        (ln, rn)
        for ln, lss, lee in ldata
        for rn, rss, ree in rdata
        if lss < ree and rss < lee
    }
    assert got == want


@SLOW
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=20)
)
def test_sessionize_session_count_matches_gap_count(spark, gaps):
    import datetime as dt

    from usda_food_data_pipeline_spark.operators.sessionize import sessionize

    t = dt.datetime(2024, 1, 1)
    rows, ts = [], []
    for i, g in enumerate(gaps):
        t = t + dt.timedelta(seconds=g)
        rows.append((i, t, 1, 1.0))
        ts.append(t)
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = sessionize(df, gap_seconds=1800)
    n_sessions = out.count()
    want = 1 + sum(
        1 for a, b in zip(ts, ts[1:]) if (b - a).total_seconds() > 1800
    )
    assert n_sessions == want
    # every event lands in exactly one session
    assert sum(r["n_events"] for r in out.collect()) == len(rows)


@SLOW
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha bravo charlie delta echo foxtrot golf".split()),
            min_size=0,
            max_size=10,
        ),
        min_size=2,
        max_size=8,
    )
)
@pytest.mark.slow
def test_jaccard_prefix_blocking_complete_vs_brute_force(spark, docs):
    """Prefix filtering (cold path) is LOSSLESS: for any corpus, the
    content-blocked operator returns exactly the brute-force all-pairs
    bigram-Jaccard >= 1/5 set (cap high enough that no shingle is hot).
    Random small-alphabet corpora maximize shared-shingle collisions —
    the regime where a broken prefix/positional/size filter would drop
    a qualifying pair."""
    import itertools

    from usda_food_data_pipeline_spark.operators.dedup import jaccard_pairs_prefix

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs_prefix(sdf, "doc_id", "text", 1, 5, 2).collect()
    }

    def bigrams(t):
        ts = [x for x in t.lower().split() if x]
        return {f"{a} {b}" for a, b in zip(ts, ts[1:])}

    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = bigrams(ta), bigrams(tb)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter * 5 >= union * 1:
            want.add((ia, ib))
    assert got == want
