"""Content-blocked exact Jaccard (operators/dedup.jaccard_pairs_prefix).

r04 verdict task 1: the lang×len metadata blocking key degenerated at
10× scale (guard dropped 100% of blocks → zero recall). The rework
blocks on content: lossless rarest-shingle prefix filtering (AllPairs/
PPJoin) for under-cap shingles, consecutive-triple re-keying for
over-cap ones. These tests pin:

(a) completeness on the cold path — output equals brute-force all-pairs
    Jaccard (the prefix + size + per-pair aggregate bound filters are
    lossless);
(b) hot-path escalation — with a forced tiny cap, near-identical docs
    whose every shingle is hot STILL pair up (the old design found
    nothing there);
(c) engine parity on the hot path — Spark output matches the DuckDB
    oracle twin at the same forced cap (the three gate scales exercise
    only the cold path, so the hot twin is attested here);
(d) guard counters on triple buckets via AQE-safe GuardStats.
"""

from __future__ import annotations

import itertools

import pytest

from usda_food_data_pipeline_spark.operators.dedup import (
    GuardStats,
    jaccard_pairs_prefix,
)


def _bigrams(text: str) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    return {f"{a} {b}" for a, b in zip(toks, toks[1:])}


def _brute_pairs(rows: list[tuple[int, str]], tn: int = 1, td: int = 5):
    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(rows), 2):
        sa, sb = _bigrams(ta), _bigrams(tb)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter * td >= union * tn:
            out.add((ia, ib))
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "a completely different sentence with other words entirely"),
    (4, "a completely different sentence with other words altogether"),
    (5, "quick brown fox jumps over lazy dog"),
    (6, "unrelated text about spark query engines and shuffles"),
    (7, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
]


def test_prefix_blocking_is_complete_on_cold_path(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id int, text string")
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs_prefix(docs, "doc_id", "text", 1, 5, 2).collect()
    }
    assert got == _brute_pairs(CORPUS)


def test_hot_escalation_finds_template_near_dups(spark):
    # 4 clusters × 2 docs built from one shared 12-word cycle (rotated
    # per cluster, per-doc unique suffix): every cycle bigram appears in
    # ~6 docs, so with cap=4 EVERY shared shingle bucket is hot and
    # level 1 contributes nothing — the old single-level design finds
    # zero pairs here. The consecutive-triple keys must recover at
    # least every within-cluster near-dup pair, emit only true pairs
    # (verify is exact), and surface the over-cap triple drops.
    words = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
        "golf", "hotel", "india", "juliet", "kilo", "lima",
    ]
    rows, did = [], 0
    for k in range(4):
        rot = words[k * 3:] + words[:k * 3]
        for i in range(2):
            rows.append((did, " ".join(rot) + f" uniq{k}x{i}"))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    stats = GuardStats()
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", 1, 5, 2, max_bucket=4, observation=stats
        ).collect()
    }
    within = {(2 * k, 2 * k + 1) for k in range(4)}
    assert within <= got  # every within-cluster near-dup recovered
    assert got <= _brute_pairs(rows)  # no false positives
    m = stats.get  # cross-cluster triple buckets over cap → surfaced
    assert m["guard_dropped_buckets"] > 0
    assert m["guard_max_bucket"] == 8


MIXED_HOT_COLD = [
    # Found by exhaustive search against a pure-Python mirror of the
    # r07 candidate generation (hashed codes, ℓ=5 extended prefixes,
    # c + min(H_a, H_b) ≥ min(ℓ, α) filter): at cap=2 EVERY one of the
    # five qualifying pairs has too few cold collisions on its own
    # (c < min(ℓ, α)) and survives only through the min(H_a, H_b) hot
    # credit — a scheme that ignored hot commons (the r05 positional
    # bound's failure mode) would miss all of them. Output must equal
    # the brute-force truth exactly.
    (0, "gg gg aa ee hh gg ee hh ff dd cc ee cc"),
    (1, "bb ee cc ee bb bb ff hh bb ff gg ff dd"),
    (2, "hh hh ee aa aa bb gg aa hh ff dd"),
    (3, "ff bb dd dd dd cc hh bb bb ff hh bb"),
    (4, "ee bb ff dd ee hh bb gg ff"),
    (5, "dd ee cc dd cc aa ee hh bb bb cc"),
    (6, "aa bb gg ee dd dd gg ee"),
    (7, "hh ff bb ff bb hh ff dd dd aa"),
]


def test_mixed_hot_cold_completeness(spark):
    # r05 ADVICE (medium), re-pinned for the r07 count filter: level-1
    # completeness must hold even when most of a pair's common codes
    # route hot. On this corpus at cap=2 the output must be EXACTLY the
    # brute-force truth (five pairs, each needing the hot credit).
    docs = spark.createDataFrame(MIXED_HOT_COLD, "doc_id int, text string")
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", 1, 5, 2, max_bucket=2
        ).collect()
    }
    want = _brute_pairs(MIXED_HOT_COLD)
    assert len(want) == 5
    assert got == want


def test_hot_path_matches_duckdb_oracle(spark, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    from usda_food_data_pipeline_spark.registry_text import ngram_jaccard_oracle

    rows = CORPUS + [
        (10 + i, f"shared template body with many common words here variant {i}")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.parquet(pq)

    cap = 3  # force hot escalation AND some triple-bucket drops
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", 1, 5, 2, max_bucket=cap
        ).collect()
    }
    con = duckdb.connect()
    sql = ngram_jaccard_oracle(cap=cap, source=f"read_parquet('{pq}/*.parquet')")
    want = {(a, b, round(j, 12)) for a, b, j in con.execute(sql).fetchall()}
    assert got == want


def test_triple_bucket_guard_counters(spark):
    # 6 EXACT copies: identical rarity sequences → every triple bucket
    # has 6 rows; cap=4 drops them all and the counters say so
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    stats = GuardStats()
    got = jaccard_pairs_prefix(
        docs, "doc_id", "text", 1, 5, 2, max_bucket=4, observation=stats
    ).collect()
    assert got == []
    m = stats.get
    assert m["guard_dropped_rows"] > 0
    assert m["guard_max_bucket"] == 6


def test_intermediate_janitor_keeps_storage_flat(spark):
    """r05 verdict task 2: the persisted intermediates of a pair-
    generating dedup operator (sh_t/withocc here, sig for MinHash) must
    be retired when the NEXT tracked operator runs, so a session running
    the whole dedup registry holds one generation of blocks, not one per
    query. Explicit release_dedup_caches() must drop to zero-extra."""
    from usda_food_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        persistent_rdd_ids,
        release_dedup_caches,
    )

    release_dedup_caches()
    spark.catalog.clearCache()
    before = persistent_rdd_ids(spark)

    docs = spark.createDataFrame(CORPUS, "doc_id int, text string")
    jaccard_pairs_prefix(docs, "doc_id", "text", 1, 5, 2).count()
    gen1 = persistent_rdd_ids(spark) - before
    assert gen1, "jaccard intermediates should be persisted while live"

    minhash_lsh_pairs(docs, "doc_id", "text").count()
    after2 = persistent_rdd_ids(spark) - before
    # generation 1 (sh_t + withocc) fully retired; only gen 2 (sig) live
    assert not (after2 & gen1), f"gen-1 blocks leaked: {after2 & gen1}"
    assert len(after2) <= len(gen1)

    release_dedup_caches()
    assert not (persistent_rdd_ids(spark) - before)


@pytest.mark.slow
def test_randomized_all_cold_completeness(spark):
    """Seeded random corpora from a tiny vocabulary (maximal collision
    density): with the default cap every shingle is cold, so the
    per-pair aggregate bound must be lossless — output == brute force
    exactly, for every seed."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(rng.choice("aa bb cc dd ee ff gg hh".split())
                         for _ in range(rng.randint(5, 14))))
            for i in range(14)
        ]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            (r.id_a, r.id_b)
            for r in jaccard_pairs_prefix(docs, "doc_id", "text", 1, 5, 2).collect()
        }
        assert got == _brute_pairs(rows), f"seed {seed}"


@pytest.mark.slow
def test_randomized_mixed_cap_no_false_positives(spark):
    """With a tiny forced cap (hot escalation active) the output must
    still be a SUBSET of brute force (verify is exact) and a superset
    of brute-force pairs restricted to... nothing checkable cheaply —
    subset plus the targeted hot tests pin the recall story."""
    import random

    for seed in range(3):
        rng = random.Random(100 + seed)
        rows = [
            (i, " ".join(rng.choice("aa bb cc dd ee".split())
                         for _ in range(rng.randint(5, 12))))
            for i in range(12)
        ]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            (r.id_a, r.id_b)
            for r in jaccard_pairs_prefix(
                docs, "doc_id", "text", 1, 5, 2, max_bucket=2
            ).collect()
        }
        assert got <= _brute_pairs(rows), f"seed {seed}"


def test_containment_pairs_planted(spark):
    """Planted containment: doc 1's shingles are a strict subset of
    doc 2's (quotation case — Jaccard ~0.5 misses at 0.6, containment
    1.0 hits); doc 3 is unrelated. Both directions checked."""
    from usda_food_data_pipeline_spark.operators.dedup import (
        containment_pairs_prefix,
    )

    inner = "alpha beta gamma delta epsilon zeta"
    wrapper = inner + " eta theta iota kappa lam mu nu xi omicron pi rho sigma"
    docs = spark.createDataFrame(
        [
            (1, inner),
            (2, wrapper),
            (3, "one two three four five six seven eight nine ten"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs_prefix(docs, "doc_id", "text", 3, 5).collect()
    }
    assert (1, 2) in rows and rows[(1, 2)] == 1.0  # fully contained
    assert (2, 1) not in rows  # wrapper is NOT inside the quote
    assert not any(3 in k for k in rows)


def test_containment_count_filter_is_lossless_vs_bruteforce(spark):
    """The l-extended count filter must emit exactly the brute-force
    containment pairs on a corpus where the cap never engages."""
    import itertools
    import random

    from usda_food_data_pipeline_spark.operators.dedup import (
        containment_pairs_prefix,
    )

    rnd = random.Random(13)
    vocab = [f"w{i}" for i in range(60)]
    texts = {
        i: " ".join(rnd.choice(vocab) for _ in range(rnd.randint(8, 30)))
        for i in range(30)
    }
    # plant two containment pairs
    texts[100] = texts[0] + " " + texts[1]
    texts[101] = texts[2]
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    def shingles(t):
        toks = t.split()
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    tn, td = 3, 5
    want = set()
    for a, b in itertools.permutations(texts, 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        if sa and len(sa & sb) * td >= len(sa) * tn:
            want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs_prefix(docs, "doc_id", "text", tn, td).collect()
    }
    assert got == want


@pytest.mark.slow
def test_containment_hot_escalation_recovers_suppressed_pair(spark):
    """r08 verdict task 6: a pair ALL of whose shared prefix codes are
    over the index cap used to vanish silently at the RESULT level
    (guard-reported only). The L2 super-shingle escalation must recover
    the contiguous-inclusion case: A quoted verbatim inside B while
    every one of A's bigram codes is hot (df > cap) because scattered
    copies of those bigrams ride inside filler docs."""
    import itertools

    from usda_food_data_pipeline_spark.operators.dedup import (
        GuardStats,
        containment_pairs_prefix,
    )

    a_text = "p q r s t u"
    b_text = "bj0 bj1 bj2 " + a_text + " bj3 bj4"
    a_bigrams = ["p q", "q r", "r s", "s t", "t u"]
    texts = {1: a_text, 2: b_text}
    # 10 fillers, each carrying 2 of A's 5 bigrams NON-contiguously
    # (separated by junk) -> each bigram code lands in exactly 4
    # fillers + A + B = df 6 > cap 4, so A's whole prefix is hot; no
    # filler shares >= 3 of A's bigrams, so no chance containment.
    for i in range(10):
        picks = [a_bigrams[(2 * i) % 5], a_bigrams[(2 * i + 1) % 5]]
        texts[10 + i] = (
            f"f{i}a f{i}b f{i}c " + picks[0] + f" f{i}d " + picks[1] + f" f{i}e"
        )
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    def shingles(t):
        toks = t.split()
        return {f"{x} {y}" for x, y in zip(toks, toks[1:])}

    tn, td = 3, 5
    want = set()
    for a, b in itertools.permutations(texts, 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        if sa and len(sa & sb) * td >= len(sa) * tn:
            want.add((a, b))
    assert want == {(1, 2)}, "corpus must plant exactly the A-in-B pair"

    obs = GuardStats()
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs_prefix(
            docs, "doc_id", "text", tn, td, max_bucket=4, observation=obs
        ).collect()
    }
    g = obs.get
    assert g["guard_dropped_rows"] > 0, "cap must have engaged (hot regime)"
    assert set(got) == want, (
        "L2 escalation must recover the cap-suppressed contiguous pair"
    )
    assert got[(1, 2)] == 1.0


def test_containment_l2_skipped_when_prefixes_healthy(spark):
    """The escalation probe must short-circuit (no dedup stage, no
    super-shingle scan) when no doc's hot prefix count reaches
    min(l, alpha) — the plan stays the L1-only shape."""
    from usda_food_data_pipeline_spark.operators.dedup import (
        containment_pairs_prefix,
    )

    texts = {i: " ".join(f"u{i}_{j}" for j in range(12)) for i in range(8)}
    texts[100] = texts[0]  # one exact dup pair keeps the output nonempty
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = containment_pairs_prefix(docs, "doc_id", "text", 3, 5, max_bucket=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "dropDuplicates" not in plan.lower().replace("deduplicate", "dropduplicates")
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(0, 100), (100, 0)}
