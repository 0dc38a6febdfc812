"""Dedup-suite and text-analysis queries over the ``documents`` table.

The oracle SQL is generated from the same constants as the Spark
expressions (stopword profiles, hash seeds, shingle sizes), and all
hashing goes through md5 — portable across engines — so even MinHash /
SimHash signatures oracle-check exactly.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.textstats import (
    ALPHA_CLASS,
    LANG_PROFILES,
    PUNCT_CLASS,
    ROLLING_MOD,
    ROLLING_MULT,
    bag_fingerprint,
    lang_id,
    quality_score,
    rolling_hash,
    token_count,
    tokenize,
)
from .operators.dedup import (
    DEFAULT_MAX_BUCKET,
    cap_bucket_qualify_sql,
    exact_dedup,
    minhash_lsh_pairs,
    oracle_md5_int_sql,
    simhash_fingerprints,
)
from .functions.portable_ln import POWS_CTE as _POWS_CTE
from .functions.portable_ln import grid_decimal_col as _grid_decimal_col
from .functions.portable_ln import grid_nanos_col as _grid_nanos_col
from .functions.portable_ln import sql_grid_decimal as _sql_grid_decimal
from .functions.portable_ln import sql_grid_nanos as _sql_grid_nanos
from .functions.portable_ln import sql_ln_select as _sql_ln_select
from .registry import register
from .sources.tables import load_table

# --- shared DuckDB fragments (twins of the Spark expressions) -------------

TOKS_SQL = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '')"


def shingles_sql(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" if j else f"{toks}[i]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks})-{n - 1}, 0)+1), "
        f"i -> {parts}))"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    "exact-content dedup via hash-groupBy, canonical = min id",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (blocked exact)
# ---------------------------------------------------------------------------

# threshold 0.2 as the exact rational 1/5 — prefix length, size filter
# and the final Jaccard test are all integer comparisons on both engines
_NJ_TN, _NJ_TD = 1, 5


def ngram_jaccard_oracle(
    cap: int = DEFAULT_MAX_BUCKET,
    tn: int = _NJ_TN,
    td: int = _NJ_TD,
    shingle_n: int = 2,
    source: str = "documents",
    hot_k: int = 8,
    hot_min_shared: int = 2,
    ext_l: int = 5,
    hash_seed: int = 29,
) -> str:
    """DuckDB twin of ``operators.dedup.jaccard_pairs_prefix``:
    portable-hashed shingle codes, ℓ-extended rarest-code prefix
    blocking with the exact count filter (c + min(H_a, H_b) ≥
    min(ℓ, α)), and level-2 escalation of over-cap codes to
    bottom-k-sampled consecutive-triple keys (>= 2 shared to pair).
    Parameterized so tests can force the hot path with a tiny cap on a
    tiny corpus."""
    compat = (
        f"a.doc_id < b.doc_id AND a.sz * {td} >= b.sz * {tn} "
        f"AND b.sz * {td} >= a.sz * {tn}"
    )
    code = oracle_md5_int_sql("g", hash_seed)
    return f"""
WITH sh_t AS (
    SELECT doc_id,
           list_distinct(list_transform({shingles_sql(TOKS_SQL, shingle_n)},
                                        g -> {code})) AS sh
    FROM {source}
),
sized AS (SELECT doc_id, sh, len(sh) AS sz FROM sh_t),
ex AS (SELECT doc_id, sz, unnest(sh) AS s FROM sized),
dfreq AS (SELECT s, count(*) AS df_n FROM ex GROUP BY s),
-- l-extended rarest-first prefix:
-- first |sh| - ceil(t*|sh|) + {ext_l} codes by (df, code)
pfx AS (
    SELECT doc_id, sz, s, df_n, rn FROM (
        SELECT e.doc_id, e.sz, e.s, d.df_n,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df_n, e.s) AS rn
        FROM ex e JOIN dfreq d ON e.s = d.s
    ) WHERE rn <= sz - ((sz * {tn} + {td} - 1) // {td}) + {ext_l}
),
occ AS (SELECT s, count(*) AS occ_n FROM pfx GROUP BY s),
-- hh = hot entries in the doc's whole extended prefix
pfo AS (
    SELECT p.*, o.occ_n,
           sum(CASE WHEN o.occ_n > {cap} THEN 1 ELSE 0 END) OVER (
               PARTITION BY p.doc_id) AS hh
    FROM pfx p JOIN occ o ON p.s = o.s
),
cold AS (SELECT * FROM pfo WHERE occ_n <= {cap}),
hot  AS (SELECT * FROM pfo WHERE occ_n > {cap}),
-- level 2: consecutive (rarity-ordered) triples of hot prefix
-- codes, bottom-{hot_k} sampled by portable content hash
hotp AS (
    SELECT doc_id, sz, s, s2, s3 FROM (
        SELECT doc_id, sz, s, s2, s3,
               {oracle_md5_int_sql("CAST(s AS VARCHAR) || chr(31) || CAST(s2 AS VARCHAR) || chr(31) || CAST(s3 AS VARCHAR)", 21)} AS h
        FROM (
            SELECT doc_id, sz, s, df_n,
                   lead(s, 1) OVER (PARTITION BY doc_id ORDER BY df_n, s) AS s2,
                   lead(s, 2) OVER (PARTITION BY doc_id ORDER BY df_n, s) AS s3
            FROM hot
        ) WHERE s3 IS NOT NULL
    )
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h, s, s2, s3) <= {hot_k}
),
-- oversized-bucket guard twin (operators/dedup.cap_bucket_size)
hotp_g AS (
    SELECT * FROM hotp
    {cap_bucket_qualify_sql('s, s2, s3', cap)}
),
cand AS (
    -- extension-lemma count filter (jaccard_pairs_prefix step 3): a
    -- qualifying pair's first min(l, alpha) commons all sit in both
    -- extended prefixes, each a cold collision or hot in both, so
    -- c + least(H_a, H_b) >= min(l, alpha)
    SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
               count(*) AS c, max(a.hh) AS h_a, max(b.hh) AS h_b
        FROM cold a JOIN cold b ON a.s = b.s AND {compat}
        GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
    )
    WHERE (c + least(h_a, h_b)) >= {ext_l}
       OR (c + least(h_a, h_b)) * {tn + td} >= (sz_a + sz_b) * {tn}
    UNION
    -- >= {hot_min_shared} shared selected triples to pair
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM hotp_g a JOIN hotp_g b
      ON a.s = b.s AND a.s2 = b.s2 AND a.s3 = b.s3 AND {compat}
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {hot_min_shared}
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           / (x.sz + y.sz - len(list_intersect(x.sh, y.sh))) AS jaccard
FROM cand c JOIN sized x ON c.id_a = x.doc_id JOIN sized y ON c.id_b = y.doc_id
WHERE len(list_intersect(x.sh, y.sh)) * {td}
      >= (x.sz + y.sz - len(list_intersect(x.sh, y.sh))) * {tn}
"""


NGRAM_JACCARD_ORACLE = ngram_jaccard_oracle()


@register(
    "dedup_ngram_jaccard",
    NGRAM_JACCARD_ORACLE,
    "word-bigram Jaccard pairs via rarest-shingle prefix blocking (lossless AllPairs filter)",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs bigram Jaccard via the ℓ-extended rarest-code
    prefix filter (operators/dedup.jaccard_pairs_prefix; Adapt-Join).
    Level 1 (cold prefix codes) is lossless: output contains every
    pair with bigram Jaccard >= 1/5 that shares at least one under-cap
    prefix code. Pairs whose shared prefix codes are ALL over the
    bucket cap ride the level-2 bottom-k triple keys, which are
    heuristic-recall. Engagement by scale: at sf<=0.1 no code crosses
    the cap, so the output is exactly ALL qualifying pairs; at the
    replication scales sf1/sf3 the hot path carries ~97% of prefix
    entries (r07 same-session A/B, min-of-2: sf0.1 21.4s -> 14.0s,
    sf3 85.8s -> 53.4s vs the r06 positional-bound form, with 260 /
    2.4M identical-or-better exact pair outputs; candidates at sf0.1
    fell 4.6M -> 0.6M). The query attaches a GuardStats observation
    (read by bench.py) so a corpus that drops buckets — the only
    silent-recall regime — is visible in the BENCH artifacts.

    ROUTING (r06 verdict task 6, VOCAB_GROWTH.json): this operator is
    the EXACT-RECALL tool — every qualifying pair, exact Jaccard
    values, oracle-checkable. Its cost tracks the prefix-collision
    stream, which grows with shared-vocabulary density: on the ×30
    FRESH-VOCABULARY axis it does ~24× the work of MinHash-LSH (202.5s
    vs 8.5s, r07 re-measure) to find ~2% more pairs (7,800 vs 7,652). Route corpora by
    need: exact dedup decisions / contractual recall -> this operator;
    crawl-scale near-dup sweeps where probabilistic recall ~98% at
    b·r-tunable precision is acceptable -> dedup_minhash_lsh (same
    verified-exact pair values, band-blocked candidates)."""
    from .operators.dedup import jaccard_pairs_prefix
    from .registry import guard_observation

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_prefix(
        docs, "doc_id", "text",
        threshold_num=_NJ_TN, threshold_den=_NJ_TD, shingle_n=2,
        observation=guard_observation("dedup_ngram_jaccard"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/test n-gram overlap screen)
# ---------------------------------------------------------------------------

DECONTAMINATE_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, {shingles_sql(TOKS_SQL, 3)} AS sh
    FROM documents WHERE doc_id % 7 <> 0
),
bench AS (
    SELECT doc_id, {shingles_sql(TOKS_SQL, 3)} AS sh
    FROM documents WHERE doc_id % 7 = 0
)
SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
       CAST(len(list_intersect(c.sh, b.sh)) AS BIGINT) AS n_shared
FROM corpus c, bench b
WHERE len(list_intersect(c.sh, b.sh)) >= 2
"""


@register(
    "decontaminate",
    DECONTAMINATE_ORACLE,
    "flag corpus docs sharing >=2 word-trigrams with a benchmark doc (broadcast shingle index)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import decontaminate
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    benchmark = docs.filter(F.col("doc_id") % 7 == 0)
    return decontaminate(corpus, benchmark, shingle_n=3, min_shared=2)


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs
# ---------------------------------------------------------------------------

# 4 rows/band: band-collision probability j^4 — strong enough that the
# tiny shared vocabulary doesn't flood the candidate join at scale
_NUM_HASHES, _BANDS, _SHINGLE_N, _MH_THRESHOLD = 16, 4, 3, 0.2
_ROWS_PER_BAND = _NUM_HASHES // _BANDS


def minhash_pairs_ctes(source: str) -> str:
    """CTE chain computing MinHash-LSH verified near-dup pairs over any
    source relation with (doc_id, text); final CTE is ``mh_pairs``."""
    from .operators.dedup import MINHASH_MOD, _mix_params

    base = f"({oracle_md5_int_sql('s', 0)} % {MINHASH_MOD})"
    mh_cols = ",\n        ".join(
        f"list_min(list_transform(sh, s -> ({_mix_params(k)[0]} * {base} + {_mix_params(k)[1]}) % {MINHASH_MOD})) AS mh_{k}"
        for k in range(_NUM_HASHES)
    )
    band_selects = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, sh, {b} AS band, "
        + " || '_' || ".join(
            f"CAST(mh_{b * _ROWS_PER_BAND + r} AS VARCHAR)" for r in range(_ROWS_PER_BAND)
        )
        + " AS bucket FROM sigs"
        for b in range(_BANDS)
    )
    return f"""sh_t AS (
    SELECT doc_id, {shingles_sql(TOKS_SQL, _SHINGLE_N)} AS sh FROM {source}
),
sigs AS (
    SELECT doc_id, sh,
        {mh_cols}
    FROM sh_t
),
banded AS (
{band_selects}
),
banded_g AS (
    -- oversized-bucket guard twin (operators/dedup.cap_bucket_size)
    SELECT * FROM banded
    {cap_bucket_qualify_sql('band, bucket', DEFAULT_MAX_BUCKET)}
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded_g a JOIN banded_g b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
mh_pairs AS (
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
    FROM cand c JOIN sh_t x ON c.id_a = x.doc_id JOIN sh_t y ON c.id_b = y.doc_id
    WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= {_MH_THRESHOLD}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {minhash_pairs_ctes('documents')}
SELECT id_a, id_b, jaccard FROM mh_pairs
"""


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    f"MinHash({_NUM_HASHES})+LSH({_BANDS} bands x {_ROWS_PER_BAND} rows) pairs, verified by exact Jaccard",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import guard_observation

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=_SHINGLE_N,
        jaccard_threshold=_MH_THRESHOLD,
        observation=guard_observation("dedup_minhash_lsh"),
    )


# ---------------------------------------------------------------------------
# LSH recall evaluation: MinHash-LSH candidate recall against exact
# Jaccard truth, bucketed by similarity — the dedup-family twin of
# adc_recall_eval (every probabilistic-recall deployment ships with its
# measurement; this makes the 1-(1-s^r)^b S-curve an oracle-checked row)
# ---------------------------------------------------------------------------


def _lsh_recall_oracle() -> str:
    truth = ngram_jaccard_oracle(shingle_n=_SHINGLE_N, tn=_NJ_TN, td=_NJ_TD)
    return f"""
WITH truth AS (SELECT * FROM ({truth}) _tq),
{minhash_pairs_ctes('documents')}
SELECT CAST(floor(t.jaccard * 10.0) AS INTEGER) AS j_bucket,
       count(*) AS n_true,
       count(m.id_a) AS n_hit
FROM truth t LEFT JOIN mh_pairs m ON m.id_a = t.id_a AND m.id_b = t.id_b
GROUP BY 1
"""


@register(
    "lsh_recall_eval",
    _lsh_recall_oracle(),
    "MinHash-LSH candidate recall vs exact-Jaccard truth per similarity "
    "decile: the measurable 1-(1-s^r)^b S-curve (n_true/n_hit per bucket)",
)
def q_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides verify pairs with exact integer Jaccard at the same
    threshold, so LSH pairs are a SUBSET of truth (precision 1 by
    construction) and per-bucket ``n_hit/n_true`` is pure candidate
    recall — the quantity the banding parameters (b=4, r=4) set via
    1-(1-s^r)^b.  Truth comes from the exact prefix-filter operator
    (contractual recall), at the SAME shingle width as the LSH side.

    Composite-janitor discipline (operators/dedup._IntermediateJanitor):
    each tracked operator's output is persisted and MATERIALIZED before
    the next tracked call (whose rollover frees the previous build
    caches), then track()-ed so the next registry query retires it.
    Bucket ids are floor(jaccard*10) with the identical double op order
    in both engines (bit-equal since the jaccard values themselves are
    attested by dedup_ngram_jaccard/dedup_minhash_lsh).

    ELIGIBILITY NOTE (same contract as containment_pairs): both
    operators cap oversized blocks, and they cap on DIFFERENT keys —
    with nonzero truth-side drops an LSH pair can verify >= t yet be
    absent from truth, so "precision 1 / recall over complete truth"
    holds only at guard-drops = 0.  Both operators' guard counters are
    registered under this query's name so the bench artifact surfaces
    any engaged cap next to the row (zero at every tested sf).

    At 100 TB this harness runs on a sampled slice (the truth side is
    the expensive exact operator — that cost is the point of the
    measurement, exactly like adc_recall_eval's brute-force side).
    """
    from .operators.dedup import (
        _INTERMEDIATES,
        jaccard_pairs_prefix,
        minhash_lsh_pairs,
    )
    from .registry import guard_observation

    obs = guard_observation("lsh_recall_eval")
    docs = load_table(spark, sf_dir, "documents")
    truth = jaccard_pairs_prefix(
        docs, "doc_id", "text",
        threshold_num=_NJ_TN, threshold_den=_NJ_TD, shingle_n=_SHINGLE_N,
        observation=obs,
    ).persist()
    truth.count()
    # minhash's rollover frees the prefix operator's BUILD caches —
    # harmless, truth is materialized above. Do NOT track truth before
    # this call or the rollover would free truth itself.
    lsh = minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=_SHINGLE_N,
        jaccard_threshold=_MH_THRESHOLD, observation=obs,
    ).select("id_a", "id_b", F.lit(1).alias("_hit")).persist()
    lsh.count()
    _INTERMEDIATES.track(truth)
    _INTERMEDIATES.track(lsh)
    return (
        truth.join(lsh, ["id_a", "id_b"], "left")
        .groupBy(
            F.floor(F.col("jaccard") * F.lit(10.0)).cast("int").alias("j_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("_hit").alias("n_hit"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------

def _simhash_oracle(bits: int = 16) -> str:
    hashes = f"list_transform(list_distinct({TOKS_SQL}), t -> {oracle_md5_int_sql('t', 999, 4)})"
    bit_terms = "\n         + ".join(
        f"CASE WHEN 2 * list_sum(list_transform(hs, h -> CAST(floor(h / {2 ** i}.0) AS BIGINT) % 2)) "
        f"> len(hs) THEN {2 ** i} ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH h AS (SELECT doc_id, {hashes} AS hs FROM documents)
SELECT doc_id,
       CAST({bit_terms} AS BIGINT) AS simhash
FROM h
"""


def _simhash_neardup_oracle(
    bits: int = 48, bands: int = 4, max_hamming: int = 3,
    cap: int = DEFAULT_MAX_BUCKET,
) -> str:
    r = bits // bands
    mask = (1 << r) - 1
    hashes = (
        f"list_transform(list_distinct({TOKS_SQL}), "
        f"t -> {oracle_md5_int_sql('t', 999, bits // 4)})"
    )
    bit_terms = "\n         + ".join(
        f"CASE WHEN 2 * list_sum(list_transform(hs, h -> CAST(floor(h / {2 ** i}.0) AS BIGINT) % 2)) "
        f"> len(hs) THEN {2 ** i} ELSE 0 END"
        for i in range(bits)
    )
    band_rows = ", ".join(f"({b})" for b in range(bands))
    return f"""
WITH h AS (SELECT doc_id, {hashes} AS hs FROM documents),
fpt AS (SELECT doc_id, CAST({bit_terms} AS BIGINT) AS fp FROM h),
banded AS (
    SELECT doc_id, fp, band, (fp >> ({r} * band)) & {mask} AS val
    FROM fpt CROSS JOIN (VALUES {band_rows}) _b(band)
),
banded_g AS (
    SELECT * FROM banded
    {cap_bucket_qualify_sql('band, val', cap)}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
FROM banded_g a JOIN banded_g b
  ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


@register(
    "simhash_neardup",
    _simhash_neardup_oracle(),
    "Manku-style SimHash near-dup pairs: 48-bit fingerprints, 4x12-bit "
    "pigeonhole bands (complete for hamming <= 3), exact hamming verify",
)
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_neardup_pairs
    from .registry import guard_observation

    docs = load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(
        docs, "doc_id", "text",
        observation=guard_observation("simhash_neardup"),
    )


@register(
    "dedup_simhash",
    _simhash_oracle(),
    "16-bit SimHash fingerprint per document (md5-derived bit votes)",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, "doc_id", "text", bits=16)


# ---------------------------------------------------------------------------
# Token entropy (functions/textstats.token_entropy): per-doc Shannon
# entropy of the unigram distribution in exact integer ln-nanos — the
# second consumer of the in-plan portable ln (ln_int_col), per-row
# arguments with no driver collect
# ---------------------------------------------------------------------------


def _token_entropy_oracle() -> str:
    lnc = _sql_ln_select(
        "(SELECT DISTINCT c FROM occ) _dc",
        ["c"],
        {"a": "c"},
        [("nan", _sql_grid_nanos("_ln_a"))],
    )
    lnn = _sql_ln_select(
        "(SELECT DISTINCT n_tokens FROM per_doc) _dn",
        ["n_tokens"],
        {"a": "n_tokens"},
        [("nan", _sql_grid_nanos("_ln_a"))],
    )
    return f"""
WITH {_POWS_CTE},
occ AS (
    SELECT doc_id, t, count(*) AS c
    FROM (SELECT doc_id, unnest({TOKS_SQL}) AS t FROM documents)
    GROUP BY 1, 2
),
lnc AS ({lnc}),
per_doc AS (
    SELECT occ.doc_id, CAST(sum(occ.c) AS BIGINT) AS n_tokens,
           CAST(sum(occ.c * l.nan) AS BIGINT) AS _s
    FROM occ JOIN lnc l ON l.c = occ.c
    GROUP BY 1
),
lnn AS ({lnn})
SELECT p.doc_id, p.n_tokens,
       CAST(l.nan - (p._s // p.n_tokens) AS BIGINT) AS entropy_nanos
FROM per_doc p JOIN lnn l ON l.n_tokens = p.n_tokens
"""


@register(
    "token_entropy",
    _token_entropy_oracle(),
    "per-doc Shannon entropy of the token distribution in exact integer "
    "ln-nanos (in-plan portable ln; gibberish/diversity signal)",
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import token_entropy
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return token_entropy(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Token stats
# ---------------------------------------------------------------------------

@register(
    "text_tokens",
    f"""
    SELECT doc_id,
           len({TOKS_SQL}) AS n_tokens,
           length(text) AS n_chars_actual,
           CASE WHEN len({TOKS_SQL}) > 0 THEN
               CAST(length(regexp_replace(text, '{ALPHA_CLASS}', '', 'g')) AS DOUBLE)
               / len({TOKS_SQL}) END AS mean_token_len,
           CAST(greatest(len({TOKS_SQL}) - 2, 0) AS BIGINT) AS n_shingles,
           CAST(len({shingles_sql(TOKS_SQL, 3)}) AS BIGINT) AS n_distinct_shingles,
           CASE WHEN len({TOKS_SQL}) - 2 <= 0 THEN NULL
                ELSE 1.0 - CAST(len({shingles_sql(TOKS_SQL, 3)}) AS DOUBLE)
                         / CAST(greatest(len({TOKS_SQL}) - 2, 0) AS DOUBLE)
           END AS rep_ratio
    FROM documents
    """,
    "token counts, mean token length + repeated-trigram fraction (boilerplate signal)",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage projection: stage 1 tokenizes once (`toks` is referenced
    by several output columns, so CollapseProject keeps the boundary and
    the regex split/filter runs once per row — the round-2 single-select
    form re-evaluated it per derived column, 0.9s vs ~0.5s at sf0.1);
    stage 2 derives all counts/ratios from the shared arrays."""
    from .operators.dedup import tokenize, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    base = docs.select(
        "doc_id",
        F.length(text).alias("n_chars_actual"),
        F.length(F.regexp_replace(text, ALPHA_CLASS, "")).alias("_n_alpha"),
        tokenize(text).alias("_toks"),
    )
    n_toks = F.size("_toks")
    total = F.greatest(n_toks - 2, F.lit(0)).cast("long")
    distinct = F.size(word_shingles(F.col("_toks"), 3)).cast("long")
    return base.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        "n_chars_actual",
        F.try_divide(F.col("_n_alpha").cast("double"), n_toks).alias("mean_token_len"),
        total.alias("n_shingles"),
        distinct.alias("n_distinct_shingles"),
        (F.lit(1.0) - F.try_divide(distinct.cast("double"), total.cast("double"))).alias(
            "rep_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Quality score
# ---------------------------------------------------------------------------

_QUALITY_SQL = f"""0.5 * (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '{ALPHA_CLASS}', '', 'g')) AS DOUBLE) / length(text) END)
         + 0.3 * (1.0 - (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE) / length(text) END))
         + 0.2 * (CASE WHEN (CASE WHEN len({TOKS_SQL}) > 0 THEN CAST(length(regexp_replace(text, '{ALPHA_CLASS}', '', 'g')) AS DOUBLE)
                            / len({TOKS_SQL}) END) BETWEEN 3.0 AND 10.0
                       THEN 1.0 ELSE 0.0 END)"""


# ---------------------------------------------------------------------------
# Language ID
# ---------------------------------------------------------------------------

def _langid_case_sql() -> str:
    langs = list(LANG_PROFILES)
    scores = {
        lang: (
            "len(list_filter(toks, t -> list_contains(["
            + ", ".join(f"'{w}'" for w in words)
            + "], t)))"
        )
        for lang, words in LANG_PROFILES.items()
    }
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{scores[lang]} > 0"]
        for j, o in enumerate(langs):
            if j < i:
                conds.append(f"{scores[lang]} > {scores[o]}")
            elif j > i:
                conds.append(f"{scores[lang]} >= {scores[o]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


@register(
    "text_signals",
    f"""
    WITH t AS (SELECT doc_id, lang AS labeled_lang, text, {TOKS_SQL} AS toks FROM documents)
    SELECT doc_id, labeled_lang, {_langid_case_sql()} AS predicted_lang,
           {_QUALITY_SQL} AS quality
    FROM t
    """,
    "language-ID heuristic + quality heuristic in one per-doc signals row "
    "(merged round 4 to free a driver slot; both formulas unchanged)",
)
def q_text_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage projection (the text_tokens pattern): tokenize and the
    two regex length-scans run once in stage 1; stage 2 derives both
    signals from the shared columns — the single-select form
    re-evaluated tokenize per signal."""
    from .functions.textstats import (
        lang_id_from_scores,
        quality_score_parts,
        stopword_hits,
    )

    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    base = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tokenize(text).alias("_toks"),
        F.length(text).alias("_n_chars"),
        F.length(F.regexp_replace(text, ALPHA_CLASS, "")).alias("_alpha"),
        F.length(F.regexp_replace(text, PUNCT_CLASS, "")).alias("_punct"),
    )
    # each per-language hit count computes once here; the CASE in the
    # next projection only compares column references
    scored = base.select(
        "*",
        *[
            stopword_hits(F.col("_toks"), words).alias(f"_s_{lang}")
            for lang, words in LANG_PROFILES.items()
        ],
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        lang_id_from_scores(
            {lang: F.col(f"_s_{lang}") for lang in LANG_PROFILES}
        ).alias("predicted_lang"),
        quality_score_parts(
            F.col("_n_chars"), F.col("_alpha"), F.col("_punct"), F.size("_toks")
        ).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Fingerprints
# ---------------------------------------------------------------------------

@register(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bag_fp,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(toks, t -> {oracle_md5_int_sql('t', 7, 8)})),
               (acc, h) -> (acc * {ROLLING_MULT} + h) % {ROLLING_MOD}) AS rolling_fp
    FROM t
    """,
    "bag-of-words md5 fingerprint + order-sensitive polynomial rolling hash",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bag_fingerprint(F.col("text")).alias("bag_fp"),
        rolling_hash(F.col("text")).alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# PII redaction + repetition quality signal (training-data release prep)
# ---------------------------------------------------------------------------

def _pii_oracle_sql() -> str:
    from .functions.textstats import PII_PATTERNS

    expr = "text"
    for pat, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return f"SELECT doc_id, {expr} AS redacted FROM documents"


@register(
    "pii_scrub",
    _pii_oracle_sql(),
    "chained regex PII redaction (id/phone/email), pure codegen — no UDF",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", redact_pii(F.col("text")).alias("redacted"))


# text_repetition was folded into text_tokens (round 2) so the
# repetition signal sits inside the driver's verification window;
# functions.textstats.repetition_stats keeps its own unit test.


# ---------------------------------------------------------------------------
# Sequence packing: assign docs to fixed-token-budget training packs.
# Window-cumsum semantics (pack may overflow by one tail doc — the
# scale-safe approximation; see functions.textstats.pack_sequences).
# ---------------------------------------------------------------------------

@register(
    "sequence_packing",
    f"""
    WITH t AS (SELECT doc_id, lang, len({TOKS_SQL}) AS n_toks FROM documents),
    c AS (
        SELECT doc_id, lang, n_toks,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS cum_before
        FROM t
    )
    SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks, cum_before,
           CAST(floor(cum_before / 512) AS BIGINT) AS pack_id
    FROM c
    """,
    "pack docs into 512-token training sequences per language (window cumsum)",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import pack_sequences, token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).cast("long").alias("n_toks")
    )
    return pack_sequences(docs, "n_toks", "doc_id", 512, part_col="lang").select(
        "doc_id", "lang", "n_toks", "cum_before", "pack_id"
    )


# ---------------------------------------------------------------------------
# Multimodal metadata plumbing (decode itself is stubbed — see
# operators/multimodal.py; the metadata/framing contract is oracle-checked)
# ---------------------------------------------------------------------------

@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           strlen(text) AS n_bytes,
           md5(text) AS checksum,
           greatest((strlen(text) - 1) // 64, 0) + 1 AS frame_count
    FROM documents
    """,
    "binary payload metadata: byte length, checksum, frame-sample count",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.octet_length("text")
    return docs.select(
        "doc_id",
        n.alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("checksum"),
        (F.greatest(F.floor((n - 1) / 64), F.lit(0)).cast("bigint") + 1).alias("frame_count"),
    )


# ---------------------------------------------------------------------------
# Python UDTF oracle row (SURVEY §2.9): sentence segmentation via the
# SplitSentences UDTF lateral join. The DuckDB twin emulates the
# lookbehind split (RE2 has no lookbehind) by marking each [.!?]+ws
# boundary with chr(30) and splitting on it; documents are attested
# ASCII-only so Python-\s (unicode) and RE2-\s (ascii) agree.
# ---------------------------------------------------------------------------

@register(
    "split_sentences",
    r"""
    WITH parts AS (
        SELECT doc_id,
               string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(30), 'g'),
                            chr(30)) AS arr
        FROM documents
    ),
    ex AS (
        SELECT doc_id, generate_subscripts(arr, 1) AS idx0, unnest(arr) AS sentence
        FROM parts
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY idx0) - 1 AS BIGINT)
               AS sent_idx,
           sentence,
           CAST(length(sentence) AS BIGINT) AS n_chars
    FROM ex WHERE trim(sentence) <> ''
    """,
    "UDTF lateral join: one row per sentence (idx, text, char count)",
)
def q_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.udtf_udaf import split_sentences

    docs = load_table(spark, sf_dir, "documents")
    out = split_sentences(docs, "text", "doc_id")
    return out.select(
        "doc_id",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Multimodal container decode round-trip: synthesize real WAV (RIFF/PCM
# via stdlib wave) + BMP (24bpp via struct) binaries from doc_id in one
# mapInPandas stage, decode them in a second — the payloads cross a real
# Arrow binary-column boundary. Every decoded statistic is an integer
# function of doc_id, so the oracle recomputes it exactly in SQL
# (series cross-join: sample i < n, pixel (x,y) < (w,h)). Closes the
# round-2 decode stubs (operators/multimodal.py decode_audio/
# decode_image are now real parsers).
# ---------------------------------------------------------------------------

@register(
    "multimodal_decode",
    """
    WITH d AS (
        SELECT doc_id,
               64 + doc_id % 64 AS n,
               8000 + (doc_id % 8) * 500 AS rate,
               4 + doc_id % 4 AS w,
               3 + doc_id % 3 AS h
        FROM documents
    ),
    si AS (SELECT unnest(range(0, 128)) AS i),
    wav AS (
        SELECT d.doc_id,
               CAST(sum(CASE WHEN si.i < d.n
                    THEN ((d.doc_id*31 + si.i*7) % 65536) - 32768 END) AS BIGINT) AS wav_sum
        FROM d CROSS JOIN si GROUP BY d.doc_id
    ),
    sx AS (SELECT unnest(range(0, 7)) AS x),
    sy AS (SELECT unnest(range(0, 5)) AS y),
    bmp AS (
        SELECT d.doc_id,
               CAST(sum(CASE WHEN sx.x < d.w AND sy.y < d.h
                    THEN (d.doc_id + 3*sx.x + 7*sy.y) % 256 END) AS BIGINT) AS sum_r,
               CAST(sum(CASE WHEN sx.x < d.w AND sy.y < d.h
                    THEN (2*d.doc_id + 5*sx.x + sy.y) % 256 END) AS BIGINT) AS sum_g,
               CAST(sum(CASE WHEN sx.x < d.w AND sy.y < d.h
                    THEN (3*d.doc_id + sx.x + 11*sy.y) % 256 END) AS BIGINT) AS sum_b
        FROM d CROSS JOIN sx CROSS JOIN sy GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           44 + 2 * d.n AS wav_bytes,
           d.rate AS wav_rate,
           d.n AS wav_n,
           ((d.doc_id*31) % 65536) - 32768 AS wav_first,
           ((d.doc_id*31 + (d.n-1)*7) % 65536) - 32768 AS wav_last,
           wav.wav_sum,
           54 + ((d.w*3 + 3) // 4) * 4 * d.h AS bmp_bytes,
           d.w AS bmp_w,
           d.h AS bmp_h,
           bmp.sum_r, bmp.sum_g, bmp.sum_b
    FROM d JOIN wav USING (doc_id) JOIN bmp USING (doc_id)
    """,
    "WAV/BMP container encode->decode round-trip; decoded stats vs pure-SQL recompute",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import decode_media_stats, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    return decode_media_stats(synthesize_media(docs, "doc_id"), "doc_id")


# ---------------------------------------------------------------------------
# Deterministic hashing embedder (V1 featurizer) — summary stats are
# oracle-checked (full vectors aren't comparable through the harness)
# ---------------------------------------------------------------------------

_EMBED_DIM = 64


def _embed_oracle() -> str:
    buckets = f"list_transform({TOKS_SQL}, tk -> {oracle_md5_int_sql('tk', 11)} % {_EMBED_DIM})"
    return f"""
WITH b AS (SELECT doc_id, {buckets} AS bk FROM documents),
c AS (
    SELECT doc_id,
           list_transform(range(0, {_EMBED_DIM}),
               i -> CAST(len(list_filter(bk, x -> x = i)) AS DOUBLE)) AS counts
    FROM b
),
n AS (
    SELECT doc_id, counts,
           sqrt(list_sum(list_transform(counts, x -> x * x))) AS nrm
    FROM c
),
e AS (
    SELECT doc_id,
           CASE WHEN nrm > 0 THEN list_transform(counts, x -> x / nrm)
                ELSE counts END AS emb
    FROM n
)
SELECT doc_id,
       len(list_filter(emb, x -> x > 0)) AS n_nonzero,
       list_aggregate(emb, 'max') AS top_value,
       list_position(emb, list_aggregate(emb, 'max')) AS top_bucket
FROM e
"""


@register(
    "text_embed",
    _embed_oracle(),
    "hashing featurizer (V1 stand-in): nonzero buckets, dominant bucket",
)
def q_text_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational formulation of the hashing featurizer stats: explode →
    bucket → two-level aggregate. Linear work, two shuffles on doc_id —
    the shape that scales (the nested-array expression version does
    O(dim) passes per derived column and falls out of codegen)."""
    from .operators.dedup import md5_int, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    buckets = toks.select(
        "doc_id", (md5_int(F.col("tok"), 11) % _EMBED_DIM).alias("bucket")
    )
    counts = buckets.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_nonzero"),
        (
            F.max("c").cast("double")
            / F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double"))
        ).alias("top_value"),
        # first index holding the max == smallest bucket (1-based, to
        # match array_position/list_position in the oracle)
        (F.max_by(F.col("bucket"), F.struct(F.col("c"), -F.col("bucket"))) + 1).alias(
            "top_bucket"
        ),
    )
    # zero-token docs produce no exploded rows but the oracle still
    # emits (0, 0.0, 1) for them — reattach with those defaults
    return docs.select("doc_id").join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_nonzero", F.lit(0).cast("long")).alias("n_nonzero"),
        F.coalesce("top_value", F.lit(0.0)).alias("top_value"),
        F.coalesce("top_bucket", F.lit(1).cast("long")).alias("top_bucket"),
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: MinHash pairs → connected components → canonical
# doc per cluster (the step that turns pair lists into a dedup decision)
# ---------------------------------------------------------------------------

def _clusters_oracle() -> str:
    pairs_sql = _minhash_oracle().strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
und AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.node
)
SELECT node, min(r) AS component FROM reach GROUP BY node
"""


@register(
    "dedup_clusters",
    _clusters_oracle(),
    "connected components over MinHash near-dup pairs (canonical per cluster)",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=_SHINGLE_N,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return connected_components(
        pairs, docs.select(F.col("doc_id").alias("node")), "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# End-to-end training-data prep pipeline (north-star composite):
# quality gate → exact dedup → MinHash near-dup clustering → survivors
# ---------------------------------------------------------------------------

def _training_pipeline_oracle() -> str:
    from .plans.training_pipeline import QUALITY_MIN, TOKENS_MIN

    quality = (
        f"0.5 * (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '{ALPHA_CLASS}', '', 'g')) AS DOUBLE) / length(text) END)"
        f" + 0.3 * (1.0 - (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE) / length(text) END))"
        f" + 0.2 * (CASE WHEN (CASE WHEN len({TOKS_SQL}) > 0 THEN CAST(length(regexp_replace(text, '{ALPHA_CLASS}', '', 'g')) AS DOUBLE)"
        f" / len({TOKS_SQL}) END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)"
    )
    return f"""
WITH RECURSIVE enriched AS (
    SELECT doc_id, lang, text,
           len({TOKS_SQL}) AS n_tokens,
           {quality} AS quality
    FROM documents
),
gated AS (
    SELECT * FROM enriched WHERE quality >= {QUALITY_MIN} AND n_tokens >= {TOKENS_MIN}
),
deduped AS (
    SELECT doc_id, lang, text, n_tokens, quality FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated
    ) WHERE rn = 1
),
{minhash_pairs_ctes('deduped')},
und AS (
    SELECT id_a AS src, id_b AS dst FROM mh_pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM mh_pairs
),
reach(node, r) AS (
    SELECT doc_id, doc_id FROM deduped
    UNION
    SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT d.doc_id, d.lang, d.n_tokens, d.quality
FROM deduped d JOIN comp c ON d.doc_id = c.node
WHERE c.node = c.component
"""


@register(
    "training_pipeline",
    _training_pipeline_oracle(),
    "end-to-end training-data prep: quality gate -> exact dedup -> MinHash clustering -> canonical survivors",
)
def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.training_pipeline import training_pipeline

    return training_pipeline(spark, sf_dir)


# ---------------------------------------------------------------------------
# Training-mix construction: per-source Bernoulli sampling at broadcast
# rates, content-derived keep decision (operators/topk.weighted_mix_sample).
# Rates are dyadic (k/2^n) so rate*2^48 is an exact integer on both
# engines (DuckDB rounds double->int, Spark truncates; integers agree).
# ---------------------------------------------------------------------------

_MIX_SEED = 5


@register(
    "mix_sampling",
    f"""
    WITH rates AS (
        SELECT source,
               CASE CAST(substr(source, 4) AS INTEGER) % 4
                   WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                   WHEN 2 THEN 0.25 ELSE 0.125 END AS rate
        FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d JOIN rates r USING (source)
    WHERE {oracle_md5_int_sql("CAST(doc_id AS VARCHAR)", 5)}
          < CAST(r.rate * CAST(281474976710656 AS DOUBLE) AS BIGINT)
    """,
    "training-mix sampling: per-source rates, deterministic content-hash keep",
)
def q_mix_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.topk import weighted_mix_sample

    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    rates = (
        docs.select("source")
        .distinct()
        .withColumn(
            "rate",
            F.when(src_num % 4 == 0, 1.0)
            .when(src_num % 4 == 1, 0.5)
            .when(src_num % 4 == 2, 0.25)
            .otherwise(0.125),
        )
    )
    out = weighted_mix_sample(docs, rates, "source", "doc_id", seed=_MIX_SEED)
    return out.select("doc_id", "source", "lang")


# ---------------------------------------------------------------------------
# Corpus vocabulary: global token frequency top-k with deterministic rank
# (functions/textstats.vocab_topk)
# ---------------------------------------------------------------------------

@register(
    "vocab_topk",
    f"""
    WITH toks AS (SELECT unnest({TOKS_SQL}) AS token FROM documents),
    counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    top AS (SELECT * FROM counts ORDER BY n DESC, token LIMIT 100)
    SELECT row_number() OVER (ORDER BY n DESC, token) AS rank, token, n
    FROM top
    """,
    "corpus vocabulary: global token counts, top-100 with rank",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    return vocab_topk(docs, "text", 100)


# ---------------------------------------------------------------------------
# LM-perplexity proxy (functions/textstats.token_surprisal): mean token
# self-information under the corpus's own unigram model — the cheap
# stand-in for perplexity-based quality filtering at crawl scale.
# ---------------------------------------------------------------------------

@register(
    "text_surprisal",
    f"""
    WITH {_POWS_CTE},
    toks AS (SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents),
    counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    tot AS (SELECT count(*) AS N FROM toks),
    lnn AS ({{LNN}}),
    lnt AS ({{LNT}}),
    per_doc AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               sum(l._ln_n_nanos) AS _sum_nanos
        FROM toks t JOIN counts c USING (token) JOIN lnn l ON l.n = c.n
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           CAST({{SNAP}} AS DOUBLE) / 10000.0 AS surprisal
    FROM per_doc CROSS JOIN lnt
    """.replace(
        "{LNN}",
        _sql_ln_select(
            "(SELECT DISTINCT n FROM counts) _dln",
            ["n"],
            {"a": "n"},
            [
                (
                    "_ln_n_nanos",
                    "CAST(floor(((_ln_a) * 1000000000.0) + 0.5) AS BIGINT)",
                )
            ],
        ),
    ).replace(
        "{LNT}",
        _sql_ln_select(
            "(SELECT greatest(N, 1) AS N FROM tot) _dlt",
            [],
            {"a": "N"},
            [
                (
                    "_ln_t_nanos",
                    "CAST(floor(((_ln_a) * 1000000000.0) + 0.5) AS BIGINT)",
                )
            ],
        ),
    ).replace(
        "{SNAP}",
        "CAST(floor(((CAST(lnt._ln_t_nanos * per_doc.n_tokens - per_doc._sum_nanos "
        "AS DOUBLE) / (CAST(per_doc.n_tokens AS DOUBLE) * 1000000000.0)) "
        "* 10000.0) + 0.5) AS BIGINT)",
    ),
    "per-doc mean token self-information under corpus unigram "
    "frequencies (portable ln + exact integer nano sums + floor snap — "
    "functions/portable_ln)",
)
def q_text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import token_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return token_surprisal(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# RAG-prep chunking (functions/textstats.chunk_documents): overlapping
# token windows, expression-only (no UDF, no shuffle)
# ---------------------------------------------------------------------------

_CHUNK_C, _CHUNK_S = 32, 24


@register(
    "chunk_documents",
    f"""
    WITH t AS (
        SELECT doc_id, {TOKS_SQL} AS toks, len({TOKS_SQL}) AS n
        FROM documents
    ),
    idx AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(greatest(n - {_CHUNK_C} + {_CHUNK_S} - 1, 0) // {_CHUNK_S} AS BIGINT) + 1)) AS chunk_idx
        FROM t WHERE n > 0
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(toks, chunk_idx * {_CHUNK_S} + 1, chunk_idx * {_CHUNK_S} + {_CHUNK_C}), ' ') AS chunk_text,
           CAST(len(list_slice(toks, chunk_idx * {_CHUNK_S} + 1, chunk_idx * {_CHUNK_S} + {_CHUNK_C})) AS INTEGER) AS n_chunk_tokens
    FROM idx
    """,
    "overlapping token-window chunks per document (RAG indexing prep)",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", _CHUNK_C, _CHUNK_S)


# ---------------------------------------------------------------------------
# Incremental (delta) dedup: incoming batch vs existing corpus
# (operators/dedup.incremental_dedup). The query splits documents by
# doc_id % 5 into existing (80%) / incoming (20%) and returns the
# incoming survivors after exact + cross-LSH matching against existing.
# ---------------------------------------------------------------------------

_INC_THRESHOLD = 0.5


def _cross_minhash_ctes(src_a: str, src_b: str, threshold: float) -> str:
    """CTE chain for cross-table MinHash-LSH pairs (id_a from src_a,
    id_b from src_b); final CTE is ``x_pairs``. Mirrors
    minhash_pairs_ctes but bands two relations and joins A×B."""
    from .operators.dedup import MINHASH_MOD, _mix_params

    base = f"({oracle_md5_int_sql('s', 0)} % {MINHASH_MOD})"
    mh_cols = ",\n        ".join(
        f"list_min(list_transform(sh, s -> ({_mix_params(k)[0]} * {base} + {_mix_params(k)[1]}) % {MINHASH_MOD})) AS mh_{k}"
        for k in range(_NUM_HASHES)
    )

    def bands_of(sig: str) -> str:
        return "\n    UNION ALL\n".join(
            f"    SELECT doc_id, sh, {b} AS band, "
            + " || '_' || ".join(
                f"CAST(mh_{b * _ROWS_PER_BAND + r} AS VARCHAR)" for r in range(_ROWS_PER_BAND)
            )
            + f" AS bucket FROM {sig}"
            for b in range(_BANDS)
        )

    return f"""xa_sh AS (
    SELECT doc_id, {shingles_sql(TOKS_SQL, _SHINGLE_N)} AS sh FROM {src_a}
),
xb_sh AS (
    SELECT doc_id, {shingles_sql(TOKS_SQL, _SHINGLE_N)} AS sh FROM {src_b}
),
xa_sigs AS (SELECT doc_id, sh, {mh_cols} FROM xa_sh),
xb_sigs AS (SELECT doc_id, sh, {mh_cols} FROM xb_sh),
xa_banded AS (
{bands_of('xa_sigs')}
),
xb_banded AS (
{bands_of('xb_sigs')}
),
xa_banded_g AS (
    -- oversized-bucket guard twin (operators/dedup.cap_bucket_size)
    SELECT * FROM xa_banded
    {cap_bucket_qualify_sql('band, bucket', DEFAULT_MAX_BUCKET)}
),
xb_banded_g AS (
    SELECT * FROM xb_banded
    {cap_bucket_qualify_sql('band, bucket', DEFAULT_MAX_BUCKET)}
),
x_cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM xa_banded_g a JOIN xb_banded_g b
      ON a.band = b.band AND a.bucket = b.bucket
),
x_pairs AS (
    SELECT c.id_a, c.id_b
    FROM x_cand c JOIN xa_sh x ON c.id_a = x.doc_id JOIN xb_sh y ON c.id_b = y.doc_id
    WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= {threshold}
)"""


def _incremental_oracle() -> str:
    return f"""
WITH existing AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
incoming AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
no_exact AS (
    SELECT i.* FROM incoming i
    WHERE md5(i.text) NOT IN (SELECT DISTINCT md5(text) FROM existing)
),
{_cross_minhash_ctes('existing', 'no_exact', _INC_THRESHOLD)}
SELECT doc_id, lang, source
FROM no_exact
WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM x_pairs)
"""


@register(
    "incremental_dedup",
    _incremental_oracle(),
    "delta dedup: incoming batch vs existing corpus (exact hash + cross-table MinHash-LSH)",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    out = incremental_dedup(
        existing, incoming, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=_SHINGLE_N,
        jaccard_threshold=_INC_THRESHOLD,
    )
    return out.select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Lexical retrieval: TF-IDF keyword extraction + BM25 search
# (functions/retrieval.py; the lexical side of the serving stack —
# reference serves vectors only via index.query, app.py:55-70)
# ---------------------------------------------------------------------------

_TFIDF_K = 3


@register(
    "tfidf_keywords",
    f"""
    WITH {_POWS_CTE},
    toks AS (SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS N FROM documents),
    lnidf AS ({{LNIDF}}),
    ranked AS (
        SELECT t.doc_id, t.token, t.tf, d.df,
               CAST({{SNAP}} AS DOUBLE) / 10000.0 AS tfidf,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY t.tf DESC, d.df ASC, t.token ASC) AS rank
        FROM tf t JOIN dfreq d USING (token) JOIN lnidf i USING (df)
    )
    SELECT doc_id, rank, token, tf, df, tfidf FROM ranked WHERE rank <= {_TFIDF_K}
    """.replace(
        "{LNIDF}",
        _sql_ln_select(
            "(SELECT DISTINCT d.df, n.N FROM dfreq d CROSS JOIN n) _din",
            ["df"],
            {"a": "N + 1", "b": "df + 1"},
            [("_lnidf", "_ln_a - _ln_b")],
        ),
    ).replace(
        "{SNAP}",
        "CAST(floor(((CAST(t.tf AS DOUBLE) * i._lnidf) * 10000.0) + 0.5) AS BIGINT)",
    ),
    "top-3 TF-IDF keywords per doc (integer rank key; WindowGroupLimit "
    "pushdown; portable idf + floor grid snap — functions/portable_ln)",
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.retrieval import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs, "doc_id", "text", k=_TFIDF_K)


_BM25_TERMS = ["spark", "join", "dup"]


def _bm25_scored_ctes(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB CTE chain mirroring functions/retrieval.bm25_scores.
    Non-binary-exact float literals (k1, k1+1) are forced to DOUBLE so
    decimal literal arithmetic can't diverge from Spark's doubles; the
    Robertson idf rides the portable ln chain over the integer ratio
    (2N+2)/(2df+1) — bit-identical to the Python that builds Spark's
    idf literal table — and the per-term grid snap is floor integer
    math (functions/portable_ln, r07 verdict #2)."""
    from .functions.portable_ln import (
        sql_grid_decimal,
        sql_grid_nanos,
        sql_ln_select,
    )

    terms_sql = ", ".join(f"'{t}'" for t in terms)
    lnidf = sql_ln_select(
        "(SELECT d.token, d.df, s.n_rows FROM dfreq d CROSS JOIN stats s) _din",
        ["token"],
        {"a": "(2 * n_rows) + 2", "b": "(2 * df) + 1"},
        [("_idf", "_ln_a - _ln_b")],
    )
    s_term = sql_grid_decimal(
        sql_grid_nanos(
            f"i._idf * ((t.tf * CAST({k1 + 1.0} AS DOUBLE))"
            f" / (t.tf + CAST({k1} AS DOUBLE) * (1.0 - {b} + {b} * t.dl / s.avgdl)))"
        ),
        28,
    )
    return f"""base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS N,
                     avg(CAST(len(toks) AS DOUBLE)) AS avgdl,
                     count(*) AS n_rows FROM base),
    matched AS (
        SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
               unnest(list_filter(toks, t -> list_contains([{terms_sql}], t))) AS token
        FROM base
    ),
    tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM matched GROUP BY doc_id, dl, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    lnidf AS ({lnidf}),
    per_term AS (
        SELECT t.doc_id,
               {s_term} AS s_term
        FROM tf t JOIN lnidf i USING (token), stats s
    ),
    scores AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
               CAST(sum(s_term) AS DOUBLE) AS bm25
        FROM per_term GROUP BY doc_id
    )"""


@register(
    "bm25_retrieval",
    f"""
    WITH {_POWS_CTE},
    {_bm25_scored_ctes(_BM25_TERMS)}
    SELECT doc_id, n_terms_matched, bm25
    FROM scores ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    "Okapi BM25 top-10 for a 3-term query (decimal-grid term sum: order-independent)",
)
def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=10)


# ---------------------------------------------------------------------------
# Multimodal resize: decode -> nearest-neighbor thumbnail -> channel
# sums; the oracle recomputes every resized pixel from the synthetic
# formula with pure integer SQL (no byte ever parsed oracle-side)
# ---------------------------------------------------------------------------

@register(
    "multimodal_resize",
    """
    WITH g AS (SELECT unnest(range(0, 8)) AS i),
    px AS (
        SELECT d.doc_id,
               (d.doc_id + 3 * ((gx.i * (4 + d.doc_id % 4)) // 8)
                         + 7 * ((gy.i * (3 + d.doc_id % 3)) // 8)) % 256 AS r,
               (2 * d.doc_id + 5 * ((gx.i * (4 + d.doc_id % 4)) // 8)
                             + ((gy.i * (3 + d.doc_id % 3)) // 8)) % 256 AS gch,
               (3 * d.doc_id + ((gx.i * (4 + d.doc_id % 4)) // 8)
                             + 11 * ((gy.i * (3 + d.doc_id % 3)) // 8)) % 256 AS b
        FROM documents d CROSS JOIN g gy CROSS JOIN g gx
    )
    SELECT doc_id, CAST(8 AS BIGINT) AS out_h, CAST(8 AS BIGINT) AS out_w,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(gch) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    "decode -> 8x8 nearest-neighbor resize -> channel sums vs integer-SQL recompute",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import resized_image_stats, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", modalities=("bmp",))
    return resized_image_stats(media, "doc_id", 8, 8)


# ---------------------------------------------------------------------------
# Train/val/test split assignment (operators/topk.split_assign):
# content-hash buckets -> stable splits, no leakage on corpus growth
# ---------------------------------------------------------------------------

_SPLIT_SEED = 3


@register(
    "dataset_split",
    f"""
    WITH assigned AS (
        SELECT source,
               CASE WHEN {oracle_md5_int_sql("CAST(doc_id AS VARCHAR)", _SPLIT_SEED)} % 10 < 8 THEN 'train'
                    WHEN {oracle_md5_int_sql("CAST(doc_id AS VARCHAR)", _SPLIT_SEED)} % 10 < 9 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, source, count(*) AS n_docs
    FROM assigned GROUP BY split, source
    """,
    "deterministic 80/10/10 content-hash split: per (split, source) counts",
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.topk import split_assign

    docs = load_table(spark, sf_dir, "documents")
    assigned = split_assign(
        docs, "doc_id", {"train": 8, "val": 1, "test": 1}, seed=_SPLIT_SEED
    )
    return assigned.groupBy("split", "source").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# Corpus-level boilerplate chunk removal (functions/textstats.boilerplate_scrub)
# ---------------------------------------------------------------------------

_BP_K = 6
_BP_MIN = 3

BOILERPLATE_ORACLE = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
ch AS (
    SELECT doc_id,
           CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[]) ELSE
             list_transform(range(0, CAST((len(t) + {_BP_K - 1}) // {_BP_K} AS BIGINT)),
                            i -> array_to_string(t[i*{_BP_K}+1 : i*{_BP_K}+{_BP_K}], ' '))
           END AS cs
    FROM toks
),
ex AS (SELECT unnest(cs) AS c FROM ch),
bp AS (SELECT md5(c) AS h FROM ex GROUP BY md5(c) HAVING count(*) >= {_BP_MIN}),
bpl AS (SELECT coalesce(list(h ORDER BY h), CAST([] AS VARCHAR[])) AS l FROM bp)
SELECT ch.doc_id,
       coalesce(array_to_string(list_filter(cs, c -> NOT list_contains(l, md5(c))), ' '), '') AS clean_text,
       CAST(len(cs) AS BIGINT) AS n_chunks,
       CAST(len(cs) - len(list_filter(cs, c -> NOT list_contains(l, md5(c)))) AS BIGINT) AS n_removed
FROM ch, bpl
"""


@register(
    "boilerplate_scrub",
    BOILERPLATE_ORACLE,
    "corpus-level boilerplate removal: drop 6-token chunks occurring >= 3 times, reassemble",
)
def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import boilerplate_scrub

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_scrub(docs, "doc_id", "text", chunk_tokens=_BP_K, min_count=_BP_MIN)


# ---------------------------------------------------------------------------
# In-engine Naive-Bayes classifier (functions/classify): train on the
# labeled corpus, score it back, emit the confusion matrix
# ---------------------------------------------------------------------------

_NB_CLASSES = ["de", "en", "es", "fr", "zh"]


def _nb_oracle(classes: list[str], final: str | None = None) -> str:
    # Portable ln (functions/portable_ln): every log-likelihood is the
    # fixed-form IEEE chain over integer terms, bit-identical to the
    # Python that builds Spark's literal tables (r07 verdict #2):
    #   lp = snap(ln(_c+1) - ln(_t+_V)); un = snap(0.0 - ln(_t+_V));
    #   pr = snap(ln(_nd) - ln(_nd_all))
    from .functions.portable_ln import (
        POWS_CTE,
        sql_grid_decimal,
        sql_grid_nanos,
        sql_ln_select,
    )

    dec = "DECIMAL(18,9)"
    lnc_sel = sql_ln_select(
        "(SELECT DISTINCT _c FROM tc) _dlc", ["_c"], {"a": "_c + 1"}, [("_lnc", "_ln_a")]
    )
    lnt_sel = sql_ln_select(
        "(SELECT _y, _t + _V AS _tv FROM totals CROSS JOIN vocab) _dlt",
        ["_y"],
        {"a": "_tv"},
        [("_lnt", "_ln_a")],
    )
    lp_val = sql_grid_decimal(sql_grid_nanos("lc._lnc - lt._lnt"))
    un_val = sql_grid_decimal(sql_grid_nanos("0.0 - lt._lnt"))
    lp = ",\n       ".join(
        f"max(CASE WHEN tc._y='{c}' THEN {lp_val} END) AS lp_{c}" for c in classes
    )
    un = ",\n       ".join(
        f"max(CASE WHEN totals._y='{c}' THEN {un_val} END) AS un_{c}"
        for c in classes
    )
    nd = ",\n       ".join(
        f"max(CASE WHEN totals._y='{c}' THEN _nd END) AS _nd_{c}" for c in classes
    )
    pr_sel = sql_ln_select(
        "stats0",
        [f"un_{c}" for c in classes] + [f"_nd_{c}" for c in classes],
        {f"n{c}": f"_nd_{c}" for c in classes} | {"nall": "_nd_all"},
        [
            (
                f"pr_{c}",
                sql_grid_decimal(sql_grid_nanos(f"_ln_n{c} - _ln_nall")),
            )
            for c in classes
        ],
    )
    sm = ",\n       ".join(
        f"sum(lp_{c}) AS s_{c}, count(lp_{c}) AS m_{c}" for c in classes
    )
    tot = ",\n       ".join(
        f"coalesce(s_{c}, CAST(0 AS {dec})) + (_n - m_{c})*un_{c} + pr_{c} AS t_{c}"
        for c in classes
    )
    g = ", ".join(f"t_{c}" for c in classes)
    case = " ".join(f"WHEN t_{c} = g THEN '{c}'" for c in classes)
    return f"""
WITH {POWS_CTE},
toks AS (SELECT doc_id, lang AS _y, unnest({TOKS_SQL}) AS token FROM documents),
tc AS (SELECT _y, token, count(*) AS _c FROM toks GROUP BY 1, 2),
totals AS (SELECT _y, sum(_c) AS _t FROM tc GROUP BY 1),
vocab AS (SELECT count(DISTINCT token) AS _V FROM tc),
lnc AS ({lnc_sel}),
lnt AS ({lnt_sel}),
model AS (
    SELECT token,
       {lp}
    FROM tc
    JOIN lnc lc ON lc._c = tc._c
    JOIN lnt lt ON lt._y = tc._y
    GROUP BY token
),
ndocs AS (SELECT lang AS _y, count(*) AS _nd FROM documents GROUP BY 1),
stats0 AS (
    SELECT {un},
       {nd},
       sum(_nd) AS _nd_all
    FROM totals
    JOIN ndocs ON ndocs._y = totals._y
    JOIN lnt lt ON lt._y = totals._y
),
stats AS ({pr_sel}),
scored AS (
    SELECT doc_id, _y, count(*) AS _n,
       {sm}
    FROM toks LEFT JOIN model USING (token) GROUP BY 1, 2
),
tot AS (
    SELECT doc_id, _y,
       {tot}
    FROM scored CROSS JOIN stats
),
pred AS (
    SELECT _y, CASE {case} END AS predicted
    FROM (SELECT *, greatest({g}) AS g FROM tot)
)
{final or "SELECT _y AS lang, predicted, count(*) AS n_docs FROM pred GROUP BY 1, 2"}
"""


@register(
    "nb_classifier",
    _nb_oracle(_NB_CLASSES),
    "in-engine multinomial Naive Bayes: train per-lang token log-likelihoods, "
    "score the corpus back, confusion matrix",
)
def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.classify import nb_confusion
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return nb_confusion(docs, "doc_id", "lang", "text", _NB_CLASSES)


def _nb_calibration_oracle() -> str:
    cap = 10
    unp = "\n        UNION ALL ".join(
        f"SELECT doc_id, _y, '{c}' AS cls, t_{c} AS t FROM tot"
        for c in _NB_CLASSES
    )
    final = f""",
unp AS (
        {unp}
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY t DESC, cls) AS _rk
    FROM unp
),
top2 AS (
    SELECT doc_id, _y,
           max(CASE WHEN _rk = 1 THEN t END) AS t1,
           max(CASE WHEN _rk = 1 THEN cls END) AS c1,
           max(CASE WHEN _rk = 2 THEN t END) AS t2
    FROM rk WHERE _rk <= 2 GROUP BY 1, 2
)
SELECT least({cap}, CAST(floor(t1 - t2) AS INTEGER)) AS margin_band,
       count(*) AS n_docs,
       count(CASE WHEN c1 = _y THEN 1 END) AS n_correct
FROM top2 GROUP BY 1"""
    return _nb_oracle(_NB_CLASSES, final=final)


@register(
    "nb_calibration",
    _nb_calibration_oracle(),
    "classifier reliability bands: per top1-top2 margin band (whole nats, "
    "capped at 10), document count and correct count",
)
def q_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.classify import nb_margin_calibration
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return nb_margin_calibration(docs, "doc_id", "lang", "text", _NB_CLASSES)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture (operators/topk.temperature_mix_rates):
# data-dependent per-source rates at alpha=0.5, realized by the same
# content-hash Bernoulli sampler as mix_sampling
# ---------------------------------------------------------------------------

_TMIX_SEED = 7

TEMPERATURE_MIX_ORACLE = f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
cs AS (SELECT source, n, {_sql_grid_decimal(_sql_grid_nanos("sqrt(n)"), 28, 9)} AS sq FROM counts),
tot AS (SELECT sum(sq) AS s_all, sum(n) AS n_all FROM cs),
rates AS (
    SELECT source, n,
           least(CAST(1.0 AS DOUBLE),
                 floor(1048576.0 * ((n_all * 0.5 / n) * (CAST(sq AS DOUBLE) / CAST(s_all AS DOUBLE))))
                 / 1048576.0) AS rate
    FROM cs CROSS JOIN tot
),
kept AS (
    SELECT d.source, count(*) AS n_kept
    FROM documents d JOIN rates r USING (source)
    WHERE {oracle_md5_int_sql("CAST(doc_id AS VARCHAR)", 7)}
          < CAST(r.rate * CAST(281474976710656 AS DOUBLE) AS BIGINT)
    GROUP BY 1
)
SELECT r.source, r.n AS n_total, r.rate, coalesce(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k USING (source)
"""


@register(
    "temperature_mix",
    TEMPERATURE_MIX_ORACLE,
    "temperature-scaled (alpha=0.5) source mixture: data-dependent dyadic rates + content-hash sampling",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.topk import temperature_mix_rates, weighted_mix_sample

    docs = load_table(spark, sf_dir, "documents")
    rates = temperature_mix_rates(docs, "source", budget_frac=0.5)
    kept = (
        weighted_mix_sample(docs, rates.select("source", "rate"), "source", "doc_id", seed=_TMIX_SEED)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_total"),
            "rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Intra-document chunk dedup (functions/textstats.dedup_intra_doc)
# ---------------------------------------------------------------------------

_INTRA_K = 2  # bigram chunks: the synthetic corpus repeats at this granularity

INTRA_DOC_ORACLE = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
ch AS (
    SELECT doc_id,
           CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[]) ELSE
             list_transform(range(0, CAST((len(t) + {_INTRA_K - 1}) // {_INTRA_K} AS BIGINT)),
                            i -> array_to_string(t[i*{_INTRA_K}+1 : i*{_INTRA_K}+{_INTRA_K}], ' '))
           END AS cs
    FROM toks
),
kept AS (
    SELECT doc_id, cs, list_filter(cs, (c, i) -> list_position(cs, c) = i) AS ks
    FROM ch
)
SELECT doc_id,
       coalesce(array_to_string(ks, ' '), '') AS clean_text,
       CAST(len(cs) AS BIGINT) AS n_chunks,
       CAST(len(cs) - len(ks) AS BIGINT) AS n_removed
FROM kept
"""


@register(
    "intra_doc_dedup",
    INTRA_DOC_ORACLE,
    "within-document repetition scrub: drop repeated 6-token chunks, keep first occurrence",
)
def q_intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import dedup_intra_doc
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return dedup_intra_doc(docs, "doc_id", "text", chunk_tokens=_INTRA_K)


# ---------------------------------------------------------------------------
# Per-source quality cap (operators/topk.group_cap)
# ---------------------------------------------------------------------------

_CAP_N = 10

DOMAIN_CAP_ORACLE = f"""
WITH q AS (SELECT doc_id, source, {_QUALITY_SQL} AS quality FROM documents)
SELECT source, doc_id, quality FROM (
    SELECT source, doc_id, quality,
           row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn
    FROM q
) WHERE rn <= {_CAP_N}
"""


@register(
    "domain_cap",
    DOMAIN_CAP_ORACLE,
    f"per-source cap: keep the top-{_CAP_N} docs per source by quality (WindowGroupLimit shape)",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.topk import group_cap

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source", quality_score(F.col("text")).alias("quality"))
    return group_cap(
        scored, "source", [F.col("quality").desc(), F.col("doc_id")], _CAP_N
    ).select("source", "doc_id", "quality")


# ---------------------------------------------------------------------------
# BPE merge-pair counting (functions/textstats.bpe_pair_counts)
# ---------------------------------------------------------------------------

BPE_PAIRS_ORACLE = f"""
WITH words AS (SELECT unnest({TOKS_SQL}) AS w FROM documents),
pairs AS (
    SELECT unnest(list_transform(range(1, greatest(length(w) - 1, 0) + 1),
                                 i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
    FROM words
)
SELECT pair, count(*) AS n FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20
"""


@register(
    "bpe_pairs",
    BPE_PAIRS_ORACLE,
    "BPE tokenizer-training iteration: top-20 adjacent character-pair counts corpus-wide",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import bpe_pair_counts
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return bpe_pair_counts(docs, "text", k=20)


# ---------------------------------------------------------------------------
# Corpus data card: per-(lang, source) reporting rollup
# ---------------------------------------------------------------------------

CORPUS_DATACARD_ORACLE = f"""
WITH hashes AS (SELECT md5(text) AS h, count(*) AS hc FROM documents GROUP BY 1),
base AS (
    SELECT d.lang, d.source,
           len({TOKS_SQL}) AS n_toks,
           {_sql_grid_decimal(_sql_grid_nanos(_QUALITY_SQL), 18, 9)} AS q,
           CASE WHEN h.hc >= 2 THEN 1 ELSE 0 END AS is_dup
    FROM documents d JOIN hashes h ON md5(d.text) = h.h
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       sum(q) AS sum_quality,
       CAST(sum(is_dup) AS BIGINT) AS n_exact_dup_docs
FROM base GROUP BY lang, source
"""


@register(
    "corpus_datacard",
    CORPUS_DATACARD_ORACLE,
    "per-(lang, source) data card: docs, tokens, decimal-exact quality sum, corpus-wide dup flags",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reporting rollup a corpus release ships (data cards /
    datasheets): group sizes, token budget, quality mass, and how much
    of each slice is an exact duplicate of something else in the
    corpus. Per-doc quality rounds onto a 9-dp decimal grid so the
    group sums are aggregation-order-independent; the dup flag joins
    the (hash, count) table back by hash — both exchanges carry
    aggregate-sized rows, never text."""
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    hashes = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.count(F.lit(1)).alias("_hc"))
    )
    base = (
        docs.select(
            "lang",
            "source",
            token_count(F.col("text")).cast("long").alias("_nt"),
            _grid_decimal_col(_grid_nanos_col(quality_score(F.col("text"))), 18, 9).alias("_q"),
            F.md5("text").alias("_h"),
        )
        .join(hashes, "_h")
        .withColumn("_dup", F.when(F.col("_hc") >= 2, 1).otherwise(0))
    )
    return base.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.sum("_q").cast("decimal(38,9)").alias("sum_quality"),
        F.sum("_dup").cast("long").alias("n_exact_dup_docs"),
    )


# ---------------------------------------------------------------------------
# Dedup observability: cluster-size histogram + per-doc novelty signal
# ---------------------------------------------------------------------------

DEDUP_STATS_ORACLE = """
WITH g AS (
    SELECT md5(text) AS h, count(*) AS n_copies FROM documents GROUP BY md5(text)
)
SELECT n_copies, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n_copies) AS BIGINT) AS n_docs
FROM g GROUP BY n_copies
"""


@register(
    "dedup_stats",
    DEDUP_STATS_ORACLE,
    "dedup report: histogram of exact-duplicate cluster sizes (groups + docs per size)",
)
def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over the exact-dedup groups — the
    one-line dedup report a curation run publishes (how much mass sits
    in how-big duplicate clusters). Two cheap aggregations: the md5
    group shuffle exact_dedup already pays, then a histogram over the
    GROUPS table (≤ one row per distinct content — tiny)."""
    docs = load_table(spark, sf_dir, "documents")
    groups = exact_dedup(docs, "text", "doc_id")
    return (
        groups.groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
        )
    )


def _novelty_oracle(shingle_n: int = 3) -> str:
    return f"""
WITH sh_t AS (
    SELECT doc_id, {shingles_sql(TOKS_SQL, shingle_n)} AS sh FROM documents
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh_t),
dfreq AS (SELECT s, count(*) AS df_n FROM ex GROUP BY s),
per AS (
    SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN d.df_n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           sum(d.df_n) AS sum_df
    FROM ex e JOIN dfreq d ON e.s = d.s GROUP BY e.doc_id
)
SELECT doc_id, n_shingles, n_unique,
       CAST(n_unique AS DOUBLE) / n_shingles AS novelty,
       CAST(sum_df AS DOUBLE) / n_shingles AS mean_df
FROM per
"""


@register(
    "doc_novelty",
    _novelty_oracle(),
    "per-doc novelty: fraction of corpus-unique word-trigrams + mean shingle document frequency",
)
def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty scoring — the curation signal behind
    'keep documents that add new content' sampling: the fraction of a
    doc's trigrams appearing nowhere else, and the mean corpus
    document-frequency of its trigrams. Same inverted-index shape the
    prefix-filter dedup uses: one shingle-keyed shuffle for df, one
    doc-keyed aggregation back — linear at any corpus size, no pair
    generation at all. Ratios are single BIGINT-exact-sum → one double
    division, deterministic on both engines."""
    from .operators.dedup import tokenize as ws_tokenize
    from .operators.dedup import word_shingles
    from .sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    sh_t = spread(docs).select(
        F.col("doc_id"),
        word_shingles(ws_tokenize(F.col("text")), 3).alias("sh"),
    )
    ex = sh_t.select("doc_id", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df_n"))
    per = (
        ex.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df_n") == 1, 1).otherwise(0)).cast("bigint").alias("n_unique"),
            F.sum("df_n").alias("_sum_df"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_unique",
        (F.col("n_unique").cast("double") / F.col("n_shingles")).alias("novelty"),
        (F.col("_sum_df").cast("double") / F.col("n_shingles")).alias("mean_df"),
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher/Dolma-style repetitious-text quality rules)
# ---------------------------------------------------------------------------

REPETITION_ORACLE = f"""
WITH base AS (
    SELECT doc_id, {TOKS_SQL} AS toks FROM documents
),
sized AS (
    SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
           list_transform(range(1, greatest(len(toks)-1, 0)+1),
                          i -> toks[i] || ' ' || toks[i+1]) AS bgs
    FROM base
),
cnt AS (
    SELECT doc_id, bg, count(*) AS c
    FROM (SELECT doc_id, unnest(bgs) AS bg FROM sized)
    GROUP BY doc_id, bg
),
agg AS (
    SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bigrams,
           sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_bg
    FROM cnt GROUP BY doc_id
)
SELECT s.doc_id,
       s.n_tokens,
       CAST(s.n_tokens - s.n_distinct AS DOUBLE) / s.n_tokens AS dup_token_frac,
       coalesce(a.top_cnt, 0) AS top_bigram_count,
       CASE WHEN coalesce(a.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(a.top_cnt AS DOUBLE) / a.n_bigrams END AS top_bigram_frac,
       CASE WHEN coalesce(a.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(a.dup_bg AS DOUBLE) / a.n_bigrams END AS dup_bigram_frac
FROM sized s LEFT JOIN agg a ON s.doc_id = a.doc_id
WHERE s.n_tokens > 0
"""


@register(
    "repetition_signals",
    REPETITION_ORACLE,
    "Gopher-style repetition quality rules: duplicate-token fraction, top/duplicated word-bigram fractions",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetitious-text screening signals (the Gopher quality-rule
    family a training-data pipeline filters on): per doc, the fraction
    of repeated tokens, the most-frequent word-bigram's share of all
    bigram instances, and the share of bigram instances whose bigram
    occurs more than once. NON-distinct bigrams (unlike the dedup
    shingles — repetition is exactly what distinct would erase), built
    by zipping two shifted slices of the token array. One (doc, bigram)
    shuffle + one doc-keyed aggregation — linear at corpus scale, no
    pair generation. Every fraction is an exact-integer numerator /
    denominator pair divided once, so both engines produce the same
    IEEE doubles."""
    from .operators.dedup import tokenize as ws_tokenize
    from .sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    base = (
        spread(docs)
        .select(F.col("doc_id"), ws_tokenize(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct"),
            F.zip_with(
                F.slice("toks", 1, m),
                F.slice("toks", 2, m),
                lambda a, b: F.concat_ws(" ", a, b),
            ).alias("bgs"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    cnt = (
        base.select("doc_id", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.max("c").alias("top_cnt"),
        F.sum("c").alias("n_bigrams"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_bg"),
    )
    n_bg = F.coalesce(F.col("n_bigrams"), F.lit(0))
    return (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                (F.col("n_tokens") - F.col("n_distinct")).cast("double")
                / F.col("n_tokens")
            ).alias("dup_token_frac"),
            F.coalesce(F.col("top_cnt"), F.lit(0)).cast("long").alias("top_bigram_count"),
            F.when(n_bg == 0, F.lit(0.0))
            .otherwise(F.col("top_cnt").cast("double") / F.col("n_bigrams"))
            .alias("top_bigram_frac"),
            F.when(n_bg == 0, F.lit(0.0))
            .otherwise(F.col("dup_bg").cast("double") / F.col("n_bigrams"))
            .alias("dup_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-aware canonical selection (keep-longest per near-dup cluster)
# ---------------------------------------------------------------------------

def _keep_longest_oracle() -> str:
    pairs_sql = _minhash_oracle().strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
und AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
scored AS (
    SELECT d.doc_id, c.component, len({TOKS_SQL}) AS n_tokens
    FROM documents d JOIN comp c ON d.doc_id = c.node
)
SELECT doc_id, component, n_tokens FROM scored
QUALIFY row_number() OVER (
    PARTITION BY component ORDER BY n_tokens DESC, doc_id ASC) = 1
"""


@register(
    "dedup_keep_longest",
    _keep_longest_oracle(),
    "quality-aware canonical per near-dup cluster: keep the longest member (ties -> lowest id)",
)
def q_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-policy canonical selection: within each MinHash near-dup
    cluster keep the member with the MOST tokens (the common 'longest
    version wins' policy — near-dups are frequently truncations of one
    another), deterministic tie-break by lowest doc_id. dedup_clusters'
    min-id canonical is arbitrary; this one is content-ranked. Shape on
    top of the attested components: one doc-keyed join to attach the
    score, then a per-cluster max-struct aggregate — the top-1 of a
    cluster never needed a rank window (r12 opt, 0.92×: partial
    aggregation collapses each cluster to one row per map task BEFORE
    the exchange and the Sort+Window disappears; the nb_calibration
    precedent). Lexicographic max of (n_tokens, −doc_id) IS the
    (n_tokens DESC, doc_id ASC) rank-1 row."""
    from .operators.dedup import connected_components, tokenize

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=_SHINGLE_N,
        jaccard_threshold=_MH_THRESHOLD,
    )
    comp = connected_components(
        pairs, docs.select(F.col("doc_id").alias("node")), "id_a", "id_b"
    )
    scored = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_tokens")
    ).join(comp, F.col("doc_id") == F.col("node"))
    return (
        scored.groupBy("component")
        .agg(
            F.max(
                F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("_nid"))
            ).alias("_m")
        )
        .select(
            (-F.col("_m._nid")).alias("doc_id"),
            "component",
            F.col("_m.n_tokens").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Late-interaction retrieval (ColBERT-style MaxSim over chunk vectors)
# ---------------------------------------------------------------------------

_MAXSIM_CH = 16  # tokens per chunk


def _maxsim_oracle() -> str:
    # NB: the md5 twin uses an internal lambda variable named `i`;
    # the outer position variable must not collide with it
    bucket = oracle_md5_int_sql("toks[tpos]", 11)
    return f"""
WITH b0 AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
bk0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS tpos FROM b0),
bk AS (
    SELECT doc_id, CAST((tpos - 1) // {_MAXSIM_CH} AS BIGINT) AS chunk_id,
           {bucket} % {_EMBED_DIM} AS bucket
    FROM bk0
),
cnt AS (
    SELECT doc_id, chunk_id, bucket, count(*) AS c
    FROM bk GROUP BY doc_id, chunk_id, bucket
),
nrm AS (
    SELECT doc_id, chunk_id, sum(c * c) AS sq
    FROM cnt GROUP BY doc_id, chunk_id
),
qcnt AS (SELECT chunk_id AS qc, bucket, c AS qv FROM cnt WHERE doc_id = 0),
qnrm AS (SELECT chunk_id AS qc, sq AS qsq FROM nrm WHERE doc_id = 0),
dots AS (
    SELECT d.doc_id, d.chunk_id, q.qc, sum(d.c * q.qv) AS num
    FROM cnt d JOIN qcnt q ON d.bucket = q.bucket
    WHERE d.doc_id <> 0
    GROUP BY d.doc_id, d.chunk_id, q.qc
),
sims AS (
    SELECT t.doc_id, t.qc,
           max(CAST(t.num AS DOUBLE) / (sqrt(n.sq) * sqrt(qn.qsq))) AS best
    FROM dots t
    JOIN nrm n ON t.doc_id = n.doc_id AND t.chunk_id = n.chunk_id
    JOIN qnrm qn ON t.qc = qn.qc
    GROUP BY t.doc_id, t.qc
),
scored AS (
    SELECT doc_id,
           list_reduce(list_transform(list(best ORDER BY qc), x -> x),
                       (a, x) -> a + x) AS score
    FROM sims GROUP BY doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""


@register(
    "maxsim_retrieval",
    _maxsim_oracle(),
    "ColBERT-style MaxSim late interaction: sum over query chunks of best chunk cosine, top-10 docs",
)
def q_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval: documents and the query (doc 0
    stands in) split into {ch}-token chunks, each chunk hashed into the
    {dim}-bucket featurizer space; score(doc) = sum over QUERY chunks
    of the best cosine against any DOC chunk (MaxSim). Entirely
    relational/SPARSE — bucket counts join on bucket id for the dot
    products, so no dense vectors are materialized and every stage is a
    hash join or partial-aggregated groupBy on (doc, chunk) keys: the
    shape that scales to a token-embedding table far larger than any
    executor. Determinism: dot-product numerators are exact BIGINT
    sums; each similarity does one sqrt-multiply-divide on exact
    integers; the per-doc sum folds the per-query-chunk maxima in
    qchunk order (identical IEEE association on both engines).
    """.format(ch=_MAXSIM_CH, dim=_EMBED_DIM)
    from .operators.dedup import md5_int, tokenize

    from .operators.dedup import _INTERMEDIATES
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok_ex = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tok")
    )
    cnt = (
        tok_ex.select(
            "doc_id",
            (F.col("pos") / _MAXSIM_CH).cast("bigint").alias("chunk_id"),
            (md5_int(F.col("tok"), 11) % _EMBED_DIM).alias("bucket"),
        )
        .groupBy("doc_id", "chunk_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        # the bucket-count table feeds FOUR plan branches (nrm, the
        # query-side slices qcnt/qnrm, and the dot-product join): the
        # unpersisted form re-ran the tokenize+posexplode+md5 subtree
        # per branch — 4 corpus scans in the executed plan
        # (plans/r11/maxsim_retrieval_before.txt). One materialized
        # (doc, chunk, bucket) table is corpus-token-bounded and at
        # cluster scale is exactly the intermediate a ColBERT indexer
        # would persist.
        .persist()
    )
    # retire the previous query's tracked intermediates; track cnt so
    # the next registry query retires it (the shared janitor discipline)
    _INTERMEDIATES.rollover([cnt])
    nrm = cnt.groupBy("doc_id", "chunk_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("sq")
    )
    qcnt = cnt.filter(F.col("doc_id") == 0).select(
        F.col("chunk_id").alias("qc"), "bucket", F.col("c").alias("qv")
    )
    qnrm = nrm.filter(F.col("doc_id") == 0).select(
        F.col("chunk_id").alias("qc"), F.col("sq").alias("qsq")
    )
    dots = (
        cnt.filter(F.col("doc_id") != 0)
        .join(F.broadcast(qcnt), "bucket")
        .groupBy("doc_id", "chunk_id", "qc")
        .agg(F.sum(F.col("c") * F.col("qv")).alias("num"))
    )
    sims = (
        dots.join(nrm, ["doc_id", "chunk_id"])
        .join(F.broadcast(qnrm), "qc")
        .groupBy("doc_id", "qc")
        .agg(
            F.max(
                F.col("num").cast("double")
                / (F.sqrt(F.col("sq").cast("double")) * F.sqrt(F.col("qsq").cast("double")))
            ).alias("best")
        )
    )
    scored = sims.groupBy("doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("qc", "best"))),
                lambda x: x["best"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(10)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
# MOSS local fingerprinting algorithm)
# ---------------------------------------------------------------------------

_WIN_K = 3   # tokens per k-gram
_WIN_W = 4   # hashes per winnowing window


def _winnow_oracle() -> str:
    # NB: oracle_md5_int_sql's internal lambda variable is `i` — outer
    # lambda variables here are g/p/o to avoid capture
    # nibbles=10 (40-bit hashes): the tie-break encoding multiplies by
    # 2^16, and 40+16 bits stays inside BIGINT on both engines
    h = oracle_md5_int_sql(
        "toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2]", 17, 10
    )
    w = _WIN_W
    return f"""
WITH b0 AS (
    SELECT doc_id, {TOKS_SQL} AS toks FROM documents
),
hs0 AS (
    SELECT doc_id,
           list_transform(range(1, greatest(len(toks) - {_WIN_K - 1}, 0) + 1),
                          g -> {h}) AS hs
    FROM b0
),
win AS (
    SELECT doc_id, hs, len(hs) AS m
    FROM hs0 WHERE len(hs) >= {w}
),
keys AS (
    -- per window: min over (hash * 2^16 + (w-1-offset)) — ties on the
    -- hash pick the RIGHTMOST element, the winnowing tie rule
    SELECT doc_id, m,
           list_transform(range(0, m - {w} + 1),
               p -> {{'p': p, 'k': list_min(list_transform(range(0, {w}),
                         o -> hs[p + o + 1] * 65536 + ({w} - 1 - o)))}}) AS wk
    FROM win
),
fps AS (
    -- fingerprint (pos, h) packed into one BIGINT (h*2^16 + pos):
    -- list_distinct over structs is unsupported in DuckDB, and the
    -- packing is a bijection (pos < 2^16)
    SELECT doc_id, m,
           list_distinct(list_transform(wk,
               e -> (e.k // 65536) * 65536
                    + (e.p + ({w} - 1) - e.k % 65536))) AS fp
    FROM keys
)
SELECT doc_id,
       m AS n_kgrams,
       len(fp) AS n_fingerprints,
       CAST(len(fp) AS DOUBLE) / (m - {w} + 1) AS density,
       list_min(list_transform(fp, f -> f // 65536)) AS min_fp
FROM fps
"""


@register(
    "winnowing_fingerprints",
    _winnow_oracle(),
    "MOSS winnowing: windowed local-minimum k-gram fingerprints (guaranteed match coverage)",
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    {k}-token k-gram, slide a {w}-hash window, keep each window's
    minimum hash with RIGHTMOST tie-break — the published guarantee
    that any shared substring of >= w+k-1 tokens yields a shared
    fingerprint, which positional/stride sampling cannot promise.
    The tie rule is encoded arithmetically (hash*2^16 + (w-1-offset),
    take the min) so selection is one integer array fold per window —
    identical exact integers on both engines; per-doc cost O(m*w) with
    w = {w}. Emits per-doc fingerprint stats; the fingerprint set is
    the cross-doc join key for plagiarism/near-dup matching at corpus
    scale (delta-sized vs all k-grams: density ~ 2/(w+1)).
    """.format(k=_WIN_K, w=_WIN_W)
    from pyspark.sql import Window

    from .operators.dedup import md5_int, tokenize
    from .sources.tables import spread

    w = _WIN_W
    docs = spread(load_table(spark, sf_dir, "documents"))
    # relational formulation: the nested higher-order-function version
    # (transform over sequence per window) evaluates INTERPRETED per
    # element (~2 ms/doc measured at sf0.1); lead-window k-grams plus a
    # rolling-frame min stay JVM-side and linear in the token stream.
    tok_ex = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("g", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("g")
    kg = (
        tok_ex.withColumn("t1", F.lead("tok", 1).over(wd))
        .withColumn("t2", F.lead("tok", 2).over(wd))
        .filter(F.col("t2").isNotNull())
        .select(
            "doc_id",
            "g",
            md5_int(F.concat_ws(" ", "tok", "t1", "t2"), 17, 10).alias("h"),
        )
    )
    # rolling-window min with the winnowing tie rule folded into ONE
    # frame-independent monotone key: min of (h*2^16 - g) picks the
    # smallest hash and, on hash ties, the RIGHTMOST position (larger g
    # -> smaller key); h and g decode back exactly since g < 2^16
    wroll = Window.partitionBy("doc_id").orderBy("g").rowsBetween(0, w - 1)
    wcnt = Window.partitionBy("doc_id")
    keyed = kg.withColumn("_key", F.col("h") * 65536 - F.col("g")).withColumn(
        "m", F.count(F.lit(1)).over(wcnt)
    )
    # integer shifts, not double division: codes reach 2^56 and
    # doubles lose exactness past 2^53
    h_dec = F.shiftright(F.col("_wmin") + 65535, 16)
    wins = (
        keyed.withColumn("_wmin", F.min("_key").over(wroll))
        # only positions that start a FULL w-hash window
        .filter(F.col("g") <= F.col("m") - w)
        # decode (h, pos) and repack as the canonical fingerprint code
        # h*2^16 + pos — the oracle's packing
        .select(
            "doc_id",
            "m",
            (h_dec * 65536 + (h_dec * 65536 - F.col("_wmin"))).alias("code"),
        )
    )
    return (
        wins.groupBy("doc_id", "m")
        .agg(
            F.countDistinct("code").alias("n_fingerprints"),
            F.min(F.shiftright(F.col("code"), 16)).alias("_min_fp"),
        )
        .select(
            "doc_id",
            F.col("m").alias("n_kgrams"),
            "n_fingerprints",
            (F.col("n_fingerprints").cast("double") / (F.col("m") - w + 1)).alias("density"),
            F.col("_min_fp").alias("min_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Stupid-backoff bigram LM document scoring (functions/lm.py): CCNet-style
# quality filtering — LM trained on the src0 reference slice scores all
# other documents; keep/drop by exact decimal threshold comparison
# ---------------------------------------------------------------------------

_LM_TRAIN_SRC = "src0"
_LM_KEEP_LP = "-8.0"


def _lm_oracle_sql() -> str:
    # Portable ln (functions/portable_ln) with PER-TERM BIGINT snapping
    # (r08 verdict task 3): each distinct count's ln is snapped to
    # integer grid nanos inside its own CTE — mirroring the Spark
    # side's Python-built literal tables bit for bit — and every
    # downstream combine/sum/threshold is exact integer arithmetic.
    # No libm anywhere, and no per-occurrence double combine for a
    # divergent FMA/constant-folding path to perturb (the rounds-6..8
    # failure class).  The backoff ratio 0.4·c/N rides as the exact
    # integer ratio 2c / 5N.
    from .functions.portable_ln import (
        POWS_CTE,
        sql_grid_nanos,
        sql_ln_select,
    )

    ln_bg = sql_ln_select(
        "(SELECT DISTINCT c FROM bg) _dbg",
        ["c"],
        {"a": "c"},
        [("_nbg", sql_grid_nanos("_ln_a"))],
    )
    ln_uni = sql_ln_select(
        "(SELECT DISTINCT c FROM uni) _dun",
        ["c"],
        {"a": "c"},
        [("_nprev", sql_grid_nanos("_ln_a"))],
    )
    ln_back = sql_ln_select(
        "(SELECT DISTINCT c FROM (SELECT c FROM uni UNION SELECT CAST(1 AS BIGINT) AS c)) _dbk",
        ["c"],
        {"a": "2 * c"},
        [("_nback", sql_grid_nanos("_ln_a"))],
    )
    ln_5n = sql_ln_select(
        "(SELECT greatest(COALESCE(n_total, 0), 1) AS n FROM tot) _d5n",
        [],
        {"a": "5 * n"},
        [("_n5n", sql_grid_nanos("_ln_a"))],
    )
    v_pair = "lb._nbg - lu._nprev"
    v_back = "lk._nback - l5._n5n"
    thr_nanos = -8_000_000_000  # _LM_KEEP_LP = -8.0 on the 1e-9 grid
    assert int(Decimal(_LM_KEEP_LP).scaleb(9)) == thr_nanos
    return f"""
    WITH {POWS_CTE},
    train AS (
        SELECT {TOKS_SQL} AS toks FROM documents WHERE source = '{_LM_TRAIN_SRC}'
    ),
    uni AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(toks) AS w FROM train) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
    bg AS (
        SELECT prev, cur, count(*) AS c FROM (
            SELECT toks[i] AS prev, toks[i+1] AS cur
            FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS i
                  FROM train)
        ) GROUP BY prev, cur
    ),
    lnbg AS ({ln_bg}),
    lnuni AS ({ln_uni}),
    lnback AS ({ln_back}),
    ln5n AS ({ln_5n}),
    score AS (
        SELECT doc_id, {TOKS_SQL} AS toks FROM documents
        WHERE source != '{_LM_TRAIN_SRC}'
    ),
    occ AS (
        SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur
        FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS i
              FROM score)
    ),
    lp AS (
        SELECT o.doc_id,
               CASE WHEN b.c IS NOT NULL
                    THEN {v_pair}
                    ELSE {v_back}
               END AS v
        FROM occ o
        LEFT JOIN bg b ON b.prev = o.prev AND b.cur = o.cur
        LEFT JOIN uni up ON up.w = o.prev
        LEFT JOIN uni uc ON uc.w = o.cur
        LEFT JOIN lnbg lb ON lb.c = b.c
        LEFT JOIN lnuni lu ON lu.c = up.c
        LEFT JOIN lnback lk ON lk.c = COALESCE(uc.c, 1)
        CROSS JOIN ln5n l5
    ),
    agg AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
               CAST(sum(v) AS BIGINT) AS sn
        FROM lp GROUP BY doc_id
    )
    SELECT s.doc_id,
           COALESCE(a.n_bigrams, 0) AS n_bigrams,
           CAST(COALESCE(a.sn, 0) AS BIGINT) AS sum_lp_nanos,
           COALESCE(a.sn, 0) >= {thr_nanos} * COALESCE(a.n_bigrams, 0) AS keep
    FROM score s LEFT JOIN agg a ON a.doc_id = s.doc_id
    """


@register(
    "lm_doc_scores",
    _lm_oracle_sql(),
    "stupid-backoff bigram LM quality scores (train on src0, score the rest; "
    "exact BIGINT 1e-9-grid log sums, exact integer keep threshold)",
)
def q_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.lm import lm_score_stupid_backoff

    docs = load_table(spark, sf_dir, "documents")
    return lm_score_stupid_backoff(
        docs, train_source=_LM_TRAIN_SRC, keep_lp_per_token=_LM_KEEP_LP
    )


# ---------------------------------------------------------------------------
# DSIR data selection (functions/dsir.py): hashed-bigram importance
# resampling — rank the raw pool by importance weight toward the src1
# target slice, keep the top 200
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src1"
_DSIR_BUCKETS = 4096
_DSIR_TOP = 200


def _dsir_oracle_sql() -> str:
    # position variable is `g` (oracle_md5_int_sql's internal lambda
    # variable is `i` — see the winnowing twin's capture note)
    bg = "toks[g] || ' ' || toks[g+1]"
    bucket = f"{oracle_md5_int_sql(bg, 31, 8)} % {_DSIR_BUCKETS}"
    b = _DSIR_BUCKETS
    # Portable ln (functions/portable_ln) with PER-TERM BIGINT snapping
    # (r08 verdict task 3): each of the four ln terms snaps to integer
    # grid nanos, the combine
    # ((n(ct+1) + n(nq+B)) - n(cq+1)) - n(nt+B) is exact BIGINT
    # arithmetic, and scoring is BIGINT·BIGINT — no double combine for
    # a divergent FMA path to perturb and no BIGINT×DECIMAL promotion
    # (version-dependent in DuckDB; the r08 verdict's prime suspect).
    from .functions.portable_ln import (
        POWS_CTE,
        sql_grid_nanos,
        sql_ln_select,
    )

    lr_sel = sql_ln_select(
        "(SELECT cq.b AS b, cq.cq AS cq, COALESCE(ct.ct, 0) AS ct, tot.nq AS nq, tot.nt AS nt"
        " FROM cq LEFT JOIN ct ON ct.b = cq.b CROSS JOIN tot) _lrin",
        ["b"],
        {
            "a": "ct + 1",
            "b": f"nq + {b}",
            "c": "cq + 1",
            "d": f"nt + {b}",
        },
        [
            (
                "lr",
                f"(({sql_grid_nanos('_ln_a')} + {sql_grid_nanos('_ln_b')}) "
                f"- {sql_grid_nanos('_ln_c')}) - {sql_grid_nanos('_ln_d')}",
            )
        ],
    )
    return f"""
    WITH {POWS_CTE},
    raw_occ AS (
        SELECT doc_id, {bucket} AS b
        FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS g
              FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents
                    WHERE source != '{_DSIR_TARGET}'))
    ),
    dc AS (SELECT doc_id, b, count(*) AS cnt FROM raw_occ GROUP BY doc_id, b),
    cq AS (SELECT b, sum(cnt) AS cq FROM dc GROUP BY b),
    tgt_occ AS (
        SELECT {bucket} AS b
        FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS g
              FROM (SELECT {TOKS_SQL} AS toks FROM documents
                    WHERE source = '{_DSIR_TARGET}'))
    ),
    ct AS (SELECT b, count(*) AS ct FROM tgt_occ GROUP BY b),
    tot AS (
        SELECT CAST((SELECT sum(cq) FROM cq) AS BIGINT) AS nq,
               CAST(COALESCE((SELECT sum(ct) FROM ct), 0) AS BIGINT) AS nt
    ),
    lr AS ({lr_sel}),
    scored AS (
        SELECT dc.doc_id,
               CAST(sum(dc.cnt) AS INTEGER) AS n_bigrams,
               CAST(sum(dc.cnt * lr.lr) AS BIGINT) AS sum_lw_nanos
        FROM dc JOIN lr ON lr.b = dc.b
        GROUP BY dc.doc_id
    )
    SELECT doc_id, n_bigrams, sum_lw_nanos,
           CAST(row_number() OVER (ORDER BY sum_lw_nanos DESC, doc_id) AS INTEGER) AS rank
    FROM scored ORDER BY sum_lw_nanos DESC, doc_id LIMIT {_DSIR_TOP}
    """


@register(
    "dsir_select",
    _dsir_oracle_sql(),
    "DSIR hashed-bigram importance resampling: rank the raw pool toward the "
    "src1 target slice by sum log(p/q) over 4096 hash buckets, top 200",
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dsir import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(
        docs,
        target_source=_DSIR_TARGET,
        n_buckets=_DSIR_BUCKETS,
        top_n=_DSIR_TOP,
    )


# ---------------------------------------------------------------------------
# Portable-chain diagnostic probe (functions/chain_probe.py): fixed
# adversarial literals through the exact lm/dsir arithmetic — the
# driver-row bisect for the 3-round lm/dsir driver-env divergence
# (r08 verdict task 2)
# ---------------------------------------------------------------------------

def _chain_probe_oracle() -> str:
    from .functions.chain_probe import chain_probe_oracle_sql

    return chain_probe_oracle_sql()


@register(
    "portable_chain_probe",
    _chain_probe_oracle(),
    "portable ln chain over fixed grid-boundary-adjacent integers: per-term "
    "nano snaps plus 2- and 4-term combines snapped per-term and after-combine",
)
def q_portable_chain_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.chain_probe import chain_probe

    return chain_probe(spark, sf_dir)


# ---------------------------------------------------------------------------
# Full-domain ln census (functions/chain_probe.py::ln_domain_census):
# every ln argument lm_doc_scores/dsir_select evaluate at this sf, one
# (family, arg, nanos) row each — the r10 verdict task 1(b) bisect link
# the fixed-literal probe cannot cover
# ---------------------------------------------------------------------------


def _ln_census_oracle() -> str:
    b = _DSIR_BUCKETS
    # dsir's bucketing exactly (position variable `g`; md5 lambda uses `i`)
    bgx = "toks[g] || ' ' || toks[g+1]"
    bucket = f"{oracle_md5_int_sql(bgx, 31, 8)} % {b}"
    census_sel = _sql_ln_select(
        "all_args",
        ["family", "arg"],
        {"a": "arg"},
        [("nanos", _sql_grid_nanos("_ln_a"))],
    )
    return f"""
    WITH {_POWS_CTE},
    train AS (
        SELECT {TOKS_SQL} AS toks FROM documents WHERE source = '{_LM_TRAIN_SRC}'
    ),
    uni AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(toks) AS w FROM train) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
    bg AS (
        SELECT prev, cur, count(*) AS c FROM (
            SELECT toks[i] AS prev, toks[i+1] AS cur
            FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS i
                  FROM train)
        ) GROUP BY prev, cur
    ),
    raw_occ AS (
        SELECT {bucket} AS bk
        FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS g
              FROM (SELECT {TOKS_SQL} AS toks FROM documents
                    WHERE source != '{_DSIR_TARGET}'))
    ),
    cq AS (SELECT bk, count(*) AS cq FROM raw_occ GROUP BY bk),
    tgt_occ AS (
        SELECT {bucket} AS bk
        FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS g
              FROM (SELECT {TOKS_SQL} AS toks FROM documents
                    WHERE source = '{_DSIR_TARGET}'))
    ),
    ct AS (SELECT bk, count(*) AS ct FROM tgt_occ GROUP BY bk),
    dtot AS (
        SELECT CAST((SELECT COALESCE(sum(cq), 0) FROM cq) AS BIGINT) AS nq,
               CAST(COALESCE((SELECT sum(ct) FROM ct), 0) AS BIGINT) AS nt
    ),
    all_args AS (
        SELECT DISTINCT family, CAST(arg AS BIGINT) AS arg FROM (
            SELECT 'lm_bg' AS family, c AS arg FROM bg
            UNION ALL SELECT 'lm_prev', c FROM uni
            UNION ALL SELECT 'lm_back', 2 * c
                FROM (SELECT c FROM uni UNION SELECT CAST(1 AS BIGINT) AS c)
            UNION ALL SELECT 'lm_5n', 5 * greatest(COALESCE(n_total, 0), 1) FROM tot
            UNION ALL SELECT 'dsir_ct1', COALESCE(ct.ct, 0) + 1
                FROM cq LEFT JOIN ct ON ct.bk = cq.bk
            UNION ALL SELECT 'dsir_cq1', cq + 1 FROM cq
            UNION ALL SELECT 'dsir_nqB', nq + {b} FROM dtot
            UNION ALL SELECT 'dsir_ntB', nt + {b} FROM dtot
        )
    )
    {census_sel}
    """


@register(
    "ln_domain_census",
    _ln_census_oracle(),
    "every ln argument the lm/dsir queries evaluate at this sf (distinct "
    "uni/bigram counts, backoff set, 5N; per-bucket ct+1/cq+1, smoothed "
    "totals), snapped to BIGINT nanos through the portable chain",
)
def q_ln_domain_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.chain_probe import ln_domain_census

    docs = load_table(spark, sf_dir, "documents")
    return ln_domain_census(
        docs,
        train_source=_LM_TRAIN_SRC,
        target_source=_DSIR_TARGET,
        n_buckets=_DSIR_BUCKETS,
    )


# ---------------------------------------------------------------------------
# Duplicated-substring spans (functions/spans.py): Lee et al. 2022 exact
# substring dedup, relationally — k-gram df marks positions, islands merge
# ---------------------------------------------------------------------------

_SPAN_K = 8


def _dup_spans_oracle() -> str:
    k = _SPAN_K
    gram = " || ' ' || ".join([f"toks[g+{i}]" for i in range(k)])
    h = oracle_md5_int_sql(gram, 37, 12)
    return f"""
WITH occ AS (
    SELECT doc_id, g AS pos, {h} AS h
    FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks)-{k - 1}, 0)+1)) AS g
          FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents))
),
dup AS (
    SELECT h FROM (SELECT h, doc_id FROM occ GROUP BY h, doc_id)
    GROUP BY h HAVING count(*) >= 2
),
starts AS (SELECT occ.doc_id, occ.pos FROM occ JOIN dup USING (h)),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                                    -1000000000) + {k}
                THEN 1 ELSE 0 END AS nw
    FROM starts
),
isl2 AS (
    SELECT doc_id, pos,
           sum(nw) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS g
    FROM isl
)
SELECT doc_id,
       CAST(min(pos) AS INTEGER) AS span_start,
       CAST(max(pos) + {k - 1} AS INTEGER) AS span_end,
       CAST(max(pos) + {k - 1} - min(pos) + 1 AS INTEGER) AS span_len,
       count(*) AS n_grams
FROM isl2 GROUP BY doc_id, g
"""


@register(
    "dup_substring_spans",
    _dup_spans_oracle(),
    "Exact-substring dedup spans: maximal merged runs of 8-token windows "
    "recurring across >= 2 documents",
)
def q_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.spans import dup_substring_spans

    docs = load_table(spark, sf_dir, "documents")
    return dup_substring_spans(docs, k=_SPAN_K)


# ---------------------------------------------------------------------------
# Token-budget corpus selection (operators/prefix.py): exact global
# prefix sum without a single-partition window
# ---------------------------------------------------------------------------


def _budget_oracle() -> str:
    from .operators.prefix import SCORE_GRID

    return f"""
WITH t AS (
    SELECT doc_id, len(toks) AS n_toks, len(list_distinct(toks)) AS n_dist
    FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    WHERE len(toks) > 0
),
s AS (
    SELECT doc_id, n_toks,
           (2 * n_dist * {SCORE_GRID} + n_toks) // (2 * n_toks) AS score
    FROM t
),
b AS (SELECT (sum(n_toks) * 3) // 10 AS budget FROM s),
c AS (
    SELECT doc_id, score, n_toks,
           sum(n_toks) OVER (ORDER BY score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_toks
    FROM s
)
SELECT doc_id, CAST(score AS BIGINT) AS score,
       CAST(n_toks AS BIGINT) AS n_toks,
       CAST(cum_toks AS BIGINT) AS cum_toks
FROM c, b WHERE cum_toks <= budget
"""


@register(
    "token_budget_select",
    _budget_oracle(),
    "best-scoring corpus prefix under a 30% token budget via the "
    "two-phase distributed prefix sum",
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.prefix import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_select(docs)


# ---------------------------------------------------------------------------
# N-gram language ID (functions/langid.py): Cavnar-Trenkle out-of-place
# rank distance, exact integers end to end
# ---------------------------------------------------------------------------


def _langid_oracle(m: int = 100, train_mod: int = 5) -> str:
    return f"""
WITH tr AS (
    SELECT lang, substr(s, CAST(g AS INTEGER), 3) AS tri, count(*) AS cnt
    FROM (SELECT lang, lower(text) AS s,
                 unnest(range(1, greatest(len(lower(text)) - 2, 0) + 1)) AS g
          FROM documents WHERE doc_id % {train_mod} = 0)
    GROUP BY lang, tri
),
lp AS (
    SELECT lang AS pl, tri, rank FROM (
        SELECT lang, tri,
               row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tri) AS rank
        FROM tr) WHERE rank <= {m}
),
dt AS (
    SELECT doc_id, substr(s, CAST(g AS INTEGER), 3) AS tri, count(*) AS cnt
    FROM (SELECT doc_id, lower(text) AS s,
                 unnest(range(1, greatest(len(lower(text)) - 2, 0) + 1)) AS g
          FROM documents WHERE doc_id % {train_mod} != 0)
    GROUP BY doc_id, tri
),
dp AS (
    SELECT doc_id, tri, rank FROM (
        SELECT doc_id, tri,
               row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tri) AS rank
        FROM dt) WHERE rank <= {m}
),
langs AS (SELECT DISTINCT lang AS pl FROM documents WHERE doc_id % {train_mod} = 0),
dist AS (
    SELECT dp.doc_id, l.pl,
           sum(coalesce(abs(dp.rank - lp.rank), {m})) AS distance
    FROM dp CROSS JOIN langs l
    LEFT JOIN lp ON lp.pl = l.pl AND lp.tri = dp.tri
    GROUP BY dp.doc_id, l.pl
),
pred AS (
    SELECT doc_id, pl AS pred_lang, distance FROM (
        SELECT doc_id, pl, distance,
               row_number() OVER (PARTITION BY doc_id ORDER BY distance, pl) AS rn
        FROM dist) WHERE rn = 1
)
SELECT p.doc_id, p.pred_lang, d.lang AS actual_lang,
       CAST(p.distance AS BIGINT) AS distance
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
"""


@register(
    "langid_ngram",
    _langid_oracle(),
    "Cavnar-Trenkle char-trigram language ID: top-100 rank profiles, "
    "out-of-place distance, exact-integer argmin",
)
def q_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.langid import langid_ngram

    docs = load_table(spark, sf_dir, "documents")
    return langid_ngram(docs)


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters (functions/sketch.py): the mergeable
# fixed-width counter structure for token frequencies at corpus scale
# ---------------------------------------------------------------------------

_CMS_K = 20


def _cms_oracle() -> str:
    from .functions.sketch import CMS_SEEDS, CMS_WIDTH

    def b(expr: str, seed: int) -> str:
        return f"({oracle_md5_int_sql(expr, seed, 8)} % {CMS_WIDTH})"

    hashes = ", ".join(b("w", s) for s in CMS_SEEDS)
    rows = ", ".join(str(i) for i in range(len(CMS_SEEDS)))
    joins = "\n".join(
        f"JOIN ctr c{i} ON c{i}.r = {i} AND c{i}.b = {b('t.token', s)}"
        for i, s in enumerate(CMS_SEEDS)
    )
    least = ", ".join(f"c{i}.c" for i in range(len(CMS_SEEDS)))
    return f"""
WITH toks AS (SELECT unnest({TOKS_SQL}) AS w FROM documents),
ctr AS (
    SELECT r, b, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT unnest([{rows}]) AS r, unnest([{hashes}]) AS b FROM toks)
    GROUP BY r, b
),
truth AS (
    SELECT w AS token, CAST(count(*) AS BIGINT) AS true_n FROM toks GROUP BY w
)
SELECT t.token, t.true_n,
       least({least}) AS est_n,
       least({least}) - t.true_n AS overcount
FROM truth t
{joins}
ORDER BY est_n DESC, t.token LIMIT {_CMS_K}
"""


@register(
    "cms_heavy_hitters",
    _cms_oracle(),
    "Count-Min Sketch heavy hitters: 4x1024 mergeable counter table, "
    "min-over-rows estimates, one-sided error vs exact counts",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by Count-Min estimate with exact counts alongside
    (functions/sketch.py). The sketch is a 4×1024 integer table built by
    one map-side-combined aggregation — fixed-width and shard-mergeable
    at any corpus size — and estimation is one broadcast hash join of
    the candidates' (r, b) probe keys against that table plus a
    map-side-combinable min (ADVICE r07 low: replaced the 32k-literal
    create_map projection). Estimates never undercount (overcount ≥ 0
    row-wise, asserted in tests); hashing is portable md5, so the
    oracle rebuilds the identical sketch: an exactly-twinnable
    APPROXIMATE structure, its approximation being deterministic data
    reduction rather than randomness."""
    from .functions.sketch import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, "text", k=_CMS_K)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-token estimate (functions/sketch.hll_distinct):
# the second mergeable sketch — distinct counting without the vocab
# exchange; registers + estimate arithmetic exactly twinned through the
# portable IEEE chain (no libm on either side)
# ---------------------------------------------------------------------------


def _hll_oracle() -> str:
    from .functions.portable_ln import POWS_CTE, sql_ln_select
    from .functions.sketch import HLL_ALPHA_SQL, HLL_M, HLL_SEED

    m = HLL_M
    h = oracle_md5_int_sql("w", HLL_SEED, 12)
    lnlc = sql_ln_select(
        "(SELECT v FROM agg WHERE v > 0) _dlv",
        [],
        {"a": f"{m}", "b": "v"},
        [("_lnr", "_ln_a - _ln_b")],
    )
    snap4_raw = "CAST(floor((raw * 10000.0) + 0.5) AS BIGINT)"
    snap4_est = "CAST(floor((est * 10000.0) + 0.5) AS BIGINT)"
    return f"""
    WITH {POWS_CTE},
    toks AS (SELECT unnest({TOKS_SQL}) AS w FROM documents),
    occ AS (
        SELECT h % {m} AS j, h // {m} AS wq
        FROM (SELECT {h} AS h FROM toks)
    ),
    regs AS (
        SELECT j, max(CASE WHEN wq = 0 THEN 41
                           ELSE 41 - length(bin(wq)) END) AS mj
        FROM occ GROUP BY j
    ),
    agg AS (
        SELECT CAST(COALESCE(sum(CAST(1 AS BIGINT) << (41 - mj)), 0)
                    + ({m} - count(*)) * (CAST(1 AS BIGINT) << 41) AS BIGINT) AS s41,
               CAST({m} - count(*) AS INTEGER) AS v
        FROM regs
    ),
    lnlc AS ({lnlc}),
    fin AS (
        SELECT a.s41, a.v,
               (({HLL_ALPHA_SQL} * 65536.0) * 2199023255552.0)
                   / CAST(a.s41 AS DOUBLE) AS raw
        FROM agg a
    ),
    fin2 AS (
        SELECT f.s41, f.v, f.raw,
               CASE WHEN f.v > 0 AND f.raw <= 640.0
                    THEN 256.0 * l._lnr ELSE f.raw END AS est
        FROM fin f LEFT JOIN lnlc l ON 1 = 1
    ),
    fin3 AS (
        SELECT s41, v, raw, {snap4_raw} AS raw4n, {snap4_est} AS e4n
        FROM fin2
    ),
    tru AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS td FROM toks)
    SELECT CAST({m} AS INTEGER) AS m, v AS v_zeros, s41,
           CAST(raw4n AS DOUBLE) / 10000.0 AS raw_est,
           CAST(e4n AS DOUBLE) / 10000.0 AS est,
           td AS true_distinct,
           CASE WHEN td = 0 THEN NULL
                ELSE CAST(CAST(floor(((((CAST(e4n AS DOUBLE) / 10000.0)
                     - CAST(td AS DOUBLE)) / CAST(td AS DOUBLE))
                     * 1000000.0) + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
           END AS rel_err
    FROM fin3 CROSS JOIN tru
    """


@register(
    "hll_distinct",
    _hll_oracle(),
    "HyperLogLog distinct-token estimate (256 registers, portable "
    "hash/ln; exact integer harmonic sum) with the exact count audit",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token count (functions/sketch.hll_distinct):
    256-register sketch over the portable 48-bit md5 — one explode +
    one 256-row max-aggregate, no vocab exchange, mergeable across
    shards (elementwise register max). The harmonic sum rides as the
    EXACT integer Σ 2^(41-M_j) and the estimate arithmetic (bias
    constant from integer-literal divisions, linear-counting ln through
    functions/portable_ln, floor grid snaps) is spelled identically in
    driver Python and the oracle SQL — bit-identical on every build."""
    from .functions.sketch import hll_distinct

    docs = load_table(spark, sf_dir, "documents")
    return hll_distinct(docs, "text")


# ---------------------------------------------------------------------------
# Batch BM25 retrieval (functions/retrieval.bm25_batch_topk): many queries
# scored in one corpus pass — the serving shape
# ---------------------------------------------------------------------------

_BM25_BATCH = [
    (1, ["spark", "join"]),
    (2, ["dup", "shuffle"]),
    (3, ["data", "quality", "spark"]),
]
_BM25_BATCH_K = 10


def _bm25_batch_oracle(k1: float = 1.2, b: float = 0.75) -> str:
    # portable idf + floor grid snap, shared with _bm25_scored_ctes
    # (functions/portable_ln, r07 verdict #2)
    from .functions.portable_ln import (
        POWS_CTE,
        sql_grid_decimal,
        sql_grid_nanos,
        sql_ln_select,
    )

    all_terms = sorted({t for _, ts in _BM25_BATCH for t in ts})
    terms_sql = ", ".join(f"'{t}'" for t in all_terms)
    qrows = ", ".join(
        f"({qid}, '{t}')" for qid, ts in _BM25_BATCH for t in sorted(set(ts))
    )
    lnidf = sql_ln_select(
        "(SELECT d.token, d.df, s.n_rows FROM dfreq d CROSS JOIN stats s) _din",
        ["token"],
        {"a": "(2 * n_rows) + 2", "b": "(2 * df) + 1"},
        [("_idf", "_ln_a - _ln_b")],
    )
    s_term = sql_grid_decimal(
        sql_grid_nanos(
            f"i._idf * ((t.tf * CAST({k1 + 1.0} AS DOUBLE))"
            f" / (t.tf + CAST({k1} AS DOUBLE) * (1.0 - {b} + {b} * t.dl / s.avgdl)))"
        ),
        28,
    )
    return f"""
WITH {POWS_CTE},
base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS N,
                 avg(CAST(len(toks) AS DOUBLE)) AS avgdl,
                 count(*) AS n_rows FROM base),
q(query_id, token) AS (VALUES {qrows}),
matched AS (
    SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           unnest(list_filter(toks, t -> list_contains([{terms_sql}], t))) AS token
    FROM base
),
tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM matched GROUP BY doc_id, dl, token),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
lnidf AS ({lnidf}),
per_term AS (
    SELECT q.query_id, t.doc_id,
           {s_term} AS s_term
    FROM tf t JOIN lnidf i USING (token) JOIN q ON q.token = t.token, stats s
),
scores AS (
    SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
           CAST(sum(s_term) AS DOUBLE) AS bm25
    FROM per_term GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, n_terms_matched, bm25,
       CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS rank
      FROM scores)
WHERE rank <= {_BM25_BATCH_K}
"""


@register(
    "bm25_batch",
    _bm25_batch_oracle(),
    "batch BM25: 3 queries scored in ONE corpus pass (shared tf/idf, "
    "per-query rank windows) — the serving shape",
)
def q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query BM25 top-10 (functions/retrieval.bm25_batch_topk):
    one token-stream filter against the union of all query terms, one
    (doc, term) tf aggregate, one single-sourced idf table shared by
    every query, a broadcast (query, term) fan-out join, per-query rank
    windows. Corpus cost independent of query count — the shape that
    replaces per-query scans in production serving. idf logs ride in as
    portable_ln literals (no libm on either comparison side)."""
    from .functions.retrieval import bm25_batch_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_batch_topk(docs, _BM25_BATCH, k=_BM25_BATCH_K)


# ---------------------------------------------------------------------------
# Gopher repetition signals (functions/textstats.doc_repetition): per-doc
# top-bigram dominance + duplicated-bigram fraction — the curation
# thresholds of Rae et al. 2021 §A1.2; deepens the expression-only
# repetition_stats shingle ratio with count-distribution signals
# ---------------------------------------------------------------------------

_REP_SNAP6 = (
    "CAST(CAST(floor((({x}) * 1000000.0) + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0"
)


@register(
    "doc_repetition",
    f"""
    WITH occ AS (
        SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS i
              FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents))
    ),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM occ GROUP BY doc_id, g),
    per AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup
        FROM cnt GROUP BY doc_id
    ),
    top AS (
        SELECT doc_id, g AS top_bigram, CAST(c AS BIGINT) AS top_count
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY c DESC, g) AS rn FROM cnt)
        WHERE rn = 1
    )
    SELECT p.doc_id, p.n_bigrams, t.top_bigram, t.top_count,
           {_REP_SNAP6.format(x="CAST(t.top_count AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)")} AS top_frac,
           {_REP_SNAP6.format(x="CAST(p.dup AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)")} AS dup_frac
    FROM per p JOIN top t USING (doc_id)
    """,
    "Gopher repetition signals: per-doc top-bigram dominance + "
    "duplicated-bigram occurrence fraction (6-dp floor grid)",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram-repetition curation signals
    (functions/textstats.doc_repetition): one distinct-pair-bounded
    count aggregate feeds a per-doc rollup and a WindowGroupLimit-pruned
    top-1 rank window; fractions are integer ratios through one
    correctly-rounded double division + the floor 6-dp grid snap —
    exact cross-engine, no transcendental."""
    from .functions.textstats import doc_repetition

    docs = load_table(spark, sf_dir, "documents")
    return doc_repetition(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Set-containment join (operators/dedup.containment_pairs_prefix): the
# asymmetric sibling of dedup_ngram_jaccard — short docs quoted/wrapped
# inside long ones, which the Jaccard union term swamps
# ---------------------------------------------------------------------------

_CT_TN, _CT_TD = 3, 5


def _containment_oracle(
    tn: int = _CT_TN,
    td: int = _CT_TD,
    cap: int = DEFAULT_MAX_BUCKET,
    shingle_n: int = 2,
    ext_l: int = 3,
    hash_seed: int = 29,
) -> str:
    code = oracle_md5_int_sql("g", hash_seed)
    return f"""
WITH sh_t AS (
    SELECT doc_id,
           list_distinct(list_transform({shingles_sql(TOKS_SQL, shingle_n)},
                                        g -> {code})) AS sh
    FROM documents
),
sized AS (SELECT doc_id, sh, len(sh) AS sz FROM sh_t),
ex AS (SELECT doc_id, sz, unnest(sh) AS s FROM sized),
dfreq AS (SELECT s, count(*) AS df_n FROM ex GROUP BY s),
-- l-extended containment prefix: first sz - ceil(t*sz) + {ext_l}
-- rarest codes of a; in the full index a code's occupancy IS its df
pfx AS (
    SELECT doc_id, sz, s, CASE WHEN df_n > {cap} THEN 1 ELSE 0 END AS hot
    FROM (
        SELECT e.doc_id, e.sz, e.s, d.df_n,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df_n, e.s) AS rn
        FROM ex e JOIN dfreq d ON e.s = d.s
    ) WHERE rn <= sz - ((sz * {tn} + {td} - 1) // {td}) + {ext_l}
),
astats AS (SELECT doc_id, max(sz) AS sz_a, sum(hot) AS h_a FROM pfx GROUP BY doc_id),
-- the container side is the full index, cap-guarded per code
-- (operators/dedup.cap_bucket_size twin)
idx AS (
    SELECT doc_id, sz, s FROM ex
    {cap_bucket_qualify_sql('s', cap)}
),
g1 AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
    FROM pfx a JOIN idx b
      ON a.s = b.s AND a.doc_id <> b.doc_id
     AND b.sz * {td} >= a.sz * {tn}
    GROUP BY a.doc_id, b.doc_id
),
-- lossless count filter (one-sided extension lemma):
-- c + H_a >= min(l, alpha)
cand AS (
    SELECT g1.id_a, g1.id_b
    FROM g1 JOIN astats s ON s.doc_id = g1.id_a
    WHERE (g1.c + s.h_a) >= {ext_l}
       OR (g1.c + s.h_a) * {td} >= s.sz_a * {tn}
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           / CAST(x.sz AS DOUBLE) AS containment
FROM cand c JOIN sized x ON c.id_a = x.doc_id JOIN sized y ON c.id_b = y.doc_id
WHERE len(list_intersect(x.sh, y.sh)) * {td} >= x.sz * {tn}
"""


@register(
    "containment_pairs",
    _containment_oracle(),
    f"asymmetric set-containment join (|A∩B|/|A| >= {_CT_TN}/{_CT_TD}, "
    "bigram shingles): containment prefix filter vs the cap-guarded "
    "full index",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-containment join (operators/dedup.containment_pairs_prefix):
    ordered pairs where doc a's bigram-shingle set is >= 60% inside
    doc b — quotation/wrapper/boilerplate-inclusion detection that
    Jaccard's union term misses. Lossless containment prefix filter on
    the contained side (pigeonhole over the sz-alpha+1 rarest codes);
    the container side cannot be prefix-filtered, so its index buckets
    are cap-guarded with reported (never silent) degradation, and the
    all-hot-prefix case escalates to L2 super-shingle keys (r08 task 6;
    probe-gated, so it never enters this plan while the guard is at 0).
    The oracle twin models L1 only — exact parity holds in the
    guard-drops=0 regime the gate tests; L2 can only ADD
    exactly-verified pairs beyond it. Exact integer verification; text
    never shuffles (portable 48-bit codes).
    """
    from .operators.dedup import containment_pairs_prefix
    from .registry import guard_observation
    from .sources.tables import spread

    # spread: the CPU-heavy shingle/hash projection (and the plan-build
    # hot-code probe that shares its cache) must not serialize on a
    # single-row-group scan
    docs = spread(load_table(spark, sf_dir, "documents"))
    return containment_pairs_prefix(
        docs,
        "doc_id",
        "text",
        _CT_TN,
        _CT_TD,
        observation=guard_observation("containment_pairs"),
    )


# ---------------------------------------------------------------------------
# Gopher quality-rule table (functions/textstats.gopher_rules): the
# Rae et al. 2021 Appendix-A web-corpus filter, integer-exact
# ---------------------------------------------------------------------------

def _gopher_oracle() -> str:
    from .functions.textstats import (
        GOPHER_ALPHA_DEN,
        GOPHER_ALPHA_NUM,
        GOPHER_BULLET_DEN,
        GOPHER_BULLET_NUM,
        GOPHER_ELLIPSIS_DEN,
        GOPHER_ELLIPSIS_NUM,
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        GOPHER_SYMBOL_DEN,
        GOPHER_SYMBOL_NUM,
    )

    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
WITH base AS (
    SELECT doc_id,
           CAST(len({TOKS_SQL}) AS INTEGER) AS n_words,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS _alpha,
           CAST(length(text) - length(replace(text, '#', ''))
                + (length(text) - length(replace(text, '...', ''))) // 3
               AS BIGINT) AS _sym,
           CAST(len(string_split(text, chr(10))) AS BIGINT) AS _nl,
           CAST(len(list_filter(string_split(text, chr(10)),
                l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')))
               AS BIGINT) AS _bl,
           CAST(len(list_filter(string_split(text, chr(10)),
                l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS _el,
           CAST(len(list_filter({TOKS_SQL}, t -> regexp_matches(t, '[a-z]')))
               AS BIGINT) AS _aw,
           CAST(len(list_intersect(list_distinct({TOKS_SQL}), [{stops}])) AS BIGINT) AS _sh
    FROM documents
)
SELECT doc_id, n_words,
       n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS r_word_count,
       _alpha >= {GOPHER_MIN_MEAN_LEN} * n_words
           AND _alpha <= {GOPHER_MAX_MEAN_LEN} * n_words AS r_mean_word_len,
       _sym * {GOPHER_SYMBOL_DEN} <= n_words * {GOPHER_SYMBOL_NUM} AS r_symbol_ratio,
       _bl * {GOPHER_BULLET_DEN} <= _nl * {GOPHER_BULLET_NUM} AS r_bullet_lines,
       _el * {GOPHER_ELLIPSIS_DEN} <= _nl * {GOPHER_ELLIPSIS_NUM} AS r_ellipsis_lines,
       _aw * {GOPHER_ALPHA_DEN} >= n_words * {GOPHER_ALPHA_NUM} AS r_alpha_words,
       _sh >= {GOPHER_MIN_STOPWORDS} AS r_stopwords,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
       AND (_alpha >= {GOPHER_MIN_MEAN_LEN} * n_words
            AND _alpha <= {GOPHER_MAX_MEAN_LEN} * n_words)
       AND (_sym * {GOPHER_SYMBOL_DEN} <= n_words * {GOPHER_SYMBOL_NUM})
       AND (_bl * {GOPHER_BULLET_DEN} <= _nl * {GOPHER_BULLET_NUM})
       AND (_el * {GOPHER_ELLIPSIS_DEN} <= _nl * {GOPHER_ELLIPSIS_NUM})
       AND (_aw * {GOPHER_ALPHA_DEN} >= n_words * {GOPHER_ALPHA_NUM})
       AND (_sh >= {GOPHER_MIN_STOPWORDS}) AS keep
FROM base
"""


@register(
    "gopher_rules",
    _gopher_oracle(),
    "Gopher (Rae et al. 2021) web-corpus quality rules per document: "
    "word count, mean word length, symbol/bullet/ellipsis ratios, "
    "alpha-word fraction, stopword floor — integer-exact booleans",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import gopher_rules
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return gopher_rules(docs)


# ---------------------------------------------------------------------------
# PMI phrase mining (functions/pmi.py): collocation discovery on the
# portable per-term-snapped chain
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 100


def _pmi_oracle(min_count: int = _PMI_MIN_COUNT, top_n: int = _PMI_TOP) -> str:
    from .functions.portable_ln import (
        POWS_CTE,
        sql_grid_decimal,
        sql_grid_nanos,
        sql_ln_select,
    )

    ln_xy = sql_ln_select(
        "(SELECT DISTINCT c_xy AS c FROM bg) _dxy",
        ["c"],
        {"a": "c"},
        [("_nxy", sql_grid_nanos("_ln_a"))],
    )
    ln_w = sql_ln_select(
        "(SELECT DISTINCT c FROM uni) _dw",
        ["c"],
        {"a": "c"},
        [("_nw", sql_grid_nanos("_ln_a"))],
    )
    ln_n = sql_ln_select(
        "(SELECT n_total, nb_total FROM tot) _dn",
        [],
        {"a": "n_total", "b": "nb_total"},
        [("_nn", sql_grid_nanos("_ln_a")), ("_nnb", sql_grid_nanos("_ln_b"))],
    )
    return f"""
WITH {POWS_CTE},
tk AS (SELECT {TOKS_SQL} AS toks FROM documents),
uni AS (
    SELECT w, count(*) AS c
    FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w
),
bg AS (
    SELECT w1, w2, count(*) AS c_xy FROM (
        SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS i
              FROM tk)
    ) GROUP BY w1, w2 HAVING count(*) >= {min_count}
),
tot AS (
    SELECT CAST((SELECT sum(c) FROM uni) AS BIGINT) AS n_total,
           CAST((SELECT sum(greatest(len(toks)-1, 0)) FROM tk) AS BIGINT) AS nb_total
),
lnxy AS ({ln_xy}),
lnw AS ({ln_w}),
lnn AS ({ln_n}),
scored AS (
    SELECT b.w1, b.w2, CAST(b.c_xy AS INTEGER) AS c_xy,
           ((((lx._nxy + ln._nn) + ln._nn) - ln._nnb) - lwx._nw) - lwy._nw AS pn
    FROM bg b
    JOIN uni ux ON ux.w = b.w1
    JOIN uni uy ON uy.w = b.w2
    JOIN lnxy lx ON lx.c = b.c_xy
    JOIN lnw lwx ON lwx.c = ux.c
    JOIN lnw lwy ON lwy.c = uy.c
    CROSS JOIN lnn ln
)
SELECT w1, w2, c_xy, {sql_grid_decimal('pn', 18, 9)} AS pmi,
       CAST(row_number() OVER (ORDER BY pn DESC, w1, w2) AS INTEGER) AS rank
FROM scored ORDER BY pn DESC, w1, w2 LIMIT {top_n}
"""


@register(
    "pmi_phrases",
    _pmi_oracle(),
    "top-100 adjacent word pairs by PMI (Church & Hanks collocation "
    "mining), c_xy >= 5; five-term portable-chain combine in exact "
    "BIGINT nanos",
)
def q_pmi_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.pmi import pmi_phrases
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return pmi_phrases(docs, min_count=_PMI_MIN_COUNT, top_n=_PMI_TOP)


# ---------------------------------------------------------------------------
# Corpus-level exact line dedup (functions/textstats.dedup_lines_global)
# ---------------------------------------------------------------------------

_LINE_K = 2  # same chunk granularity as intra_doc_dedup (corpus repeats at bigrams)

LINE_DEDUP_GLOBAL_ORACLE = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
ch AS (
    SELECT doc_id,
           unnest(range(0, CAST((len(t) + {_LINE_K - 1}) // {_LINE_K} AS BIGINT))) AS pos,
           unnest(list_transform(range(0, CAST((len(t) + {_LINE_K - 1}) // {_LINE_K} AS BIGINT)),
                                 i -> array_to_string(t[i*{_LINE_K}+1 : i*{_LINE_K}+{_LINE_K}], ' '))) AS chunk
    FROM toks
),
kept AS (
    SELECT doc_id, pos, chunk FROM (
        SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM ch
    ) WHERE rn = 1
),
agg AS (
    SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text, count(*) AS n_kept
    FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
       CAST(coalesce(t.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(coalesce(t.n_chunks, 0) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


@register(
    "line_dedup_global",
    LINE_DEDUP_GLOBAL_ORACLE,
    "corpus-level exact chunk dedup, keep first (doc, pos) occurrence "
    "and reassemble documents (C4 three-sentence-span dedup semantics)",
)
def q_line_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.textstats import dedup_lines_global
    from .sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return dedup_lines_global(docs, "doc_id", "text", chunk_tokens=_LINE_K)
