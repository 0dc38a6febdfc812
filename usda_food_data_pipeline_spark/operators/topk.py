"""Top-k, ordering, and sampling operators (SURVEY §2.3 D2-D4).

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — each
partition keeps a k-row heap, only k rows per partition reach the driver
side of the exchange. That plan is scale-safe for any k ≪ data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k. Pass a total order (include a unique tiebreaker
    column) or the result is nondeterministic under ties."""
    return df.orderBy(*order).limit(k)


def seeded_sample(df: DataFrame, n: int, seed: int, key_col: str) -> DataFrame:
    """Exact-n deterministic pseudo-random sample.

    Reference D4: ``df.sample(n=100000, random_state=42)``
    (utils/extract_small_sample_of_data.py:7). pandas' row picks are not
    reproducible in Spark — and neither is ``rand(seed)``, whose stream
    depends on partition layout. The engine instead derives randomness
    from the data: order by ``xxhash64(seed, key)`` and take n. Content-
    derived → identical under any partitioning or cluster size (SURVEY §7
    hard part c). For approximate sampling at scale prefer
    ``df.sample(fraction, seed)`` (no shuffle at all).
    """
    h = F.xxhash64(F.lit(seed), F.col(key_col))
    return df.orderBy(h, F.col(key_col)).limit(n)


def portable_hash_order(seed: int, key_col: str) -> Column:
    """md5-of-key ordering expression reproducible in any engine — the
    shared randomness source for seeded and stratified sampling."""
    return F.md5(F.concat(F.lit(f"s{seed}:"), F.col(key_col).cast("string")))


def seeded_sample_portable(df: DataFrame, n: int, seed: int, key_col: str) -> DataFrame:
    """Like :func:`seeded_sample` but ordered by md5 of the key — a hash
    any engine can reproduce, so the sample itself is oracle-checkable.
    xxhash64 (above) is cheaper when cross-engine parity isn't needed."""
    return df.orderBy(portable_hash_order(seed, key_col), F.col(key_col)).limit(n)


def densest_rows(df: DataFrame, k: int, tiebreak_cols: list[str]) -> DataFrame:
    """Top-k rows with the fewest nulls.

    Reference D3: per-row NaN count + ``nsmallest(10)``
    (utils/extract_most_populated_rows.py:4-6). ``tiebreak_cols`` must
    form a unique key or the k-th boundary is nondeterministic.
    """
    from ..functions.cleaning import row_null_count

    with_counts = df.withColumn("null_count", row_null_count(df.columns))
    return with_counts.orderBy(
        F.col("null_count"), *[F.col(c) for c in tiebreak_cols]
    ).limit(k)


def weighted_mix_sample(
    df: DataFrame,
    rates: DataFrame,
    key_col: str,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Training-mix construction: per-key Bernoulli sampling at the rate
    given by the ``rates`` dimension (columns: ``key_col``, ``rate``).

    The keep decision is content-derived — ``md5_int(id) < rate * 2^48``
    — so the sampled set is identical under any partitioning, cluster
    size, or retry (the property ``rand(seed)`` lacks), and a re-run
    over changed data keeps exactly the still-present rows (stable
    incremental mixes). Rates dimension is broadcast: one codegen'd
    hash-join, no shuffle of the corpus. At 100 TB this is the standard
    "upsample high-quality sources, downsample the crawl" step.

    Exactness note: pass dyadic rates (k/2^n) and the threshold
    ``rate * 2^48`` is an exact integer — engines that round and engines
    that truncate double→int agree, so oracle twins hash-match.
    """
    from .dedup import md5_int

    h = md5_int(F.col(id_col).cast("string"), seed)
    threshold = (F.lit(2.0**48) * F.col("rate")).cast("long")
    return (
        df.join(F.broadcast(rates), key_col)
        .filter(h < threshold)
        .drop("rate")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, int],
    seed: int = 0,
    denominator: int = 10,
) -> DataFrame:
    """Deterministic train/val/test split assignment: bucket =
    ``md5_int(id) % denominator``; each split owns ``fractions[name]``
    consecutive buckets (fractions must sum to ``denominator``).

    Content-derived like :func:`weighted_mix_sample` — the assignment
    is identical under any partitioning/cluster size/retry, documents
    keep their split across incremental re-runs (no test-set leakage
    when the corpus grows), and integer bucket arithmetic is exact on
    any engine. Pure expressions: no shuffle, no UDF.

    Returns df + ``split`` column.
    """
    from .dedup import md5_int

    if sum(fractions.values()) != denominator:
        raise ValueError(f"fractions {fractions} must sum to denominator {denominator}")
    bucket = md5_int(F.col(id_col).cast("string"), seed) % denominator
    expr = None
    lo = 0
    for name, width in fractions.items():
        cond = (bucket >= lo) & (bucket < lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr)


def temperature_mix_rates(
    df: DataFrame,
    key_col: str,
    budget_frac: float = 0.5,
    grid_bits: int = 20,
) -> DataFrame:
    """Temperature-scaled source weighting at alpha = 0.5 (the
    Gopher/LLaMA-style mixture: sample source i with probability
    proportional to n_i^alpha, flattening the crawl-dominated
    distribution): returns (key, n, rate) where ``rate`` is the
    per-source Bernoulli keep-rate that realizes a corpus budget of
    ``budget_frac * N`` docs in expectation under those weights.

    Cross-engine exactness without giving up data-dependent rates:

    - alpha is FIXED at 0.5 because sqrt is IEEE-correctly-rounded on
      every engine (pow(x, a) is not) — sqrt(n_i) is bit-identical.
    - the weight denominator sums sqrt(n_i) floor-grid-snapped to a
      9-dp DECIMAL (round() tie handling is engine-defined; the floor
      snap is not — r08 verdict task 5),
      so the total is aggregation-order-independent.
    - the final rate snaps to a dyadic grid (floor(x * 2^grid_bits) /
      2^grid_bits), making rate * 2^48 an exact integer for
      :func:`weighted_mix_sample`'s content-hash threshold.

    One aggregation over the corpus (map-side combined, one row per
    source) + a 1-row broadcast — the rates table is |sources| rows.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    from ..functions.portable_ln import grid_decimal_col, grid_nanos_col

    cs = counts.withColumn(
        "_sq", grid_decimal_col(grid_nanos_col(F.sqrt("n")), 28, 9)
    )
    tot = cs.agg(F.sum("_sq").alias("_S"), F.sum("n").alias("_N"))
    grid = float(2**grid_bits)
    raw = (
        (F.col("_N") * F.lit(float(budget_frac)) / F.col("n"))
        * (F.col("_sq").cast("double") / F.col("_S").cast("double"))
    )
    return cs.crossJoin(F.broadcast(tot)).select(
        F.col(key_col),
        F.col("n"),
        F.least(F.lit(1.0), F.floor(F.lit(grid) * raw) / F.lit(grid)).alias("rate"),
    )


def group_cap(df: DataFrame, key_col: str, order_cols: list, cap: int) -> DataFrame:
    """Per-group cap: keep at most ``cap`` rows per ``key_col``, chosen
    by ``order_cols`` rank (e.g. quality DESC) — the
    "cap the crawl-dominating domain, keep its best pages" step.

    row_number + filter compiles to WindowGroupLimit: each input
    partition keeps only its per-key top-``cap`` BEFORE the exchange,
    so the shuffle moves at most cap x |keys| x |partitions| rows,
    independent of how skewed the big groups are. ``order_cols`` must
    end in a unique tiebreaker for a deterministic boundary.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def weighted_sample_es(
    df: DataFrame,
    n: int,
    seed: int,
    key_col: str,
    weight_col,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006, "Weighted random sampling with a reservoir"): each row draws
    a content-derived uniform ``u`` and the sample is the ``n`` rows
    with the largest ``u^(1/w)`` — equivalently the smallest
    ``(C - ln u)/w`` — so inclusion probability scales with the weight
    (quality-weighted corpus subsampling, the knob between uniform
    ``seeded_sample`` and hard ``dsir_select``).

    Exactness (the oracle contract): ``u = (md5_int(key)+1)/2^48``;
    ``ln(h+1)`` runs per row through the in-plan portable chain
    (:func:`..functions.portable_ln.ln_int_col` — bit-identical to the
    oracle's SQL chain), snaps to integer nanos, shifts by the
    ``48·ln2`` ceiling so every quantity is a non-negative BIGINT
    (truncating vs flooring division agree there — the kmeans shift
    discipline), and the ES order key is the exact integer
    ``(shifted_nanos · 10^6) DIV w`` with ties to ``key_col``.  The
    micro-grid quantization of the key is part of the operator's
    definition — deterministic and engine-identical, not an
    approximation of float ES.

    Scale shape: one scan projection (hash + ln chain, whole-stage
    codegen), one TakeOrdered top-n — no shuffle beyond the final
    (partitions × n) candidate collect.  ``weight_col`` must be a
    positive-BIGINT column expression; callers clamp (e.g.
    ``greatest(w, 1)``).
    """
    from ..functions.portable_ln import LN2, ln_int_col, py_grid_nanos
    from .dedup import md5_int

    clash = {"_es_w", "_ln_nanos", "_es_key"} & set(df.columns)
    if clash:
        raise ValueError(
            f"weighted_sample_es scratch columns collide with input: {sorted(clash)}"
        )
    h = md5_int(F.col(key_col).cast("string"), seed)
    ln_nanos = F.floor(
        (ln_int_col(h + F.lit(1)) * F.lit(float(10**9))) + F.lit(0.5)
    )
    ceiling = py_grid_nanos(48.0 * LN2)  # ln(2^48) in nanos; h+1 <= 2^48
    key = F.expr(
        f"(({ceiling} - _ln_nanos) * 1000000L) DIV _es_w"
    )
    return (
        df.withColumn("_es_w", weight_col.cast("bigint"))
        .withColumn("_ln_nanos", ln_nanos)
        .withColumn("_es_key", key)
        .orderBy(F.col("_es_key"), F.col(key_col))
        .limit(n)
        .drop("_es_w", "_ln_nanos", "_es_key")
    )


def weighted_sample_es_grouped(
    df: DataFrame,
    n_per_group: int,
    seed: int,
    key_col: str,
    weight_col,
    group_cols: list[str],
) -> DataFrame:
    """Stratified Efraimidis-Spirakis sampling: an independent weighted
    sample WITHOUT replacement of ``n_per_group`` rows inside every
    ``group_cols`` stratum — the per-language / per-domain quota
    variant of :func:`weighted_sample_es` (same exact integer ES key:
    portable-ln of a 48-bit content hash, micro-grid ``DIV`` by the
    weight, ties to ``key_col``).

    Scale shape: the global top-n's TakeOrdered is replaced by one
    window row_number per stratum, which compiles to WindowGroupLimit —
    each task forwards at most ``n_per_group`` rows per group into the
    final per-group sort, so the exchange is (groups x n) rows, never
    the corpus.
    """
    from pyspark.sql import Window

    from ..functions.portable_ln import LN2, ln_int_col, py_grid_nanos
    from .dedup import md5_int

    clash = {"_es_w", "_ln_nanos", "_es_key", "_es_rn"} & set(df.columns)
    if clash:
        raise ValueError(
            f"weighted_sample_es_grouped scratch columns collide with input: {sorted(clash)}"
        )
    h = md5_int(F.col(key_col).cast("string"), seed)
    ln_nanos = F.floor(
        (ln_int_col(h + F.lit(1)) * F.lit(float(10**9))) + F.lit(0.5)
    )
    ceiling = py_grid_nanos(48.0 * LN2)
    key = F.expr(f"(({ceiling} - _ln_nanos) * 1000000L) DIV _es_w")
    w = Window.partitionBy(*group_cols).orderBy(F.col("_es_key"), F.col(key_col))
    return (
        df.withColumn("_es_w", weight_col.cast("bigint"))
        .withColumn("_ln_nanos", ln_nanos)
        .withColumn("_es_key", key)
        .withColumn("_es_rn", F.row_number().over(w))
        .filter(F.col("_es_rn") <= n_per_group)
        .drop("_es_w", "_ln_nanos", "_es_key", "_es_rn")
    )
