"""K-means (Lloyd's algorithm) over embedding columns, exact-arithmetic.

The iterative-algorithm pattern this repo uses everywhere state is
small (pagerank's dyadic grid, IVF's centroid ranking): per iteration
ONE distributed aggregation job over the points, whose k×(dim+1)-row
result is collected and folded back into the next round's plan as
literals — lineage stays flat, nothing corpus-sized persists, and the
only exchange per round is the k-group partial aggregate (map-side
combined, k·dim fixed-width rows).

Cross-engine exactness (the oracle-gate contract) is the hard part:
float centroid means diverge between engines at the ULP level, and a
ULP decides an argmin tie.  Everything here is INTEGER:

- inputs quantize scan-locally to ``floor(x·1024) + 1024`` — floor of
  an exact float32→double product by a power of two, identical
  everywhere, and the +1024 shift keeps every later division operand
  non-negative (truncating vs flooring integer division agree);
- centroids live on a 1/10³ grid: ``c = (2·S·Q + n) DIV (2·n)`` is
  round-half-up rational→grid rounding in pure integer ops;
- distances are sums of squared int64 differences — on the 1/10³
  grid every quantity fits comfortably (|diff| ≤ 2048·10³, diff² ≤
  4.2e12, the 64-dim sum ≤ 2.7e14, the argmin key ≤ 2.2e15);
- argmin folds the tie rule into one monotone key ``D·k + cluster``
  (the winnowing encoding): min over exact integers, ties to the
  lowest cluster id.

The assignment step is an Arrow-batched pandas UDF over numpy int64 —
the one dense-linear-algebra spot in the repo where the relational
form loses: spelling k×dim explicit square terms per centroid builds
~5,000-node expression trees that Catalyst re-analyzes and codegen
recompiles EVERY iteration (fresh centroid literals defeat the codegen
cache; measured ~3.5 s/job at dim 64, k 8 — pure driver/compile cost,
independent of row count), while numpy does the same exact integer
arithmetic in microseconds per batch.  The UDF emits one int64 key
column; cluster id and distance decode relationally.

Overflow headroom: the update's ``2·S·Q`` bounds cluster sizes at
~2.2e12 points before bigint overflow — beyond that a production run
would switch the means to doubles and forfeit oracle-exactness, not
correctness.  (A first cut kept a 1/10⁶ grid with decimal(38,0)
accumulators; the growing-precision decimal chains planned and ran
~100× slower than this all-bigint form for no semantic gain.)

Reference analog: none (the reference pipeline has no clustering);
extends SURVEY.md §2's vector family per the LLM-pipeline mandate.
Companion to :func:`..operators.similarity.kmeans_lloyd` (float means,
never collects, feeds ``ivf_topk`` centroid training): this variant
trades the tiny per-round collect for oracle-exact integer arithmetic,
making the full iterative algorithm hash-checkable against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1024      # input quantization: floor(x * SCALE) + SHIFT
SHIFT = 1024
GRID = 10**3      # centroid coordinates are integers on a 1/GRID grid


def _quantized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = F.transform(
        F.col(vec_col),
        lambda x: (F.floor(x.cast("double") * SCALE) + SHIFT).cast("long"),
    )
    return emb.select(F.col(id_col), q.alias("xq"))


def _assign(pts: DataFrame, cents: list[list[int]], dim: int) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    k = len(cents)
    c_arr = np.asarray(cents, dtype=np.int64)  # (k, dim), grid units

    @pandas_udf("long")
    def argmin_key(xq: pd.Series) -> pd.Series:
        x = np.stack(xq.to_numpy()).astype(np.int64) * GRID  # (b, dim)
        # (b, k) exact int64 squared distances
        dd = ((x[:, None, :] - c_arr[None, :, :]) ** 2).sum(axis=2)
        return pd.Series((dd * k + np.arange(k, dtype=np.int64)).min(axis=1))

    keyed = pts.withColumn("_key", argmin_key("xq"))
    return keyed.select(
        "*",
        (F.col("_key") % k).cast("int").alias("cluster"),
        F.expr(f"_key DIV {k}").alias("d2"),
    )


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Run ``n_iter`` Lloyd rounds from the ``k`` lowest-id points and
    return the final assignment: ``id_col, cluster (int), d2`` (exact
    squared grid distance, bigint).  Empty clusters keep their previous
    centroid.  Every iteration is one job: Arrow-batched assignment
    against the iteration's centroid constants, then a k-group
    aggregate whose exchange carries k·(dim+1) fixed-width rows.

    The embedding width is derived from the seed vectors themselves
    (ADVICE r06, low: an independent ``dim`` parameter silently
    truncated wider embeddings to its default for one round and then
    crashed on the numpy shape mismatch in the next assignment).
    """
    pts = _quantized(emb, id_col, vec_col)
    cents, dim = _train_cents(pts, id_col, k, n_iter)
    return _assign(pts, cents, dim).select(id_col, "cluster", "d2")


def _train_cents(
    pts: DataFrame, id_col: str, k: int, n_iter: int
) -> tuple[list[list[int]], int]:
    """``n_iter`` Lloyd rounds over a quantized point set (``xq``
    column); returns the final grid-integer centroids and the width.
    Seeds are the ``k`` lowest-id points; empty clusters keep their
    previous centroid."""
    seeds = sorted(
        pts.orderBy(id_col).limit(k).collect(), key=lambda r: r[id_col]
    )
    if not seeds:
        raise ValueError("kmeans: input has no vectors")
    dim = len(seeds[0]["xq"])
    cents = [[int(v) * GRID for v in r["xq"]] for r in seeds]

    sum_aggs = [
        F.sum(F.element_at("xq", d + 1)).alias(f"_s{d}") for d in range(dim)
    ]
    for _ in range(n_iter):
        stats = (
            _assign(pts, cents, dim)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_n"), *sum_aggs)
            .collect()
        )
        by_cl = {r["cluster"]: r for r in stats}
        for ci in range(len(cents)):
            r = by_cl.get(ci)
            if r is None:
                continue  # empty cluster: centroid carries over
            n = int(r["_n"])
            cents[ci] = [
                (2 * int(r[f"_s{d}"]) * GRID + n) // (2 * n) for d in range(dim)
            ]
    return cents, dim


def pq_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split each vector into ``m``
    subspaces, train an exact-integer Lloyd codebook of ``k`` centroids
    per subspace (:func:`kmeans_assign` — same grid arithmetic, same
    lowest-id seeding), and emit each vector's code word per subspace
    plus its total exact squared-grid distortion.

    The PQ code table is what an IVF-PQ index stores instead of raw
    vectors (m·log2(k) bits per vector vs 4·dim bytes) — the standard
    memory-bound ANN structure at billion-vector scale.  Everything
    stays oracle-exact: per-subspace distances and the distortion sum
    are int64 on the 1/10³ grid, so the SQL twin agrees bit for bit.

    Scale shape: ``m`` independent kmeans runs (each: n_iter+1 jobs of
    one Arrow-batched assignment + one k-group aggregate whose exchange
    carries k·(dim/m + 1) rows), then an m-way join on ``id_col`` —
    AQE plans the joins over co-partitioned assignment outputs; no
    stage touches more than the vector payload once per run.

    Output: ``(id_col, code_0..code_{m-1} int, d2 bigint)``.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq_quantize: input has no vectors")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"pq_quantize: dim {dim} not divisible by m={m}")
    w = dim // m

    # the m codebook trainings are independent job chains (each round:
    # one assignment + one k-group aggregate collect) — run them
    # concurrently so Spark schedules the per-round jobs in parallel
    # (the lm/dsir model-build discipline); each chain's driver work is
    # a k×(dim/m + 1)-row collect, trivially thread-safe
    from concurrent.futures import ThreadPoolExecutor

    def train(j: int):
        sub = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * w + 1, w).alias("sub")
        )
        return kmeans_assign(sub, id_col, "sub", k=k, n_iter=n_iter).select(
            F.col(id_col),
            F.col("cluster").alias(f"code_{j}"),
            F.col("d2").alias(f"_d{j}"),
        )

    with ThreadPoolExecutor(m) as pool:
        assigns = list(pool.map(train, range(m)))
    out = None
    d2 = None
    for j, a in enumerate(assigns):
        out = a if out is None else out.join(a, id_col)
        dj = F.col(f"_d{j}")
        d2 = dj if d2 is None else d2 + dj
    return out.select(
        id_col,
        *[f"code_{j}" for j in range(m)],
        d2.cast("bigint").alias("d2"),
    )


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = 16,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
) -> DataFrame:
    """Asymmetric-distance PQ search (Jégou et al. 2011 §IV.A "ADC"):
    score every corpus vector against each query using only its PQ
    code — per query, an m×k lookup table of exact squared grid
    distances from the query subvector to each codebook centroid; a
    vector's distance is the sum of m table lookups — then take the
    ``top_k`` nearest per query (ties to the lower id).  This is the
    scoring path a billion-vector index runs over compressed codes
    instead of raw floats; at production scale an IVF probe filter
    (operators/similarity.ivf_topk) prunes the scored partition first.

    Everything is oracle-exact: codebooks come from the same
    exact-integer Lloyd as :func:`pq_quantize`, the LUTs are integer
    sums over the SAME quantized values the corpus side used (the
    query rows are corpus rows — their ``xq`` is collected, never
    re-derived from floats), and the ADC score is an int64 sum of m
    lookups.

    Scale shape: m codebook trainings (concurrent, per
    :func:`pq_quantize`), one Arrow-batched assignment per subspace
    joined on ``id_col``, then ONE scan of the m-code table against a
    broadcast of n_queries LUT rows (n_queries·m·k ints); the per-query
    rank is a WindowGroupLimit top-k, so the exchange carries at most
    (partitions × top_k) candidate rows per query — never the corpus.

    Output: ``(query_id, neighbor_id, adc_d2 bigint, rank int)``.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq_adc_topk: input has no vectors")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"pq_adc_topk: dim {dim} not divisible by m={m}")
    w = dim // m

    from concurrent.futures import ThreadPoolExecutor

    def train(j: int):
        sub = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * w + 1, w).alias("sub")
        )
        pts = _quantized(sub, id_col, "sub")
        cents, _ = _train_cents(pts, id_col, k, n_iter)
        codes = _assign(pts, cents, dim=w).select(
            F.col(id_col), F.col("cluster").alias(f"code_{j}")
        )
        # query LUT rows: the query subvectors ARE corpus rows; collect
        # their exact xq (n_queries × w ints) and fold the m×k distance
        # table in Python integer arithmetic
        qrows = pts.filter(F.col(id_col) < n_queries).collect()
        lut = {
            int(r[id_col]): [
                sum(
                    (int(x) * GRID - c) ** 2
                    for x, c in zip(r["xq"], cents[cl], strict=True)
                )
                for cl in range(k)
            ]
            for r in qrows
        }
        return codes, lut

    with ThreadPoolExecutor(m) as pool:
        trained = list(pool.map(train, range(m)))

    codes = None
    for j, (cj, _) in enumerate(trained):
        codes = cj if codes is None else codes.join(cj, id_col)

    spark = emb.sparkSession
    qids = sorted(trained[0][1])
    lut_rows = [
        tuple([qid] + [trained[j][1][qid] for j in range(m)]) for qid in qids
    ]
    lut_schema = ", ".join(
        ["query_id long"] + [f"_lut{j} array<long>" for j in range(m)]
    )
    luts = F.broadcast(spark.createDataFrame(lut_rows, lut_schema))

    adc = None
    for j in range(m):
        term = F.element_at(f"_lut{j}", F.col(f"code_{j}") + 1)
        adc = term if adc is None else adc + term

    from pyspark.sql import Window

    scored = (
        codes.crossJoin(luts)
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), adc.cast("bigint").alias("adc_d2"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "adc_d2", F.col("rank").cast("int").alias("rank"))
    )
