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

    seeds = sorted(
        pts.orderBy(id_col).limit(k).collect(), key=lambda r: r[id_col]
    )
    if not seeds:
        raise ValueError("kmeans_assign: input has no vectors")
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

    return _assign(pts, cents, dim).select(id_col, "cluster", "d2")


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
