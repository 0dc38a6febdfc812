"""Distributed graph analytics: PageRank over an item co-occurrence graph.

Connected components already live in ``operators/dedup.py`` (label
propagation + large-star/small-star for dup clusters); this module adds
the other workhorse graph primitive a corpus pipeline needs — PageRank
for importance-weighting sources/documents in a link graph (e.g.
ranking crawl domains before sampling, the CommonCrawl harmonic-rank
trick).

Scale design: each iteration is exactly one shuffle — ``edges ⋈ ranks``
on src (edges pre-partitioned once and reused via persist), then an
aggregation on dst. Ranks is a nodes-sized table (≪ edges); AQE
broadcasts it when it fits, degenerating the iteration to a map-side
join + one aggregation shuffle. Lineage is truncated per iteration with
``localCheckpoint`` exactly as in the CC loops (dedup.py:448) so K
iterations never build a 2^K plan.

Determinism for the oracle gate: per-node contributions sum in
DECIMAL(38,18) (addition associative ⇒ order-free), per-row double
arithmetic (divide, damp, add) is IEEE-identical on Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetric_edges(pairs: DataFrame, a: str = "src", b: str = "dst") -> DataFrame:
    """Undirected → directed: emit both orientations of each pair."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank on a directed edge list ``(src, dst)``.

    Nodes are the distinct edge endpoints; every node is assumed to have
    out-degree ≥ 1 (true for symmetric graphs — use
    :func:`symmetric_edges`), so there is no dangling-mass term and the
    per-iteration update is exactly

        r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)

    Returns ``(node, rank)``. The edge and degree tables are persisted
    once and reused across iterations; ranks are localCheckpoint'ed per
    round to truncate lineage.
    """
    ed = edges.select("src", "dst").persist()
    outdeg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    nodes = (
        ed.select(F.col("src").alias("node"))
        .unionByName(ed.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # 1-row statistic, same spirit as the CC convergence probe
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            ed.join(outdeg, "src")
            .join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("in_mass")
        )
        # symmetric graph ⇒ every node receives mass; keep the left join
        # anyway so directed graphs with sink-only nodes stay correct
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    for df in (ed, outdeg, nodes):
        df.unpersist()
    return ranks


def copurchase_edges(lineitem: DataFrame, min_pair_count: int = 1) -> DataFrame:
    """Item co-purchase pairs: parts appearing in the same order.

    Self-join on the order key with ``part_a < part_b`` (each unordered
    pair once); per-order duplicate part rows collapse first so the join
    is distinct-keyed. Returns ``(src, dst, pair_count)`` undirected
    pairs weighted by co-occurrence count.
    """
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    )
    counted = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("pair_count"))
    if min_pair_count > 1:
        counted = counted.filter(F.col("pair_count") >= min_pair_count)
    return counted
