"""Link-graph analytics for corpus curation: PageRank + degree stats.

Web-curation pipelines rank hosts/domains by link structure (the
CommonCrawl-style companion to ``text.domain_filter``): crawl edges →
``pagerank`` per domain → keep/weight documents by source authority.

Scale design: the edge list is the only big table. Each PageRank
iteration is (ranks ⋈ out-degrees on src) → contributions → groupBy dst
— two keyed shuffles of ``(node, double)`` pairs per iteration, never
anything wider; lineage is cut every second iteration with an eager
``localCheckpoint`` (the recipe from ``dedup.connected_components``:
eager, because a lazy checkpoint materializing on an AQE broadcast
thread can deadlock against concurrent stage submission, and a plain
``persist`` leaves the logical plan growing 3^i across iterations).
Dangling mass (nodes without out-edges) is one scalar aggregate per
iteration, redistributed uniformly — the textbook formulation
(Page et al. 1999).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsflex_spark.utils.data import cut_lineage


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node (out_degree, in_degree) — one aggregate per direction."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .na.fill({"out_degree": 0, "in_degree": 0})
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
    tol: Optional[float] = None,
) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank)``, Σrank = 1.

    Duplicate edges count as parallel links (weight = multiplicity).
    ``tol`` (L1 movement) enables early stop — it adds one tiny join +
    scalar aggregate per iteration, so leave it None for fixed-cost runs.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("od")
    )
    # (node, od) with od NULL for dangling nodes
    base = nodes.join(out_deg, "node", "left").transform(cut_lineage)

    ranks = base.withColumn("rank", F.lit(1.0 / n))
    for _it in range(iters):
        prev = ranks
        # dangling mass rides the PLAN as a broadcast 1-row scalar: a
        # driver-side collect here would add one blocking job + round
        # trip PER ITERATION — pure barrier overhead that dominates small
        # graphs and serializes large ones (measured 13.4 -> 5.9 s on the
        # dup_clusters gate's 10-iteration run at sf0.1)
        dangling = F.broadcast(
            ranks.where(F.col("od").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
            )
        )
        contribs = (
            e.join(ranks.select("node", "rank", "od"), e.src == F.col("node"))
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .join(dangling)
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("__dang") / F.lit(float(n))
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)),
            )
            .select("node", "od", "rank")
        )
        # lineage cut every SECOND iteration (and on the last): each
        # checkpoint is a build-time job barrier under AQE, and one
        # un-truncated iteration only references the previous ranks
        # thrice (dangling agg, contribs join, and via prev) — shallow
        # enough that stage reuse dedupes it, while half the barriers
        # measurably cut the fixed-iteration wall (~2.8 → ~1.9 s for 6
        # iterations on the dup_clusters gate at sf0.1). Deeper
        # intervals re-double the plan per skipped cut — 2 is the
        # sweet spot before planning time comes back.
        # localCheckpoint(eager=True), NOT persist() and NOT eager=False:
        # persist keeps the full logical plan, so the per-iteration
        # analysis cost grows as 3^i (20 default iterations hang the
        # analyzer); only a checkpoint truncates the plan to a LogicalRDD.
        # And a LAZY checkpoint here materializes inside the dangling
        # mass's broadcast-exchange thread, which can ABBA-deadlock with
        # the concurrent contribs map-stage submission (RDDCheckpointData$
        # vs per-RDD locks). Eager materializes synchronously on this
        # thread before the frame is ever multi-consumed — the same safe
        # recipe as connected_components' convergence barriers.
        if _it % 2 == 1 or _it == iters - 1:
            ranks = ranks.transform(cut_lineage)
        if tol is not None:
            moved = (
                ranks.select("node", "rank")
                .join(prev.select("node", F.col("rank").alias("r0")), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("r0"))))
                .collect()[0][0]
            )
            if moved is not None and moved < tol:
                break
    return ranks.select("node", "rank")
