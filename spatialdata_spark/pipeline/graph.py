"""Distributed graph analytics on DataFrames.

The connected-components machinery (large-star/small-star) lives with
its consumer in ``pipeline/dedup.py``; this module holds the general
graph operators, starting with PageRank (Brin & Page 1998) — the
canonical iterative link-analysis algorithm and the classic "needs a
real distributed engine" workload.

Design notes (the repo's standing exactness contract):

* **Fixed-point int64 arithmetic end-to-end.**  Float PageRank is
  summation-order-dependent, so a shuffled partial aggregation could
  never replay bit-exactly in a sequential SQL engine.  Ranks here are
  integers on a ``scale``-denominated grid; every per-iteration sum is
  an int64 sum (order-free) and every division is integer (floor)
  division — the whole power iteration replays EXACTLY in DuckDB with
  plain ``//`` arithmetic, unrolled one CTE per iteration.
* **Per-iteration shape**: ranks are a NODE-sized table (orders
  smaller than the edge table — the dimension/vocabulary contract used
  throughout this repo).  Each iteration is one rank⋈edge join
  (broadcast-gated on local masters; on a cluster AQE decides, and at
  the billion-node scale the documented swap is co-partitioning edges
  and ranks by source key ONCE so every iteration's join reuses the
  same partitioning with zero re-shuffle) followed by one map-side-
  combinable SUM per destination.  The edge table is scanned k times
  but never re-shuffled.
* **No driver-side data**: the only collect is the node COUNT (one
  scalar, needed for the teleport term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_propagation", "pagerank"]


def pagerank(
    edges: DataFrame,
    k: int = 3,
    scale: int = 10**9,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``k`` unrolled power iterations of fixed-point PageRank over a
    directed edge list (pass each undirected edge in both directions).

    Every node starts at ``scale // N``; one iteration is::

        rank'(v) = B + (damping_num * sum_{u->v} (rank(u) // outdeg(u)))
                       // damping_den
        B        = ((damping_den - damping_num) * scale)
                       // (damping_den * N)

    All quantities are int64 (ranks are bounded by ``scale``, so the
    damped sum is bounded by ``damping_num * scale`` — far inside
    int64 at the default ``scale=1e9``), hence bit-exact under any
    aggregation order and replayable as plain SQL.  Dangling inputs
    are supported (a node with no in-edges gets the teleport term
    ``B`` alone); rank mass lost to floor division and to dangling
    out-edges is NOT redistributed — the same convention the SQL
    replay uses, documented so both sides agree exactly.

    Returns ``(node, rank_fp)`` with ``rank_fp`` the int64 fixed-point
    rank after ``k`` iterations.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # referenced by every iteration's teleport join AND the rank
        # lineage: persist so the distinct runs once, not O(k) times
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    # edge+outdeg is reused by every iteration: persist so the distinct
    # and degree aggregations run once, not k times.
    ed = e.join(deg, "src").persist()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge list (no nodes)")
    base = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)
    ranks = nodes.withColumn("rank_fp", F.lit(scale // n_nodes).cast("long"))
    for _ in range(int(k)):
        r = ranks.select(F.col("node").alias("src"), "rank_fp")
        if spark.sparkContext.master.startswith("local"):
            r = F.broadcast(r)
        contrib = (
            ed.join(r, "src")
            .select("dst", F.expr("rank_fp DIV outdeg").alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        if spark.sparkContext.master.startswith("local"):
            contrib = F.broadcast(contrib)
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(__in, 0L)) DIV {damping_den}"
                )
            ).cast("long").alias("rank_fp"),
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``k`` unrolled rounds of deterministic label propagation
    (Raghavan 2007) — community detection by iterated neighborhood
    majority vote, the cheap complement to the connected-components
    operator (CC merges everything reachable; LPA splits a component
    into densely-linked communities).

    Determinism (the classic LPA pitfall is random tie-breaking):
    labels start as the node id; each round every node adopts the
    label with the highest count among its in-neighbors, ties broken
    by SMALLEST label, and a node with no in-edges keeps its label.
    Every step is a count + an argmin/argmax over integer pairs —
    order-free, so the rounds replay exactly in SQL (one CTE pair per
    round).

    Per-round plan: one node-sized label join onto the edge list
    (broadcast-gated; co-partition edges+labels by source at scale)
    and ONE combined aggregation keyed (dst, label) followed by a
    lexicographic struct-max per dst — the (count, -label) argmax is
    a single map-side-combinable MAX of a struct, never a window.

    Returns ``(node, label)`` after ``k`` rounds.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(int(k)):
        # each round reads `labels` twice (the vote join and the
        # carry-forward coalesce) — persist the node-sized table so the
        # lineage does not double per round (2^k recompute otherwise)
        labels = labels.persist()
        lab = labels.select(F.col("node").alias("src"), "label")
        if spark.sparkContext.master.startswith("local"):
            lab = F.broadcast(lab)
        votes = (
            e.join(lab, "src")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        )
        # argmax by (count, -label): max count, ties -> smallest label
        best = votes.groupBy("dst").agg(
            F.max(F.struct(F.col("__c"), (-F.col("label")).alias("__nl"))).alias(
                "__b"
            )
        ).select("dst", (-F.col("__b.__nl")).alias("__winner"))
        if spark.sparkContext.master.startswith("local"):
            best = F.broadcast(best)
        labels = labels.join(
            best, labels["node"] == best["dst"], "left"
        ).select(
            "node",
            F.coalesce(F.col("__winner"), F.col("label")).alias("label"),
        )
    return labels
