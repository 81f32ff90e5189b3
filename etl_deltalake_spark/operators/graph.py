"""Graph algorithms as DataFrame iterations (SURVEY §2.9 —
iterative-algorithm surface beyond label propagation).

``pagerank`` ranks nodes of an edge list by the stationary
random-surfer distribution — in a training-data pipeline, the
standard importance weight over a similarity/link graph (e.g. rank
near-duplicate clusters by centrality, or weight crawl documents by
their link graph, cf. Page et al. 1999).

No counterpart in the reference (a linear ticker ETL, main.py:1-638);
north-star extension per SURVEY §2.9. The iterative pattern
(checkpointed per-round join + groupBy, driver sees only scalars)
matches dedup.label_propagation_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    sum_decimals: int = 12,
) -> DataFrame:
    """Deterministic PageRank power iteration over an edge list:

        rank_{i+1}(v) = (1-d)/N + d · Σ_{u→v} rank_i(u) / deg(u)

    Output: (doc, rank) after ``iterations`` rounds.

    Contract (what makes this oracle-reproducible BITWISE):
     - Per-edge contributions quantize to DECIMAL(28, sum_decimals)
       before the per-target sum, so the only order-sensitive float
       reduction becomes an exact decimal sum — the same technique as
       the Lloyd trainer's decimal means. Everything else is scalar
       double arithmetic in a fixed expression order both engines
       share.
     - The node set is the distinct SOURCE endpoints: feed a
       symmetrized edge list (both directions, as near-dup pairs are)
       or isolated/dangling nodes simply don't participate. Dangling
       mass is dropped, not redistributed (ranks sum to < 1 when
       dangling nodes exist) — documented simplification; the
       redistribution term is one extra scalar aggregate per round if
       a use case needs it.

    Scale: per round one edges⋈ranks join + one groupBy(dst) — the
    shuffles carry (node, decimal) rows, never adjacency lists; edges
    and the node table are localCheckpointed once, ranks per round
    (truncating the iterative lineage, standard pattern). Driver
    traffic is the node COUNT only.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("doc")).distinct().localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    dec = f"decimal(28,{sum_decimals})"
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("doc", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("doc"),
                (F.col("rank") / F.col("deg")).cast(dec).alias("c"),
            )
            .groupBy("doc")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "doc", "left")
            .select(
                "doc",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("s"), F.lit(0).cast(dec)).cast("double")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    clustering-structure metric (a near-dup graph with many triangles
    indicates template families rather than pairwise accidents).

    Algorithm: canonicalize each undirected edge to (lo, hi) with
    lo < hi and dedup; enumerate wedges by joining the canonical
    edge list with itself on the middle vertex (lo as pivot:
    a < b, a < c, b < c by construction); close each wedge (b, c)
    against the canonical edges. Orienting every edge low→high is
    the standard trick that counts each triangle EXACTLY once and
    bounds the wedge join by the out-degree of the LOW vertex —
    on skewed (power-law) graphs this is the difference between
    deg² on the hub and deg² on typical nodes (cf. the
    degree-ordering optimization in Suri & Vassilvitskii 2011).

    Output: (node, n_triangles) for every vertex, zeros included.
    Scale: two equi-joins + groupBys, all keyed shuffles; no
    adjacency list ever materializes in one row.
    """
    lo = F.least(F.col(src_col), F.col(dst_col))
    hi = F.greatest(F.col(src_col), F.col(dst_col))
    canon = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # wedges pivoting at a: (a,b) ⋈ (a,c) with b < c
    e2 = canon.select(F.col("a").alias("a2"), F.col("b").alias("c"))
    wedges = canon.join(e2, canon["a"] == e2["a2"]).filter(
        F.col("b") < F.col("c")
    )
    # close the wedge: (b, c) must be a canonical edge
    closer = canon.select(
        F.col("a").alias("b"), F.col("b").alias("c"), F.lit(1).alias("_hit")
    )
    tri = wedges.join(closer, ["b", "c"]).select("a", "b", "c")
    nodes = canon.select(F.col("a").alias("node")).union(
        canon.select(F.col("b").alias("node"))
    ).distinct()
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles")
    )


def ancestor_paths(
    edges: DataFrame,
    child_col: str,
    parent_col: str,
    max_depth: int = 16,
) -> DataFrame:
    """Transitive ancestor closure of a parent-child hierarchy —
    Spark's answer to SQL's ``WITH RECURSIVE`` (which Spark SQL does
    not have): org charts, BOM explosions, category trees. Returns
    (node, ancestor, depth) with depth >= 1 for every ancestor
    reachable within ``max_depth`` steps.

    Iterative frontier join, the standard recursive-query expansion:
    round d joins the depth-(d−1) frontier's ancestors onto the edge
    list; the frontier is localCheckpointed per round (flat lineage)
    and the loop exits early when it empties — the driver sees one
    COUNT scalar per round, never rows. On a DAG with shared
    ancestors the same (node, ancestor) can appear via multiple
    paths; callers wanting set-closure apply distinct() (on a tree —
    the oracle fixture — paths are unique by construction).

    At 100 TB: each round is one keyed equi-join shuffling
    (node, ancestor) pairs; total work is Σ|frontier_d| — bounded by
    path count, not node count squared. Hierarchies are shallow
    (depth ≪ 20), so the round count is small and fixed.
    """
    e = edges.select(
        F.col(child_col).alias("_c"), F.col(parent_col).alias("_p")
    ).localCheckpoint(eager=True)
    cur = e.select(
        F.col("_c").alias("node"),
        F.col("_p").alias("ancestor"),
        F.lit(1).cast("bigint").alias("depth"),
    ).localCheckpoint(eager=True)
    out = cur
    for _ in range(1, max_depth):
        nxt = (
            cur.join(e, cur["ancestor"] == e["_c"])
            .select(
                "node",
                F.col("_p").alias("ancestor"),
                (F.col("depth") + 1).alias("depth"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        out = out.unionByName(nxt)
        cur = nxt
    return out
