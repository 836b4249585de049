"""Distributed connected components — the clustering half of near-dup
deduplication.

Pair generation (MinHash-LSH / SimHash / n-gram Jaccard, see
operators/dedup.py) yields an EDGE LIST of near-duplicate pairs; turning
"pairs" into "keep one document per duplicate CLUSTER" requires the
connected components of that graph (reference analog: the per-key
DuplicateKeyError dedup in mongodb_storage.py:422-431 collapses exact
copies only — transitive near-dup chains A~B~C where A!~C need the
graph closure).

Scale design (10^10 nodes):
- Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  and Beyond", SoCC'14). Each round is a constant number of shuffles
  (one groupBy + one same-key join), and the round count is
  O(log^2 n) INDEPENDENT OF GRAPH DIAMETER — the property that matters
  at web scale, where boilerplate/template chains create near-dup
  paths thousands of hops long. Naive min-label propagation is
  O(diameter) rounds; on a 256-node path it needs ~255 rounds where
  this converges in 8 (pinned in tests/test_graph_cc.py).
- Every per-round op is a built-in DataFrame expression (groupBy.min,
  least, join on the grouping key) — whole-stage codegen, zero Python
  on the data path. The join keys are node ids, uniform after the
  first round because stars re-key edges to component minima.
- Iteration state is truncated with an eager localCheckpoint per round
  (same pattern as ivf_build): the edge set is O(V) from round 1
  onward (stars have one edge per non-root node), so checkpoint cost
  is linear in the frontier, and the logical plan stays flat instead
  of doubling per round.
- Convergence test is an O(1)-row aggregate (count + order-independent
  xxhash64 checksum of the edge multiset), not a driver collect of the
  edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(b: DataFrame) -> DataFrame:
    """One large-star round over a BIDIRECTIONAL edge set.

    Per node u with neighborhood N(u): connect every strictly larger
    neighbor to m = min(N(u) + {u}). Emits (v, m) for v in N(u), v > u.
    """
    mins = b.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("m")
    )
    return (
        b.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round. Edges are first oriented high->low; per
    node u, every smaller neighbor AND u itself connect to
    m = min of the smaller neighbors. Emits (v, m), v != m.
    """
    s = e.where(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    mins = s.groupBy("src").agg(F.min("dst").alias("m"))
    lowered = (
        s.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    selfed = mins.select(F.col("src"), F.col("m").alias("dst"))
    return lowered.unionByName(selfed).distinct()


def _edge_checksum(e: DataFrame) -> tuple:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: exact and overflow-free under ANSI mode
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("chk"),
    ).collect()[0]
    return (row["n"], row["chk"])


def connected_components_with_rounds(
    edges: DataFrame, max_rounds: int = 64
) -> tuple[DataFrame, int]:
    """Connected components of an undirected edge list.

    ``edges``: DataFrame with columns (src, dst); direction, duplicate
    edges, and self-loops are all tolerated. Returns
    ``((node, component), rounds)`` where component = the minimum node
    id in the node's component, for every node incident to >=1 edge
    (callers decide how to label isolated nodes — they have no pair,
    so for dedup they are their own keeper by construction).
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not e.take(1):
        return (
            e.select(
                F.col("src").alias("node"), F.col("dst").alias("component")
            ),
            0,
        )
    prev = None
    rounds = 0
    while rounds < max_rounds:
        b = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        e = _small_star(_large_star(b)).localCheckpoint(eager=True)
        rounds += 1
        cur = _edge_checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Converged: e is a union of stars (v, root), v != root. Roots only
    # ever appear on the dst side.
    members = e.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    )
    roots = e.select(
        F.col("dst").alias("node"), F.col("dst").alias("component")
    ).distinct()
    return members.unionByName(roots).distinct(), rounds


def connected_components(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    df, _ = connected_components_with_rounds(edges, max_rounds=max_rounds)
    return df
