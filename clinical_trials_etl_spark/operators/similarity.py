"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine top-k: the exactness baseline. Dot product and norms
  are JVM array expressions (zip_with + aggregate) in deterministic
  element order, so Spark and the DuckDB oracle produce bit-identical
  doubles.
- LSH-bucketed ANN (random hyperplanes): the 100 TB scale path — the
  16-bit signature turns the O(n) scan per query into a bucket lookup;
  hyperplanes are derived deterministically from xxhash64 so executors
  need no broadcast state and re-runs are reproducible.
- Embedding-cosine near-dup: all pairs above a cosine threshold within
  LSH buckets (the embedding arm of the dedup suite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

QUERY_VEC_ID = 0  # deterministic query point for the top-k demos
TOP_K = 10
N_PLANES = 16


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _vec_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def q_sim_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k of QUERY_VEC_ID against all other vectors.
    Single pass, no shuffle except the final TakeOrderedAndProject."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _vec_double(F.col("embedding")).alias("qvec")
    )
    others = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", "label", _vec_double(F.col("embedding")).alias("vec")
    )
    joined = others.join(F.broadcast(q))  # 1-row broadcast, no shuffle
    sim = F.round(cosine(F.col("vec"), F.col("qvec")), 6)
    return (
        joined.select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(TOP_K)
    )


SQL_SIM_BRUTE = f"""
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), o AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, label,
       ROUND(
         list_aggregate(list_transform(range(1, len(vec) + 1),
                        i -> vec[i] * qvec[i]), 'sum')
         / (sqrt(list_aggregate(list_transform(range(1, len(vec) + 1),
                 i -> vec[i] * vec[i]), 'sum'))
          * sqrt(list_aggregate(list_transform(range(1, len(qvec) + 1),
                 i -> qvec[i] * qvec[i]), 'sum'))), 6) AS cos_sim
FROM o, q
ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
"""


def hyperplane_signature(vec_col, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane LSH signature as an int. Plane p's component for
    dimension i is a deterministic pseudo-random +-1 from
    xxhash64(p, i) — reproducible on any executor with zero state."""
    dim = F.size(vec_col)
    def plane_bit(p):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), dim - 1),
                lambda x, i: x
                * F.when(F.xxhash64(F.lit(p), i).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
    sig = plane_bit(0)
    for p in range(1, n_planes):
        sig = sig + plane_bit(p)
    return sig


def q_sim_ann_lsh_topk(spark, sf_dir):
    """ANN variant of the top-k: only candidates whose hyperplane
    signature is within hamming distance 2 of the query's signature are
    scored (multi-probe LSH). Spark-only (rows-only driver check; recall
    vs brute force is asserted in tests/test_similarity.py)."""
    e = _t(spark, sf_dir, "embeddings")
    vec = _vec_double(F.col("embedding"))
    sigs = e.select("vec_id", "label", vec.alias("vec")).withColumn(
        "sig", hyperplane_signature(F.col("vec"))
    )
    q = sigs.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vec").alias("qvec"), F.col("sig").alias("qsig")
    )
    cand = sigs.filter(F.col("vec_id") != QUERY_VEC_ID).join(F.broadcast(q))
    near = cand.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= 2
    )
    sim = F.round(cosine(F.col("vec"), F.col("qvec")), 6)
    return (
        near.select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(TOP_K)
    )


def q_sim_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cos >= 0.95) found via LSH
    buckets: join on exact signature, verify cosine. Scale path: the
    self-join keys on the 16-bit signature, so comparisons stay within
    buckets. Spark-only."""
    e = _t(spark, sf_dir, "embeddings")
    sigs = e.select(
        "vec_id", _vec_double(F.col("embedding")).alias("vec")
    ).withColumn("sig", hyperplane_signature(F.col("vec")))
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = a.join(
        b,
        (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6)
    return (
        cand.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
        .orderBy("vec_a", "vec_b")
    )


QUERIES = {
    "sim_bruteforce_topk": (q_sim_bruteforce_topk, SQL_SIM_BRUTE),
    "sim_ann_lsh_topk": (q_sim_ann_lsh_topk, None),
    "sim_near_dup_pairs": (q_sim_near_dup_pairs, None),
}
