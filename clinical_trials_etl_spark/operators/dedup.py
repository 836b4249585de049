"""Deduplication suite over ``documents`` — first-class training-data ops.

Scale design notes (100 TB):
- exact dedup: hash-groupBy on a fingerprint — one shuffle keyed by the
  digest, uniform by construction (cryptographic hash), no skew.
- MinHash+LSH: shingling and the k minhashes are pure JVM expressions
  (xxhash64 + array ops) — no Python, no UDF; candidate generation is a
  self-equi-join on (band_id, band_hash) buckets, which Catalyst executes
  as a shuffle hash join on a well-distributed key. Pairwise work is
  bounded by bucket size, never O(n^2).
- SimHash: 64-bit signature from token hashes, banded the same way;
  hamming verification uses bit_count(xor) JVM-side.
- n-gram Jaccard: exact verification join, used on LSH candidates (here
  also demonstrated standalone on a bounded subset for the oracle).
- embedding near-dup: see operators/similarity.py for the ANN scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clinical_trials_etl_spark.operators.common import scan_parallel

N_MINHASH = 32
N_BANDS = 8  # rows per band = N_MINHASH // N_BANDS = 4
SHINGLE_K = 3


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


def _shingles(col):
    """k-word shingles as strings (JVM-side; sequence+slice, no UDF)."""
    toks = _tokens(col)
    n = F.size(toks)
    return F.when(
        n >= SHINGLE_K,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - SHINGLE_K + 1),
                lambda i: F.array_join(F.slice(toks, i, SHINGLE_K), " "),
            )
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via md5 fingerprint group-count (reference analog:
    DuplicateKeyError accounting, mongodb_storage.py:422-431)."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    return d.groupBy(fp.alias("fp")).agg(
        F.count("*").alias("copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    ).orderBy("keeper_doc_id")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, COUNT(*) AS copies, MIN(doc_id) AS keeper_doc_id
FROM documents GROUP BY fp ORDER BY keeper_doc_id
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard similarity for candidate pairs sharing at
    least one shingle (bounded to doc_id < 300 so the oracle join stays
    cheap; the unbounded path goes through MinHash-LSH below)."""
    # lazy localCheckpoint: the self-join below would otherwise
    # re-shingle both sides (same multi-evaluation shape as the LSH
    # queries; only the cheap explode re-runs per side now)
    d = (
        scan_parallel(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300))
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    ).localCheckpoint(eager=False)
    ex = d.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_NGRAM = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                   i -> array_to_string(toks[i:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 300)
), ex AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
FROM inter
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.2
ORDER BY doc_a, doc_b
"""


def q_dedup_cluster_cc(spark, sf_dir):
    """Near-dup CLUSTERS: connected components over the exact-Jaccard
    pair graph (q_dedup_ngram_jaccard), labelling every clustered doc
    with the minimum doc_id of its component — the canonical "keep one
    per duplicate cluster" step a pair list alone cannot provide
    (A~B~C chains where A!~C must still collapse to one keeper).
    Components run the O(log^2 n) large-star/small-star alternation
    (operators/graph.py), diameter-independent; the DuckDB oracle is
    the same closure via WITH RECURSIVE."""
    from clinical_trials_etl_spark.operators.graph import connected_components

    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("cluster_id", "doc_id")


SQL_DEDUP_CLUSTER_CC = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                   i -> array_to_string(toks[i:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 300)
), ex AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.2
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
)
SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_id
FROM reach GROUP BY node
ORDER BY cluster_id, doc_id
"""


def q_dedup_keep_canonical(spark, sf_dir):
    """The end-to-end deduplicated corpus: every document EXCEPT
    non-keeper near-dup cluster members (keeper = min doc_id per
    component, from q_dedup_cluster_cc). The kept set is what a
    training pipeline actually feeds downstream; expressed as one
    LEFT ANTI join of the corpus against the non-keeper members —
    at scale a broadcast anti-join, since cluster members are a tiny
    fraction of the corpus."""
    from clinical_trials_etl_spark.operators.graph import connected_components

    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    non_keepers = (
        connected_components(pairs)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    d = _t(spark, sf_dir, "documents")
    return (
        d.join(F.broadcast(non_keepers), "doc_id", "left_anti")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


SQL_DEDUP_KEEP_CANONICAL = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                   i -> array_to_string(toks[i:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 300)
), ex AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.2
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
), members AS (
  SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_id
  FROM reach GROUP BY node
)
SELECT d.doc_id, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM members WHERE doc_id <> cluster_id)
ORDER BY d.doc_id
"""


LONG_MAX = (1 << 63) - 1


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + array<long> of N_MINHASH min-hashes, all JVM expressions.

    Hash family i is ``xxhash64(i, shingle)`` (seeded by the function
    index). Computed in ONE aggregate pass: the shingle array is the
    aggregate's input — evaluated exactly once — and the accumulator is
    the running element-wise min of the per-shingle hash vector. The
    obvious ``array(array_min(transform(sh, ...)) for i ...)`` form
    re-evaluates the shingle construction once per hash function (32x;
    higher-order expressions inline their inputs), and its idiomatic
    Python spelling ``lambda s, i=i:`` is a two-parameter lambda that
    PySpark binds as (element, index) — silently replacing the seed
    with the array position and collapsing all 32 functions into one
    (tests/test_similarity.py pins both the seeds-differ property and
    equality with a per-function definitional form).

    Input is repartitioned first: the shingle+hash kernel must run at
    cluster parallelism, not scan-split parallelism (see
    common.scan_parallel)."""
    df = scan_parallel(df)
    sh = _shingles(F.col(text_col))
    sig = F.aggregate(
        sh,
        F.array_repeat(F.lit(LONG_MAX), N_MINHASH),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(N_MINHASH - 1)),
                lambda i: F.xxhash64(i, s),
            ),
            lambda a, h: F.least(a, h),
        ),
    )
    return df.select("doc_id", sig.alias("sig"))


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup: shingle -> 32 minhashes -> 8 bands of 4 ->
    bucket self-join -> estimated Jaccard = fraction of agreeing
    minhashes. Spark-only (xxhash64 has no DuckDB equivalent); the
    driver records a rows-only check, and tests/test_similarity.py pins
    the output against a pure-Python reference implementation.

    Shuffle budget: the banded candidate join carries ONLY
    (doc_id, band_id, band_hash) — the 32-long signature arrays are
    re-attached to the DISTINCT candidate pairs afterwards, so the wide
    payload is shuffled once per matched doc instead of riding the 8-way
    band explode, the bucket join, and the distinct (~8x fewer shuffled
    signature bytes than the round-1 plan)."""
    d = _t(spark, sf_dir, "documents")
    # Materialize the signatures once (lazy localCheckpoint truncates
    # lineage): the plan below branches into the two self-join sides
    # plus the two re-attach joins, and WITHOUT the checkpoint each
    # branch re-evaluates the whole shingle+hash aggregate — and the
    # join-key null-filter pushdown duplicates it AGAIN inside an
    # isnotnull() guard (~4x the kernel, measured on dedup_simhash's
    # identical shape). At design scale this materialization is the
    # standard LSH move: the signature table (n_docs x 33 longs,
    # distributed) is reused by every band pass and re-attach.
    sigs = minhash_signatures(d).localCheckpoint(eager=False)
    r = N_MINHASH // N_BANDS
    # band hash = xxhash64 over the band's slice of the signature
    bands = sigs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band_id"),
        F.col("sig"),
    ).select(
        "doc_id",
        "band_id",
        F.xxhash64(
            F.col("band_id"), F.slice("sig", F.col("band_id") * r + 1, r)
        ).alias("band_hash"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    pairs = (
        cand.join(
            sigs.select(F.col("doc_id"), F.col("sig").alias("sig_a")),
            cand.doc_a == F.col("doc_id"),
        )
        .drop("doc_id")
        .join(
            sigs.select(
                F.col("doc_id").alias("doc_id_b"), F.col("sig").alias("sig_b")
            ),
            F.col("doc_b") == F.col("doc_id_b"),
        )
        .drop("doc_id_b")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / N_MINHASH
    )
    return (
        pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


def simhash_column(text_col):
    """64-bit SimHash as a JVM expression: per-token xxhash64, per-bit
    +1/-1 vote, sign -> bit, OR-packed into a long.

    Single pass over the tokens: the hash array is the aggregate's
    INPUT (evaluated exactly once), the accumulator is a 64-wide vote
    vector, and the finish lambda packs vote signs into the long — the
    naive nested form re-tokenized and re-hashed the whole document
    once per bit (64x the hashing work; ~13 s at sf0.1 vs sub-second
    for this form)."""
    return F.expr(
        """
        aggregate(
          transform(filter(split(text, ' '), x -> x != ''),
                    tok -> xxhash64(tok)),
          array_repeat(CAST(0 AS BIGINT), 64),
          (acc, h) -> zip_with(
            acc, sequence(0, 63),
            (v, b) -> v + IF((shiftright(h, b) & 1) = 1, 1, -1)
          ),
          acc -> aggregate(
            sequence(0, 63),
            CAST(0 AS BIGINT),
            (r, b) -> r | IF(element_at(acc, b + 1) > 0,
                             shiftleft(CAST(1 AS BIGINT), b),
                             CAST(0 AS BIGINT))
          )
        )
        """
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup: 64-bit signatures, 4 bands of 16 bits for
    candidate buckets, hamming distance <= 6 via bit_count(xor).
    Spark-only (rows-only driver check; semantics pinned in tests)."""
    # lazy localCheckpoint: both self-join sides branch from this plan,
    # and join-key null-filtering would otherwise duplicate the packed
    # 64-bit vote aggregate into an isnotnull() per side (~4 signature
    # evaluations per run; see q_dedup_minhash_lsh for the same move)
    d = scan_parallel(_t(spark, sf_dir, "documents")).select(
        "doc_id", simhash_column(F.col("text")).alias("sh")
    ).localCheckpoint(eager=False)
    bands = d.select(
        "doc_id",
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_id"),
    ).withColumn(
        "band_val", F.expr("shiftrightunsigned(sh, band_id * 16) & 65535")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .orderBy("doc_a", "doc_b")
    )


EMB_COS_BOUND = 300  # vec_id bound for the exact all-pairs oracle leg
# The synthetic embeddings are i.i.d. random (no planted near-dups in
# testdata — those live in tests/test_similarity.py fixtures), so a
# real-corpus threshold like 0.95 would make the cut vacuous here. 0.3
# sits at the ~99th percentile of the pair-cosine distribution, so the
# threshold branch is exercised on a few hundred rows.
EMB_COS_THRESHOLD = 0.3


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup, exact all-pairs form — the verifier
    semantics for the LSH-bucketed scale path
    (operators/similarity.py::near_dup_pairs, which finds the same
    pairs via banded 64-bit signatures without the O(n^2) join).
    Bounded to vec_id < EMB_COS_BOUND like the n-gram Jaccard verifier
    so the DuckDB oracle join stays cheap; cosines are rounded to 6
    decimals on both engines so the threshold cut is bit-stable."""
    from clinical_trials_etl_spark.operators.similarity import (
        _vec_double,
        cosine,
    )

    e = (
        scan_parallel(
            _t(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") < EMB_COS_BOUND
            )
        )
        .select("vec_id", _vec_double(F.col("embedding")).alias("vec"))
    )
    a = e.alias("a")
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb")
    ).alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.vec_id") < F.col("vec_b"))
    sim = F.round(cosine(F.col("a.vec"), F.col("vb")), 6)
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= EMB_COS_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


SQL_DEDUP_EMB_COS = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings WHERE vec_id < {EMB_COS_BOUND}
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(
           list_aggregate(list_transform(range(1, len(a.vec) + 1),
                          i -> a.vec[i] * b.vec[i]), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(a.vec) + 1),
                   i -> a.vec[i] * a.vec[i]), 'sum'))
            * sqrt(list_aggregate(list_transform(range(1, len(b.vec) + 1),
                   i -> b.vec[i] * b.vec[i]), 'sum'))), 6) AS cos_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_sim FROM pairs
WHERE cos_sim >= {EMB_COS_THRESHOLD}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM),
    "dedup_cluster_cc": (q_dedup_cluster_cc, SQL_DEDUP_CLUSTER_CC),
    "dedup_keep_canonical": (q_dedup_keep_canonical,
                             SQL_DEDUP_KEEP_CANONICAL),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, SQL_DEDUP_EMB_COS),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, None),
    "dedup_simhash": (q_dedup_simhash, None),
}
