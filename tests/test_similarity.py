"""Similarity/dedup semantics: one-pass hyperplane signature equals the
per-plane definitional form; banded near-dup has perfect recall on
planted near-duplicates (ground truth = numpy brute force); ANN finds
planted neighbors; the shuffle-slimmed MinHash plan is output-identical
to the naive payload-carrying plan it replaced."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from clinical_trials_etl_spark.operators import similarity as S
from clinical_trials_etl_spark.operators import dedup as D

DIM = 64
SEED = 7


def _emb_schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )


@pytest.fixture(scope="module")
def planted(spark):
    """60 random base vectors + near-copies of vecs 0..4 (cos > 0.99)
    + one borderline pair. Ground-truth cos>=0.95 pairs via numpy."""
    rng = np.random.default_rng(SEED)
    vecs = {}
    for i in range(60):
        vecs[i] = rng.normal(size=DIM)
    # near-duplicates: id 100+i is a perturbed copy of i
    for i in range(5):
        noise = rng.normal(size=DIM) * 0.02
        vecs[100 + i] = vecs[i] + noise
    # an anti-correlated and a scaled copy (cos == 1.0 exactly)
    vecs[200] = vecs[6] * 3.0
    rows = [
        (int(k), [float(x) for x in np.asarray(v, dtype=np.float32)], 0)
        for k, v in sorted(vecs.items())
    ]
    df = spark.createDataFrame(rows, _emb_schema())

    # ground truth on the same float32-rounded values Spark sees
    ids = sorted(vecs)
    M = np.stack([np.asarray(vecs[k], dtype=np.float32).astype(np.float64) for k in ids])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    truth = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(C[i, j], 6) >= 0.95
    }
    return df, truth


def test_planted_truth_is_nonempty(planted):
    _df, truth = planted
    assert len(truth) >= 6  # 5 perturbed copies + the scaled copy


def test_near_dup_perfect_recall_and_no_false_positives(planted):
    df, truth = planted
    got = {
        (r["vec_a"], r["vec_b"])
        for r in S.near_dup_pairs(df).collect()
    }
    assert got == truth


def test_near_dup_on_testdata_equals_brute_force(spark, sf_dir):
    """The query entry plants N_PLANTED exact duplicates over the
    otherwise near-dup-free random table (max pair cosine ~0.47): the
    banded path must return exactly the planted pairs — full recall on
    the plants AND zero false positives among the 500 random vectors."""
    got = sorted(
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in S.q_sim_near_dup_pairs(spark, sf_dir).collect()
    )
    want = [
        (i, i + S.PLANT_ID_BASE, 1.0) for i in range(S.N_PLANTED)
    ]
    assert got == want


def test_ann_finds_planted_neighbors(planted, spark):
    df, _truth = planted
    out = S.ann_topk(df, query_id=0, k=5).collect()
    ids = [r["vec_id"] for r in out]
    assert ids[0] == 100  # the planted near-copy of vec 0 ranks first
    assert out[0]["cos_sim"] >= 0.99
    # deterministic across runs
    again = [r["vec_id"] for r in S.ann_topk(df, query_id=0, k=5).collect()]
    assert ids == again


def test_hyperplane_one_pass_equals_naive_definition(spark):
    """The single-pass signature (one xxhash64 per dimension, bit p =
    plane p's sign) must equal the definitional per-plane form executed
    literally."""
    naive = (
        "aggregate(sequence(0, 63), CAST(0 AS BIGINT), (r, p) -> r | IF("
        "  aggregate(zip_with(vec, sequence(0, size(vec) - 1),"
        "            (x, i) -> IF((shiftright(xxhash64(i), p) & 1) = 1, x, -x)),"
        "            CAST(0.0 AS DOUBLE), (acc, y) -> acc + y) > 0,"
        "  shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))"
    )
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    out = df.select(
        S.hyperplane_signature("vec").alias("fast"),
        F.expr(naive).alias("naive"),
    ).collect()
    for r in out:
        assert r["fast"] == r["naive"]


def test_minhash_slim_plan_is_output_identical(spark, sf_dir):
    """Differential pin: the slimmed candidate shuffle (distinct ids,
    signatures re-attached) produces exactly the pairs of the naive
    payload-carrying plan."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = D.minhash_signatures(d)
    r = D.N_MINHASH // D.N_BANDS
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(D.N_BANDS - 1))).alias("band_id"),
    ).withColumn(
        "band_hash",
        F.xxhash64(F.col("band_id"), F.slice("sig", F.col("band_id") * r + 1, r)),
    )
    a, b = bands.alias("a"), bands.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    est = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e)
        ).cast("double")
        / D.N_MINHASH
    )
    expected = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in naive.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
        .collect()
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in D.q_dedup_minhash_lsh(spark, sf_dir).collect()
    )
    assert got == expected


def test_minhash_seeds_differ_and_match_definitional_form(spark):
    """Regression for the two-parameter-lambda trap: the 32 hash
    functions must be genuinely independent (seeded by function index),
    equal to the literal per-function definition
    array_min(transform(sh, s -> xxhash64(i, s)))."""
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today again")],
        ["doc_id", "text"],
    )
    sig = D.minhash_signatures(df).collect()[0]["sig"]
    assert len(set(sig)) > 16, "hash functions collapsed to one seed"

    sh = D._shingles(F.col("text"))

    def one(i):
        return F.array_min(
            F.transform(sh, lambda s: F.xxhash64(F.lit(i), s))
        )

    naive = df.select(
        F.array(*[one(i) for i in range(D.N_MINHASH)]).alias("sig")
    ).collect()[0]["sig"]
    assert sig == naive


def test_minhash_finds_planted_text_near_dups(spark):
    """Planted near-duplicate documents (one-word edits) must surface
    with high estimated Jaccard; unrelated docs must not pair."""
    base = (
        "spark shuffles partition data across executors while parquet "
        "footers carry row group statistics for pruning and codegen "
        "keeps expressions inside the jvm pipeline for speed"
    )
    edited = base.replace("statistics", "histograms")
    docs = [
        (0, base),
        (1, edited),
        (2, "completely different words about html selectors and label "
            "value extraction across nested document trees with tables"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = {r["doc_id"]: r["sig"] for r in D.minhash_signatures(df).collect()}
    est01 = sum(a == b for a, b in zip(sigs[0], sigs[1])) / D.N_MINHASH
    est02 = sum(a == b for a, b in zip(sigs[0], sigs[2])) / D.N_MINHASH
    assert est01 >= 0.5
    assert est02 < 0.2


def test_ivf_finds_planted_neighbors(planted):
    """IVF-flat: the coarse quantizer + nprobe probing must surface the
    planted near-copy of the query vector, deterministically."""
    df, _truth = planted
    out = S.ivf_topk(df, query_id=0, k=5).collect()
    ids = [r["vec_id"] for r in out]
    assert ids[0] == 100 and out[0]["cos_sim"] >= 0.99
    again = [r["vec_id"] for r in S.ivf_topk(df, query_id=0, k=5).collect()]
    assert ids == again


def test_ivf_probes_subset_of_lists(planted):
    """The probe set must actually prune: candidates scored come from
    nprobe of the n_lists inverted lists, not the whole table."""
    df, _truth = planted
    cents = S.ivf_build(df, k=8)
    assert len(cents) == 8 and len(cents[0]) == 64
    from pyspark.sql import functions as F2
    base = df.select(
        "vec_id", S._vec_double(F2.col("embedding")).alias("vec")
    ).withColumn("list_id", S._nearest_centroid("vec", cents))
    sizes = {r["list_id"]: r["n"] for r in
             base.groupBy("list_id").agg(F2.count("*").alias("n")).collect()}
    assert len(sizes) >= 2  # quantizer actually splits the space
    assert sum(sizes.values()) == df.count()
