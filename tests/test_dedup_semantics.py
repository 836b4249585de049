"""SimHash semantic pinning: the optimized single-pass signature must
equal the naive definitional form (per-bit token vote), and signatures
must behave like a locality-sensitive hash (hamming 0 for identical
text, small for near-identical, independent docs differ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_trials_etl_spark.operators.dedup import simhash_column

# the definition, executed literally: for each bit, re-scan the tokens
# and vote +1/-1 on that bit of each token hash
NAIVE_SIMHASH = """
aggregate(
  sequence(0, 63),
  CAST(0 AS BIGINT),
  (acc, b) -> acc | IF(
    aggregate(
      filter(split(text, ' '), x -> x != ''),
      CAST(0 AS BIGINT),
      (v, tok) -> v + IF((shiftright(xxhash64(tok), b) & 1) = 1, 1, -1)
    ) > 0,
    shiftleft(CAST(1 AS BIGINT), b),
    CAST(0 AS BIGINT)
  )
)
"""

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),       # identical to 0
    (2, "the quick brown fox leaps over the lazy dog today "
        "while the sun shines on the quiet river bank and birds sing"),
    (3, "the quick brown fox jumps over the lazy dog today "
        "while the sun shines on the quiet river bank and birds sing"),  # 1 word off vs 2
    (4, "completely different content about spark shuffles and "
        "parquet footers in a distributed lake table engine"),
    (5, "x"),
    (6, ""),
]


def _sigs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return df.select(
        "doc_id",
        simhash_column(F.col("text")).alias("fast"),
        F.expr(NAIVE_SIMHASH).alias("naive"),
    ).collect()


def test_optimized_equals_naive_definition(spark):
    for r in _sigs(spark):
        assert r["fast"] == r["naive"], r["doc_id"]


def test_simhash_locality(spark):
    sig = {r["doc_id"]: r["fast"] for r in _sigs(spark)}

    def hamming(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert hamming(sig[0], sig[1]) == 0             # identical text
    assert 0 < hamming(sig[2], sig[3]) <= 12        # one-word edit: near
    assert hamming(sig[0], sig[4]) > 12             # unrelated: far
