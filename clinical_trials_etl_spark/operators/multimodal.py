"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a
deterministic stub behind ``_decode_payload`` (clearly marked); the
Spark-side plumbing — binary schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and tested. The payload column here is
synthesized from ``documents.text`` (UTF-8 bytes) so metadata extraction
has an exact DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from clinical_trials_etl_spark.dist import ensure_package_on_executors
from clinical_trials_etl_spark.operators.common import scan_parallel

FEATURE_DIM = 8

# Set True only in environments with real codecs (PIL/ffmpeg); the
# sandbox ships none, per the build brief.
REAL_DECODE_AVAILABLE = False


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary column + declared media type."""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def _decode_payload(payload: bytes) -> bytes:
    """STUB: real image/audio decode would go here (PIL.Image.open /
    soundfile.read). Not available in this container."""
    if REAL_DECODE_AVAILABLE:
        raise NotImplementedError("wire a real codec here")
    return payload  # deterministic fake: identity "decode"


def q_mm_metadata(spark, sf_dir):
    """Typed metadata over the binary column — pure JVM (no UDF):
    byte length + content digest."""
    d = with_payload(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "media_type",
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("digest"),
    ).orderBy("doc_id")


SQL_MM_METADATA = """
SELECT doc_id, 'application/octet-stream' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents ORDER BY doc_id
"""


def q_mm_feature_extract(spark, sf_dir):
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow record batches in, fixed-width float feature vectors out.
    The "features" are a deterministic fold of the decoded bytes (stub
    decode), so re-runs are reproducible; swap ``_decode_payload`` for a
    real codec to get real features with the identical Spark plan.
    Fully oracled (round 4): DuckDB recomputes the sha256-word features
    exactly via hex-slice -> UBIGINT, so the Arrow kernel's output is
    value-checked, not just row-counted."""
    ensure_package_on_executors(spark)
    d = with_payload(scan_parallel(_t(spark, sf_dir, "documents")))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = _decode_payload(bytes(payload))
                digest = hashlib.sha256(raw).digest()
                feats.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    schema = "doc_id long, n_bytes long, features array<double>"
    out = d.mapInPandas(extract, schema=schema)
    return out.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
    ).orderBy("doc_id")


def q_mm_frame_sample(spark, sf_dir):
    """Frame/segment sampling plumbing: split each payload into fixed
    1 KiB "frames", keep every 4th — the partition/batch shape a video
    frame-sampler needs, expressed as explode over JVM-computed offsets,
    with the byte slicing done by ``substring`` on the binary column."""
    d = _t(spark, sf_dir, "documents")
    frame_size = 64
    n_frames = F.ceil(F.length("text") / frame_size).cast("int")
    frames = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_id"),
        F.col("text"),
    ).filter(F.col("frame_id") % 4 == 0)
    # frame payload as binary (documents.text is ASCII, so char offsets ==
    # byte offsets; a real video sampler would slice the binary directly)
    frame_payload = F.encode(
        F.substring(F.col("text"), F.col("frame_id") * frame_size + 1, F.lit(frame_size)),
        "UTF-8",
    )
    return frames.select(
        "doc_id",
        F.col("frame_id").cast("long").alias("frame_id"),
        F.octet_length(frame_payload).cast("long").alias("frame_bytes"),
        F.md5(frame_payload).alias("frame_digest"),
    ).orderBy("doc_id", "frame_id")


SQL_MM_FRAME = """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(CEIL(length(text) / 64.0) AS INT))) AS frame_id
  FROM documents
)
SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
       CAST(octet_length(encode(substring(text, CAST(frame_id * 64 + 1 AS INT), 64)))
            AS BIGINT) AS frame_bytes,
       md5(substring(text, CAST(frame_id * 64 + 1 AS INT), 64)) AS frame_digest
FROM f WHERE frame_id % 4 = 0
ORDER BY doc_id, frame_id
"""


RESIZE_TARGET = 100  # target byte-width of the "resized" payload


def q_mm_resize(spark, sf_dir):
    """Resize plumbing over binary payloads via ``mapInPandas`` — the
    image-resize slot of the multimodal suite. Real resize needs a codec
    (PIL thumbnail); the deterministic stand-in decodes (stub), then
    stride-samples the byte stream down to ~RESIZE_TARGET bytes — the
    same Arrow batch shape, schema, and per-row cost profile a real
    resampler has. Because the fake is a pure byte stride over ASCII
    payloads, DuckDB can replay it exactly with string ops, giving this
    mapInPandas pipeline a full value-level oracle (digest included)."""
    ensure_package_on_executors(spark)
    d = with_payload(scan_parallel(_t(spark, sf_dir, "documents")))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            orig, small_n, digests = [], [], []
            for payload in pdf["payload"]:
                raw = _decode_payload(bytes(payload))
                stride = max(1, -(-len(raw) // RESIZE_TARGET))  # ceil div
                small = raw[::stride]
                orig.append(len(raw))
                small_n.append(len(small))
                digests.append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pd.Series(orig, dtype="int64"),
                    "resized_bytes": pd.Series(small_n, dtype="int64"),
                    "resized_digest": digests,
                }
            )

    schema = (
        "doc_id long, orig_bytes long, resized_bytes long, "
        "resized_digest string"
    )
    return d.mapInPandas(resize, schema=schema).orderBy("doc_id")


SQL_MM_RESIZE = f"""
WITH s AS (
  SELECT doc_id, text, length(text) AS n,
         GREATEST(1, CAST(CEIL(length(text) / {RESIZE_TARGET}.0) AS INT))
           AS stride
  FROM documents
), r AS (
  SELECT doc_id, n,
         array_to_string(
           list_transform(
             range(0, CAST(CEIL(n / CAST(stride AS DOUBLE)) AS INT)),
             i -> substring(text, CAST(i * stride + 1 AS INT), 1)),
           '') AS small
  FROM s
)
SELECT doc_id, CAST(n AS BIGINT) AS orig_bytes,
       CAST(length(small) AS BIGINT) AS resized_bytes,
       md5(small) AS resized_digest
FROM r ORDER BY doc_id
"""


# DuckDB twin of the mapInPandas feature fold: payload = UTF-8 bytes of
# text, feature_i = big-endian uint32 word i of sha256(payload) / 2^32
# (hex slice -> UBIGINT reproduces int.from_bytes(digest, "big") exactly)
SQL_MM_FEATURE_EXTRACT = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       round(CAST(('0x' || substring(sha256(text), 1, 8)) AS UBIGINT)
             / 4294967296.0, 6) AS f0,
       round(CAST(('0x' || substring(sha256(text), 9, 8)) AS UBIGINT)
             / 4294967296.0, 6) AS f1
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "mm_metadata": (q_mm_metadata, SQL_MM_METADATA),
    "mm_resize": (q_mm_resize, SQL_MM_RESIZE),
    "mm_feature_extract": (q_mm_feature_extract, SQL_MM_FEATURE_EXTRACT),
    "mm_frame_sample": (q_mm_frame_sample, SQL_MM_FRAME),
}
