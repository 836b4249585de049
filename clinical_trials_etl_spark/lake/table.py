"""Parquet-backed lake table with Iceberg-style ACID snapshot commits.

No Iceberg runtime jar ships in this container, so the engine provides
its own table format with the same guarantees the north rule needs,
implemented Spark-first:

- **Snapshot isolation / atomic commit**: every commit writes an
  immutable ``_meta/snap-<v>.json`` manifest (schema + file list +
  lineage) and atomically flips the ``_meta/_current`` pointer via
  ``os.replace``. Readers always see a complete snapshot.
- **Field-id schema evolution**: data files store columns named
  ``f_<field_id>`` (plus system columns), so *rename* is pure metadata
  (Iceberg's trick — no file rewrite, no drop+add ambiguity) and
  *widen* is a read-side cast; files written before a widen are read
  with their recorded per-file schema and unioned (Iceberg per-file
  schema semantics).
- **Bucket layout**: rows are hash-bucketed on the merge key
  (``pmod(xxhash64(key), n_buckets)`` ~ Iceberg ``bucket(N, url)``).
  MERGE rewrites only the buckets the source batch touches and re-links
  unchanged files — copy-on-write with partition pruning, which is what
  keeps a 10^10-row table mergeable: work is O(touched buckets), not
  O(table).
- **LSN-guarded MERGE**: upsert keeps the max-``lsn`` row per key;
  deletes become tombstones that *retain* their lsn so a late (lower-lsn)
  update arriving after a delete cannot resurrect the row — the
  correctness gap the reference's unconditional ``$set`` upsert has
  (trials_extractor/storage/mongodb_storage.py:229-231, noted in
  SURVEY.md §2.9).
- **Exactly-once**: commits record ``batch_id``; re-applying an
  already-committed batch is a metadata no-op, so foreachBatch retries
  and checkpoint replays converge to the identical snapshot.

On a cluster with a real Iceberg catalog the same apply code path can
emit ``MERGE INTO`` SQL instead (see ``cdc/apply.py``); this class is
the self-contained sandbox/production-parquet fallback.

Single-writer assumption (one streaming query owns the table), which is
exactly the Structured Streaming deployment model.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SYS_LSN = "_lsn"
SYS_DELETED = "_deleted"
SYS_BUCKET = "_bucket"

_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
}


def _spark_type(name: str) -> T.DataType:
    return _TYPES[name]


def _parquet_num_rows(path: str) -> int:
    """Row count from the parquet footer (driver-side metadata read —
    no Spark job)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "_meta")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------ meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        fields: list[dict],
        key_field: str,
        n_buckets: int = 16,
    ) -> "LakeTable":
        """fields: [{"id": int, "name": str, "type": str}, ...]"""
        table = cls(spark, root)
        os.makedirs(table.meta_dir, exist_ok=True)
        os.makedirs(table.data_dir, exist_ok=True)
        snap = {
            "version": 0,
            "parent": None,
            "schema": {"fields": fields, "key": key_field},
            "n_buckets": n_buckets,
            "files": [],
            "applied_batches": [],
            "lineage": [],
            "committed_at": time.time(),
        }
        table._write_snapshot(snap)
        return table

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{version:08d}.json")

    def _write_snapshot(self, snap: dict) -> None:
        path = self._snap_path(snap["version"])
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, path)
        cur_tmp = os.path.join(self.meta_dir, f"_current.tmp-{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(snap["version"]))
        os.replace(cur_tmp, os.path.join(self.meta_dir, "_current"))

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "_current")) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None) -> dict:
        if version is None:
            version = self.current_version()
        with open(self._snap_path(version)) as f:
            return json.load(f)

    # ---------------------------------------------------------- schema

    def fields(self, snap: dict | None = None) -> list[dict]:
        snap = snap or self.snapshot()
        return snap["schema"]["fields"]

    def key_field(self, snap: dict | None = None) -> str:
        snap = snap or self.snapshot()
        return snap["schema"]["key"]

    def _full_struct(self, fields: list[dict]) -> T.StructType:
        cols = [T.StructField(f["name"], _spark_type(f["type"])) for f in fields]
        cols += [
            T.StructField(SYS_LSN, T.LongType()),
            T.StructField(SYS_DELETED, T.BooleanType()),
        ]
        return T.StructType(cols)

    def registry_version(self, snap: dict | None = None) -> int:
        """Highest registry schema_ver already applied (monotonic guard:
        a late-arriving batch with an older schema_ver must not evolve
        the table backwards)."""
        snap = snap or self.snapshot()
        return snap["schema"].get("registry_ver", 1)

    def evolve(
        self, new_fields: list[dict], note: str, registry_ver: int | None = None
    ) -> None:
        """Commit a schema-only snapshot (add / rename / widen already
        validated by cdc/registry.py)."""
        snap = self.snapshot()
        snap2 = dict(snap)
        snap2["version"] = snap["version"] + 1
        snap2["parent"] = snap["version"]
        snap2["schema"] = {
            "fields": new_fields,
            "key": snap["schema"]["key"],
            "registry_ver": (
                registry_ver
                if registry_ver is not None
                else self.registry_version(snap)
            ),
        }
        snap2["lineage"] = snap["lineage"] + [
            {"type": "schema-evolution", "note": note}
        ]
        self._write_snapshot(snap2)

    # ------------------------------------------------------------ read

    def _read_files(self, snap: dict, buckets: set[int] | None) -> DataFrame:
        """Read snapshot files (grouped by their write-time physical
        schema so widened columns coexist), project to the *current*
        schema by field-id, cast as needed."""
        fields = self.fields(snap)
        files = snap["files"]
        if buckets is not None:
            files = [f for f in files if f["bucket"] in buckets]
        out_struct = self._full_struct(fields)
        if not files:
            return self.spark.createDataFrame([], out_struct)

        by_sig: dict[str, list[dict]] = {}
        for f in files:
            by_sig.setdefault(json.dumps(f["phys"], sort_keys=True), []).append(f)

        parts = []
        for sig, group in by_sig.items():
            phys = json.loads(sig)  # {"f_<id>": type, ...} + system cols
            paths = [g["path"] for g in group]
            df = self.spark.read.parquet(*paths)
            proj = []
            for fld in fields:
                phys_name = f"f_{fld['id']}"
                if phys_name in phys:
                    proj.append(
                        F.col(phys_name)
                        .cast(_spark_type(fld["type"]))
                        .alias(fld["name"])
                    )
                else:  # column added after these files were written
                    proj.append(
                        F.lit(None).cast(_spark_type(fld["type"])).alias(fld["name"])
                    )
            proj += [F.col(SYS_LSN), F.col(SYS_DELETED)]
            parts.append(df.select(*proj))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Live rows at a snapshot (tombstones filtered, system cols off)."""
        snap = self.snapshot(version)
        df = self._read_files(snap, None)
        return df.filter(~F.col(SYS_DELETED)).drop(SYS_LSN, SYS_DELETED)

    def read_raw(self, buckets: set[int] | None = None) -> DataFrame:
        """Rows incl. tombstones + system cols (merge input)."""
        return self._read_files(self.snapshot(), buckets)

    # ----------------------------------------------------------- merge

    def bucket_expr(self, key_col) -> F.Column:
        n = self.snapshot()["n_buckets"]
        return F.pmod(F.xxhash64(key_col), F.lit(n)).cast("int")

    def merge(
        self,
        source: DataFrame,
        lsn_col: str = "lsn",
        op_col: str = "op",
        batch_id: str | None = None,
        lineage: dict | None = None,
        touched_hint: set[int] | None = None,
    ) -> dict:
        """LSN-guarded keyed MERGE (I/U upsert, D tombstone), rewriting
        only touched buckets. ``source`` must carry the table's data
        columns plus ``lsn_col``/``op_col`` and be pre-deduped to one
        row per key (cdc/apply.py does the salted max-LSN dedup).

        ``touched_hint``: the exact set of buckets the source touches,
        when the caller can compute it more cheaply than running the
        source pipeline (cdc/apply.py derives it from a column-pruned
        url-only scan of the raw batch — dedup preserves the url set,
        so the hint is exact). With the hint, the expensive source
        pipeline (dedup shuffle + Arrow extraction) feeds exactly ONE
        action — the merge write — and row counts come from the written
        parquet footers driver-side; no persist, no extra job barriers
        (each extra action is a fixed cost that does not shrink with
        cores).

        Returns commit stats. Re-submitting an applied ``batch_id`` is a
        no-op (exactly-once under foreachBatch retry)."""
        snap = self.snapshot()
        if batch_id is not None and batch_id in snap["applied_batches"]:
            return {"skipped": True, "version": snap["version"]}

        fields = self.fields(snap)
        key = self.key_field(snap)
        names = [f["name"] for f in fields]

        src = source.select(
            *[F.col(n).cast(_spark_type(f["type"])).alias(n)
              for n, f in zip(names, fields)],
            F.col(lsn_col).cast("long").alias(SYS_LSN),
            (F.col(op_col) == "D").alias(SYS_DELETED),
        ).withColumn(SYS_BUCKET, self.bucket_expr(F.col(key)))

        persisted = False
        if touched_hint is not None:
            touched = set(touched_hint)
        else:
            # fallback: derive buckets from the source itself — needs a
            # second action over the pipeline, so persist it
            src = src.persist()
            persisted = True
            touched = {
                r[0] for r in src.select(SYS_BUCKET).distinct().collect()
            }

        target = self.read_raw(buckets=touched).withColumn(
            SYS_BUCKET, self.bucket_expr(F.col(key))
        )

        merged = (
            target.unionByName(src)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(key).orderBy(
                        F.desc(SYS_LSN), F.desc(SYS_DELETED)
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        out_dir = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex}")
        phys = {f"f_{f['id']}": f["type"] for f in fields}
        write_df = merged.select(
            *[F.col(f["name"]).alias(f"f_{f['id']}") for f in fields],
            F.col(SYS_LSN),
            F.col(SYS_DELETED),
            F.col(SYS_BUCKET),
        ).repartition(max(len(touched), 1), F.col(SYS_BUCKET))
        write_df.write.mode("overwrite").partitionBy(SYS_BUCKET).parquet(out_dir)

        new_files = []
        merged_rows = 0
        for bucket_dir in sorted(os.listdir(out_dir)):
            if not bucket_dir.startswith(f"{SYS_BUCKET}="):
                continue
            bucket = int(bucket_dir.split("=")[1])
            for fn in sorted(os.listdir(os.path.join(out_dir, bucket_dir))):
                if fn.endswith(".parquet"):
                    path = os.path.join(out_dir, bucket_dir, fn)
                    merged_rows += _parquet_num_rows(path)
                    new_files.append(
                        {
                            "path": path,
                            "bucket": bucket,
                            "phys": phys,
                        }
                    )

        kept = [f for f in snap["files"] if f["bucket"] not in touched]
        if persisted:
            src.unpersist()
        snap2 = {
            "version": snap["version"] + 1,
            "parent": snap["version"],
            "schema": snap["schema"],
            "n_buckets": snap["n_buckets"],
            "files": kept + new_files,
            "applied_batches": snap["applied_batches"]
            + ([batch_id] if batch_id is not None else []),
            "lineage": snap["lineage"]
            + [
                {
                    "type": "merge",
                    "batch_id": batch_id,
                    "merged_rows": merged_rows,
                    "touched_buckets": sorted(touched),
                    **(lineage or {}),
                }
            ],
            "committed_at": time.time(),
        }
        self._write_snapshot(snap2)
        return {
            "skipped": False,
            "version": snap2["version"],
            "merged_rows": merged_rows,
            "touched_buckets": len(touched),
        }
