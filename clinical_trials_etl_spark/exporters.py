"""Export sinks (SURVEY.md §2.1 S5-S9 parity, Spark-first).

The reference exports one nested document per trial as pretty JSON /
JSONL / QUOTE_ALL CSVs, flattening the nested doc into 8 child entity
tables that each carry the parent natural key
(trials_extractor/exporters/json_exporter.py:12-128,
csv_exporter.py:13-304). Spark equivalents:

- S5/S7 JSON/JSONL  -> ``df.write.json`` (JSON Lines is Spark's native
  JSON output; one object per line).
- S8 CSV QUOTE_ALL  -> ``df.write.option("quoteAll", true)`` with
  header, matching the reference's ``csv.QUOTE_ALL`` + utf-8
  (csv_exporter.py:30-35, config/settings.py:22-27).
- S9 multi-entity   -> generic schema-driven flatten: struct columns
  are star-expanded into the parent table; array-of-struct / array
  columns become child tables via ``explode``, each row stamped with
  the parent key (J2 parent-key propagation, csv_exporter.py:95-248 —
  no join needed, explode keeps parent columns).

All writers are distributed (executor-side file writes, no driver
collect); at scale the flatten is one narrow projection + one explode
per child — no shuffle at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """(S7) JSON Lines sink — exporters/json_exporter.py:104-128."""
    df.write.mode(mode).json(path)


def write_json_sections(
    df: DataFrame, out_dir: str, sections: list[str], mode: str = "overwrite"
) -> None:
    """(S6) one JSON dataset per top-level section plus the full doc —
    exporters/json_exporter.py:62-102. ``sections`` are struct columns."""
    for section in sections:
        df.select(F.col(section + ".*")).write.mode(mode).json(
            os.path.join(out_dir, section)
        )
    df.write.mode(mode).json(os.path.join(out_dir, "full"))


def write_csv_quote_all(
    df: DataFrame, path: str, delimiter: str = ",", mode: str = "overwrite"
) -> None:
    """(S8) CSV sink with the reference's dialect: QUOTE_ALL, utf-8,
    header row — exporters/csv_exporter.py:13-47."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("quoteAll", "true")
        # RFC-4180 doubled-quote escaping, matching Python csv.QUOTE_ALL
        # (Spark's default escape is backslash)
        .option("escape", '"')
        .option("delimiter", delimiter)
        .option("encoding", "UTF-8")
        .csv(path)
    )


def export_filtered_jsonl(
    df: DataFrame, predicate, limit: int, path: str, mode: str = "overwrite"
) -> None:
    """(S13) filtered + limited JSON export — the reference's
    ``find(query).limit(n)`` -> JSON file (mongodb_storage.py:443-493).
    ``predicate`` is a Column (or SQL string) filter; the limit executes
    as a distributed partial take, not a driver collect."""
    filtered = df.filter(predicate) if predicate is not None else df
    write_jsonl(filtered.limit(limit), path, mode=mode)


def flatten_entities(df: DataFrame, key: str) -> dict[str, DataFrame]:
    """(S9/J2) schema-driven flatten of a nested document DataFrame into
    a parent table + one child table per array column, every child row
    carrying the parent key — csv_exporter.py:49-250.

    - struct columns -> star-expanded into the parent with ``<col>_``
      prefixes (the reference's flat header names).
    - array<struct> columns -> child table ``(key, *struct fields)``.
    - array<scalar> columns -> child table ``(key, value)``.
    """
    parent_cols: list = []
    children: dict[str, DataFrame] = {}
    for field in df.schema.fields:
        name, dtype = field.name, field.dataType
        if isinstance(dtype, T.ArrayType):
            exploded = df.select(
                F.col(key), F.explode_outer(F.col(name)).alias("_e")
            ).filter(F.col("_e").isNotNull())
            if isinstance(dtype.elementType, T.StructType):
                child = exploded.select(F.col(key), F.col("_e.*"))
            else:
                child = exploded.select(F.col(key), F.col("_e").alias("value"))
            children[name] = child
        elif isinstance(dtype, T.StructType):
            for sub in dtype.fields:
                parent_cols.append(
                    F.col(f"{name}.{sub.name}").alias(f"{name}_{sub.name}")
                )
        else:
            parent_cols.append(F.col(name))
    parent = df.select(*parent_cols)
    return {"main": parent, **children}


def export_entities_csv(
    df: DataFrame, key: str, out_dir: str, delimiter: str = ","
) -> dict[str, str]:
    """(S9) flatten + write one QUOTE_ALL CSV dataset per entity —
    csv_exporter.py:269-304. Returns entity -> output path."""
    out: dict[str, str] = {}
    for entity, edf in flatten_entities(df, key).items():
        path = os.path.join(out_dir, entity)
        write_csv_quote_all(edf, path, delimiter=delimiter)
        out[entity] = path
    return out
