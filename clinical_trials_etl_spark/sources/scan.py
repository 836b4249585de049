"""Directory scan sources (SURVEY.md §2.1 S1/S3/S4).

The reference enumerates ``*.html`` files non-recursively per input dir
(trials_extractor/main.py:134-138) and recursively via ``os.walk``
(utils/batch_utils.py:127-143 ``find_html_files``). Spark-first both
are one ``binaryFile`` scan — the listing is distributed, partition
sizes come from ``spark.sql.files.maxPartitionBytes``, and downstream
extraction runs over the ``content`` binary column exactly like the CDC
``html`` column."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scan_files(
    spark: SparkSession,
    directory: str,
    glob: str = "*.html",
    recursive: bool = True,
) -> DataFrame:
    """(S3/S4) all files matching ``glob`` under ``directory`` as
    (path, modificationTime, length, content[binary]). ``recursive``
    mirrors find_html_files' os.walk (batch_utils.py:127-143); False is
    the one-level main.py:134-138 scan."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(directory)
    )
