"""``TABLE(LIST_FILES('@src/path'))`` — object-store listing as a table (S13).

Reference usage (``/root/reference/industry-examples/ai_generate.sql:19-23``;
``logistics_AI.sql:309-358``; ``media_ai.sql:247``)::

    SELECT path, content FROM TABLE(LIST_FILES('@s3source/manifests'))
    WHERE path LIKE '%.pdf'

Spark-first mapping: the built-in ``binaryFile`` source — a distributed scan
yielding ``(path, modificationTime, length, content)`` rows, with
pushed-down path filters. ``content`` is the file's bytes (the `file` handle
Dremio passes to AI_GENERATE, SURVEY §1.2); for listing-only workloads pass
``with_content=False`` and the column is dropped before any byte is read
(column pruning reaches the source, so content IO never happens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def list_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    with_content: bool = True,
    recursive: bool = True,
) -> DataFrame:
    """Rows of file handles under ``path``: ``path STRING,
    modification_time TIMESTAMP, length BIGINT[, content BINARY]``."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    df = df.withColumnRenamed("modificationTime", "modification_time")
    if not with_content:
        df = df.drop("content")
    return df
