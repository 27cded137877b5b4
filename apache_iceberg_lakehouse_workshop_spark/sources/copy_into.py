"""``COPY INTO`` — bulk file loading into an existing table (S12).

Reference semantics (``/root/reference/industry-examples/COPY INTO EXAMPLE/
example.sql:13-21``)::

    COPY INTO healthcare.raw.patient_data
    FROM '@s3source/copyintodata' REGEX '.*\\.csv'
    FILE_FORMAT 'csv' (EXTRACT_HEADER 'true', FIELD_DELIMITER ',',
                       RECORD_DELIMITER '\\n')

i.e. enumerate files under a directory, filter by regex, parse with the
given format options, **project header-named fields onto the target table's
declared schema** (schema-projected ingestion, SURVEY §1.3), append.

Spark-first mapping: one distributed ``spark.read.csv`` over the directory
(executors parse in parallel; no driver-side file loop), regex filtering via
``pathGlobFilter`` when the regex is a simple glob, else a distributed
``input_file_name()`` filter; column projection + cast to the target schema;
append through the lakehouse snapshot commit. At 100 TB this is exactly how
Spark bulk-ingests: file listing on the driver (cheap), splits fan out to
executors, one atomic commit at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lakeshim import LakeTable


def _read_files(
    spark: SparkSession,
    src_dir: str,
    regex: str | None,
    file_format: str,
    options: dict[str, str],
) -> DataFrame:
    fmt = file_format.lower()
    reader = spark.read.options(**options)
    if fmt == "csv":
        df = reader.csv(src_dir)
    elif fmt == "json":
        df = reader.json(src_dir)
    elif fmt == "parquet":
        df = reader.parquet(src_dir)
    else:
        raise ValueError(f"unsupported FILE_FORMAT {file_format!r}")
    if regex:
        # Dremio REGEX matches the path relative to the FROM dir
        # (example.sql:15 '.*\.csv'). Filter distributed, on executors.
        pat = regex
        df = df.withColumn("_src", F.input_file_name()).filter(
            F.col("_src").rlike(pat)
        ).drop("_src")
    return df


def copy_into(
    table: LakeTable,
    src_dir: str,
    regex: str | None = None,
    file_format: str = "csv",
    extract_header: bool = True,
    field_delimiter: str = ",",
    **extra_options: str,
) -> int:
    """Execute COPY INTO; returns the new snapshot id.

    Header-named source fields are projected onto the target schema by
    (case-insensitive) name and cast to the declared types; source columns
    the table doesn't declare are dropped; declared columns missing from the
    source become NULL — the projection contract of
    ``COPY INTO EXAMPLE/example.sql:5-21`` (CSV headers `patient_id,name,
    age,...` onto the declared table).
    """
    spark = table.spark
    meta = table._load_meta()
    if meta.get("schema") is None:
        raise ValueError("COPY INTO requires a declared target schema")
    from pyspark.sql import types as T

    target = T.StructType.fromJson(meta["schema"])

    options = {"sep": field_delimiter, **extra_options}
    if file_format.lower() == "csv":
        options["header"] = "true" if extract_header else "false"
    df = _read_files(spark, src_dir, regex, file_format, options)

    by_lower = {c.lower(): c for c in df.columns}
    projected = []
    for field in target.fields:
        src = by_lower.get(field.name.lower())
        if src is not None:
            projected.append(F.col(src).cast(field.dataType).alias(field.name))
        else:
            projected.append(F.lit(None).cast(field.dataType).alias(field.name))
    return table.append(df.select(*projected))
