"""apache_iceberg_lakehouse_workshop_spark — a PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference workshop (Dremio + Apache Iceberg lakehouse,
``/root/reference``), re-expressed Spark-first:

- Spark SQL / DataFrame relational core (joins, aggs, windows, set ops)
- medallion (bronze -> silver -> gold) pipeline runner over views / CTAS
- data-quality audit operators
- AI column functions (ai_generate / ai_classify / ai_complete) with
  pluggable backends (deterministic mock for tests)
- LLM-training-data operators: dedup (exact / minhash-LSH / simhash /
  n-gram jaccard / embedding), similarity search, text analysis,
  multimodal binary columns
- a lightweight snapshot/time-travel table layer ("lakeshim") standing in
  for Iceberg where no Iceberg runtime jar is available
"""

from .session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
