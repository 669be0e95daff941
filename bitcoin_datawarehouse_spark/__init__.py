"""bitcoin_datawarehouse_spark — a PySpark-native analytics + ELT engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference repo TinTran2704/bitcoin_datawarehouse (a pandas/SQLAlchemy
ELT pipeline that delegates analytics to a remote SQL engine; see
SURVEY.md).  Two layers:

* ``pipeline``  — catalog, loaders (full refresh / incremental merge /
  delete), declarative column transforms, job runner, source adapters:
  the reference's local operator surface, re-built on Parquet +
  DataFrames (SURVEY.md §2.1-§2.10).
* ``operators`` — the analytical surface the reference outsources
  (joins, aggregations, windows, set ops; SURVEY.md §2.11) plus the
  north-star LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal; SURVEY.md §2.12), each registered as a
  named query with a DuckDB-checkable SQL oracle.

Everything is lazy DataFrames over Parquet; Catalyst/AQE do the
physical planning.  Designed for a multi-executor cluster (partition-
aware joins, broadcast hints for dims, no driver-side loops) even
though tests run on local[N].
"""

from bitcoin_datawarehouse_spark.session import get_spark
from bitcoin_datawarehouse_spark.tables import TABLES, load_table
from bitcoin_datawarehouse_spark.registry import QUERIES, ORACLES, query

__all__ = ["get_spark", "TABLES", "load_table", "QUERIES", "ORACLES", "query"]
