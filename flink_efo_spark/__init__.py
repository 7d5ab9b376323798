"""flink_efo_spark — a PySpark-native analytics engine with the query
capabilities of the reference stream processor (Flink 1.12 fork
`heywxl/flink-efo`, surveyed in SURVEY.md).

Design: the engine is a thin, idiomatic layer over Spark DataFrames /
Spark SQL / Structured Streaming. Catalyst + Tungsten provide the
optimizer and physical execution (SURVEY.md §4); this package provides

* a session/catalog layer (:mod:`flink_efo_spark.session`,
  :mod:`flink_efo_spark.catalog`),
* the Flink SQL scalar-function surface re-expressed as native Spark
  column expressions (:mod:`flink_efo_spark.functions`),
* relational operator helpers that Spark lacks as primitives — as-of
  join, interval join, top-n, dedup (:mod:`flink_efo_spark.operators`),
* streaming semantic adapters — watermarks, windows, stateful dedup /
  top-n, changelog-mode inference (:mod:`flink_efo_spark.streaming`),
* large-scale training-data pipeline operators — minhash/simhash dedup,
  similarity search, text analysis, multimodal plumbing
  (:mod:`flink_efo_spark.operators.dedup` and friends).
"""

from flink_efo_spark.session import EfoSession, get_spark

__all__ = ["EfoSession", "get_spark"]
__version__ = "0.1.0"
