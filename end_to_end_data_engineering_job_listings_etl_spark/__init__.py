"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference job-listings ETL stack
(kirtishrestha/End-to-End-Data-Engineering-job-listings-etl), rebuilt
Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, Arrow on).
- ``catalog``    : parquet table loader / temp-view registration.
- ``functions/`` : column-expression libraries (normalization, dates,
  relative-time parsing, keyword extraction, text analysis, vectors).
- ``operators/`` : composite dataflow operators (dimension builder,
  fact assembly, bridge, dedup, similarity, incremental/watermark).
- ``plans/``     : end-to-end pipelines (star schema) and the BI query
  surface (the reference's Superset SQL, re-expressed on Spark).
- ``sources/`` / ``sinks/`` : readers and writers.
- ``streaming/`` : Structured Streaming analogs of the incremental path.
- ``multimodal/``: binary-column (image/audio) plumbing, decode stubbed.

All operators are declarative DataFrame compositions — no RDDs, no
row-at-a-time Python UDFs on hot paths — so Catalyst/Tungsten handle
pushdown, pruning, broadcast and codegen.
"""

__version__ = "0.1.0"
