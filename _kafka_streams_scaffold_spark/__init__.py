"""PySpark-native analytics engine with the capabilities of the
``kikulikov/-kafka-streams-scaffold`` reference (a Kafka Streams
scaffold: keyed-stream transforms, running aggregations, materialized
queryable state, resilience policies), re-expressed Spark-first and
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    SparkSession builders tuned for scale (AQE, Arrow, shuffle).
- ``tables``     Loaders for the driver's parquet star schema.
- ``operators``  Batch DataFrame semantics (the correctness surface).
- ``functions``  Reusable column expressions + JSON-Schema -> StructType.
- ``sources``    Kafka / file source+sink option builders.
- ``streaming``  Structured Streaming wrappers: update-mode aggs,
                 foreachBatch serving upsert, audit listener, stateful ops.
- ``plans``      Plan-inspection helpers (pushdown / broadcast assertions).
"""

__version__ = "0.1.0"
