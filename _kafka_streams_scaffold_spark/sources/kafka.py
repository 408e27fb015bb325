"""Kafka source/sink wiring (SURVEY.md §2.1 S1-S3).

Reference mapping:
- S1 ``builder.stream(topic, Consumed)`` -> ``readStream.format("kafka")``
  (``WordCountTopology.java:29``, ``PurchasesTopology.java:58``)
- S2 ``.to(topic, Produced)`` -> ``writeStream.format("kafka")``
  (``WordCountTopology.java:36``, ``PurchasesTopology.java:70``)
- S3 ``auto.offset.reset`` -> ``startingOffsets``
  (``Uppercase.java:50``, ``InterceptorTests.java:106``)

Builders are split into a *pure* options layer (testable without a
broker — this container has none) and a thin apply step. Record
metadata (topic/partition/offset/timestamp) arrives as ordinary
columns, replacing the reference's ThreadLocal ProcessorContext
capture (``RetrieveContextTransformer.java:7-23``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METADATA_COLS = ("topic", "partition", "offset", "timestamp")


@dataclass(frozen=True)
class KafkaSourceConfig:
    bootstrap_servers: str
    topic: str
    starting_offsets: str = "latest"  # reference default: Uppercase.java:50
    fail_on_data_loss: bool = True
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
            **self.extra,
        }


@dataclass(frozen=True)
class KafkaSinkConfig:
    bootstrap_servers: str
    topic: str
    checkpoint_location: str
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
            "checkpointLocation": self.checkpoint_location,
            **self.extra,
        }


def read_stream(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    return spark.readStream.format("kafka").options(**cfg.options()).load()


def read_batch(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """Batch read of a topic (offset-bounded) — the Kafka analog of the
    reference's replay-audit-topic-to-end pattern
    (``FailProofInterceptor.java:88-110``)."""
    opts = cfg.options()
    opts.pop("failOnDataLoss", None)
    # "latest" (the streaming default) is meaningless for a bounded
    # replay — latest..latest reads nothing — so batch maps it to a
    # full-topic read; an explicit offset-range JSON passes through.
    if opts.get("startingOffsets") == "latest":
        opts["startingOffsets"] = "earliest"
    opts["endingOffsets"] = "latest"
    return spark.read.format("kafka").options(**opts).load()


def decode_kv(df: DataFrame) -> DataFrame:
    """Kafka binary key/value -> strings, metadata kept as columns."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        *[F.col(c) for c in METADATA_COLS],
    )


def encode_kv(df: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
    """Columns -> Kafka key/value; value is a deterministic JSON object
    (the GsonSerde analog, ``serde/GsonSerde.java:20-25``)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )


def write_stream(df: DataFrame, cfg: KafkaSinkConfig, output_mode: str = "update"):
    return (
        df.writeStream.format("kafka")
        .outputMode(output_mode)
        .options(**cfg.options())
    )
