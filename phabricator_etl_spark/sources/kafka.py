"""Kafka streaming-source seam: option building + payload decoding plan.

No broker exists in this environment (and the spark-sql-kafka connector jar
is not shipped), so — exactly like the JDBC layer (sources/jdbc.py) — this
module is the CONFIG and DECODE surface, unit-tested at option/plan level
and executed only where a cluster provides the connector. What IS fully
testable here, and is where real Kafka bugs live, is the decode path:
``decode_events`` turns the connector's fixed wire schema (key/value binary,
topic/partition/offset/timestamp) into the typed events relation using the
same from_json machinery the JSONL batch source uses — and that function is
exercised against a constructed wire-shaped DataFrame in tests.

Production shape notes (100 TB/day):
- one input partition per Kafka partition; parallelism = partition count,
  so the topic must be sized for the cluster (repartition after decode if
  the keyspace is skewed);
- ``maxOffsetsPerTrigger`` paces backfills exactly like maxFilesPerTrigger
  for file sources;
- offsets live in the checkpoint — the same replay contract the custom
  Python source (pydatasource.py) implements by hand and tests end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class KafkaConfig:
    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = True
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict) -> "KafkaConfig":
        return cls(
            bootstrap_servers=env["KAFKA_BOOTSTRAP_SERVERS"],
            topic=env.get("KAFKA_TOPIC", "events"),
            starting_offsets=env.get("KAFKA_STARTING_OFFSETS", "earliest"),
            max_offsets_per_trigger=(
                int(env["KAFKA_MAX_OFFSETS_PER_TRIGGER"])
                if "KAFKA_MAX_OFFSETS_PER_TRIGGER" in env
                else None
            ),
        )


def reader_options(cfg: KafkaConfig) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "subscribe": cfg.topic,
        "startingOffsets": cfg.starting_offsets,
        "failOnDataLoss": "true" if cfg.fail_on_data_loss else "false",
    }
    if cfg.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    opts.update({k: str(v) for k, v in cfg.extra.items()})
    return opts


def stream_reader(spark: SparkSession, cfg: KafkaConfig):
    """Configured (unstarted) readStream for the topic."""
    return spark.readStream.format("kafka").options(**reader_options(cfg))


# The connector's fixed wire schema — what every Kafka batch/stream presents
# before decoding (public connector contract).
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)

EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def decode_events(wire: DataFrame) -> DataFrame:
    """Wire frame -> typed events relation.

    Tolerant decode (from_json yields NULL struct on garbage — the same
    policy as the JSONL PERMISSIVE source): bad payloads survive as NULL
    rows for a downstream validity audit instead of killing the stream.
    Kafka metadata (partition/offset) rides along for exactly-once sinks
    that dedupe on (topic, partition, offset).
    """
    parsed = wire.select(
        F.col("topic"),
        F.col("partition").cast("long").alias("kafka_partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), EVENT_JSON_SCHEMA).alias("e"),
    )
    return parsed.select(
        "topic",
        "kafka_partition",
        "offset",
        F.col("e.event_id").alias("event_id"),
        F.to_timestamp(F.col("e.ts")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        # PERMISSIVE from_json yields an all-NULL struct (not a NULL struct)
        # on garbage; event_id is required in the contract, so its absence
        # marks the corrupt row
        (F.col("e").isNull() | F.col("e.event_id").isNull()).alias("is_corrupt"),
    )
