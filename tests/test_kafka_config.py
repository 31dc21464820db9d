"""Kafka source seam: option-shape tests (no broker/connector here) and a
REAL decode test — the wire-schema payload path runs against a constructed
batch frame, so the from_json/tolerance/metadata logic is fully exercised
without Kafka."""

from __future__ import annotations

import json

from phabricator_etl_spark.sources.kafka import (
    WIRE_SCHEMA,
    KafkaConfig,
    decode_events,
    reader_options,
)

ENV = {
    "KAFKA_BOOTSTRAP_SERVERS": "broker-1:9092,broker-2:9092",
    "KAFKA_TOPIC": "events",
    "KAFKA_MAX_OFFSETS_PER_TRIGGER": "500000",
}


def test_reader_options_shape():
    cfg = KafkaConfig.from_env(ENV)
    opts = reader_options(cfg)
    assert opts["kafka.bootstrap.servers"] == ENV["KAFKA_BOOTSTRAP_SERVERS"]
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "500000"
    assert opts["failOnDataLoss"] == "true"


def test_decode_events_typed_and_tolerant(spark):
    good = json.dumps(
        {"event_id": 7, "ts": "2025-03-01 12:00:00", "user_id": 3, "event_type": "click", "value": 1.5}
    ).encode()
    garbage = b"\x00not json"
    import datetime

    t0 = datetime.datetime(2025, 3, 1, 12, 0, 1)
    wire = spark.createDataFrame(
        [
            (b"k1", good, "events", 0, 100, t0, 0),
            (b"k2", garbage, "events", 1, 101, t0, 0),
        ],
        WIRE_SCHEMA,
    )
    rows = {r["offset"]: r for r in decode_events(wire).collect()}
    ok = rows[100]
    assert (ok["event_id"], ok["user_id"], ok["event_type"], ok["value"]) == (7, 3, "click", 1.5)
    assert ok["ts"] is not None and not ok["is_corrupt"]
    assert ok["kafka_partition"] == 0
    bad = rows[101]
    assert bad["is_corrupt"] and bad["event_id"] is None  # survives as a NULL row


def test_stream_reader_is_lazy(spark):
    # building the reader must not require a broker or the connector jar
    from phabricator_etl_spark.sources.kafka import stream_reader

    r = stream_reader(spark, KafkaConfig.from_env(ENV))
    assert r is not None  # .load() is what needs the connector; never called
