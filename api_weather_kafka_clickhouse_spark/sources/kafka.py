"""Kafka source/sink wiring (reference SURVEY.md §2-A8/A12, §2-B1/B2).

The reference runs a confluent-kafka producer with acks=all/retries
(Producer_clickhouse.py:42-54) and a manually-committed 3-topic
consumer (Consumer_clickhouse.py:114-133). In Spark both collapse to
format("kafka") options; offset tracking moves from the consumer
group to the streaming checkpoint (stronger: §2-A20).

The spark-sql-kafka connector jar is not in this image, so these
builders are exercised end-to-end with the file/memory source twins
in streaming/ and tests; the option surface below is the production
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cities import N_TOPICS, TOPIC_PREFIX

BOOTSTRAP = "kafka-1:9092,kafka-2:9092,kafka-3:9092"  # README.md:69-80 parity
# single owner of the topic fan-out contract: cities.py (routing),
# re-derived here (subscription) and in weather_datasource (planning)
TOPICS = tuple(f"{TOPIC_PREFIX}{i + 1}" for i in range(N_TOPICS))


def kafka_available(spark: SparkSession) -> bool:
    """True if the kafka connector is on the classpath (import-try
    equivalent for a JVM data source).

    The probe load() fails even WITH the connector present (the dummy
    options are invalid), so absence is detected by ERROR CLASS —
    DATA_SOURCE_NOT_FOUND / FAILED_FIND_DATA_SOURCE — via the typed
    getter, not by substring-matching an error message that varies
    across Spark versions and locales. Unclassified errors fall back
    to the conservative answer (unavailable): callers then use the
    tested file/memory twins instead of crashing later at start().
    """
    from pyspark.errors import PySparkException

    try:
        spark.readStream.format("kafka").option("subscribe", "x").option(
            "kafka.bootstrap.servers", "x:1"
        ).load()
        return True
    except PySparkException as e:
        cond = e.getCondition() or ""
        if "DATA_SOURCE_NOT_FOUND" in cond or "FAILED_FIND_DATA_SOURCE" in cond:
            return False
        # classified as something else (e.g. option validation) —
        # the source resolved, so the connector exists
        return True
    except Exception:
        return False


def to_kafka_messages(df: DataFrame, key_col: str, payload_cols: list[str] | None = None) -> DataFrame:
    """(key, value) message shape: key = city (Producer:148 — keeps
    per-city ordering within a partition), value = JSON payload."""
    payload = F.to_json(F.struct(*(payload_cols or [c for c in df.columns if c != key_col])))
    return df.select(F.col(key_col).cast("string").alias("key"), payload.alias("value"))


def write_stream_kafka(messages: DataFrame, topic: str, checkpoint: str, bootstrap: str = BOOTSTRAP):
    """Streaming Kafka sink. acks=all is the connector default; the
    reference's retries=3 maps to Spark task retries."""
    return (
        messages.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_stream_kafka(
    spark: SparkSession,
    topics: tuple[str, ...] = TOPICS,
    bootstrap: str = BOOTSTRAP,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 90,
) -> DataFrame:
    """3-topic subscribe (A12). startingOffsets=earliest parity with
    auto.offset.reset; maxOffsetsPerTrigger approximates the
    reference's 90-row batch bound (A13) as backpressure."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()
