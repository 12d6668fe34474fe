"""CDC stream sources (S1): one reader API over Kafka topics and file
directories, emitting the raw-message shape the engine consumes
(partition, offset, value).

Reference: per-stream ordered topic read with per-partition logical
readers (/root/reference/internal/reader/reader.go:145-292). Kafka's
(partition, offset) maps 1:1 onto YDB's (PartitionID, Offset); Spark's
checkpoint owns resume offsets (S5 — the reference's offset guard exists
because IT owns offsets; Spark's source checkpointing replaces it).

The Kafka path needs the spark-sql-kafka package on the cluster; the
file path (JSONL directories) is the test/dev source and needs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_SCHEMA = "partition int, offset long, value string"


def read_file_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """JSONL directory source: one object per line with partition/offset/
    value fields (what tests and local runs use)."""
    reader = spark.readStream.schema(RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def kafka_reader_options(
    bootstrap_servers: str,
    topics: str | list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The exact option set the Kafka reader is configured with —
    factored out so it is testable without a broker. ``failOnDataLoss``
    is deliberately true: the reference refuses to silently skip
    truncated topic ranges (its resume-offset guard), and so do we."""
    if isinstance(topics, list):
        topics = ",".join(topics)
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def project_kafka_records(
    df: DataFrame, table_id_by_topic: dict[str, int] | None = None
) -> DataFrame:
    """Kafka record frame (topic, partition, offset, binary value) ->
    the engine's raw shape (table_id?, partition, offset, string value).
    Pure column logic, tested on static frames with the Kafka schema."""
    cols = [
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("value").cast("string").alias("value"),
    ]
    if table_id_by_topic is not None:
        mapping = F.create_map(
            *[x for t, i in table_id_by_topic.items() for x in (F.lit(t), F.lit(i))]
        )
        cols.insert(0, mapping.getItem(F.col("topic")).alias("table_id"))
    return df.select(*cols)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    table_id_by_topic: dict[str, int] | None = None,
) -> DataFrame:
    """Kafka topic(s) -> (table_id?, partition, offset, value).

    ``maxOffsetsPerTrigger`` is the back-pressure bound — the analog of
    the reference's 1000-event drains and channel caps (§6 constants).
    Multi-topic subscription restores the reference's one-queue-per-
    process model (O1): a single streaming DataFrame carries every
    stream, discriminated into table ids via ``table_id_by_topic``.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        bootstrap_servers, topics, starting_offsets, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return project_kafka_records(reader.load(), table_id_by_topic)


def read_file_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch flavor of the file source (for the pure-batch kernel and the
    command-topic drain, S12)."""
    return spark.read.schema(RAW_SCHEMA).json(path)
