"""aardappel_spark — a PySpark-native rebuild of the capabilities of
ydb-platform/aardappel (CDC replication: ordered ingestion, quorum
watermarking, per-key change compaction, idempotent typed apply), plus
large-scale data-pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) designed for 100 TB-scale Spark clusters.

Reference semantics studied at /root/reference (see SURVEY.md). All code
here is idiomatic Spark DataFrame/SQL — no translation of the Go engine.
"""

__version__ = "0.1.0"
