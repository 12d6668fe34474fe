"""Command-topic (conflict override) handling: skip/apply instructions
for problem messages.

Behavioral spec: /root/reference/internal/processor/processor.go:99-236
(Cmd struct :99-105; Handle :157-236):
  * command JSON: {"aardapel_instance_id", "path", "key", "ts", "action"}
    — the instance-id field spelling is the reference's own (README.md:610);
  * a command matches a problem message on (instance, topic path,
    serialized key json, step, tx_id);
  * invalid actions are ignored; the LAST matching command wins;
  * no match -> -1 (caller applies the stream's problem strategy),
    skip -> 0, apply -> 1.

Spark-first: instead of re-reading the topic per problem message (the
reference's per-call reader), the command topic is read ONCE as a batch
DataFrame and joined against all problem messages — one broadcast join
for the whole batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_SKIP = "skip"
ACTION_APPLY = "apply"

CMD_SCHEMA = (
    "struct<"
    "aardapel_instance_id:string, path:string, key:array<string>, "
    "ts:array<decimal(20,0)>, action:string"
    ">"
)


def parse_commands(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw command-topic JSON -> (instance_id, path, key_json, step,
    tx_id, action, cmd_seq). Malformed commands (bad JSON / ts arity /
    unknown action) are dropped, as the reference logs-and-continues
    (processor.go:200-216)."""
    p = F.from_json(F.col(value_col), CMD_SCHEMA)
    out = raw.select(
        p["aardapel_instance_id"].alias("instance_id"),
        p["path"].alias("path"),
        F.to_json(p["key"]).alias("key_json"),
        F.get(p["ts"], 0).alias("step"),  # F.get: short ts -> NULL -> row
        F.get(p["ts"], 1).alias("tx_id"),  # dropped below, not an OOB crash
        p["action"].alias("action"),
        F.monotonically_increasing_id().alias("cmd_seq"),
    )
    return out.filter(
        F.col("step").isNotNull()
        & F.col("tx_id").isNotNull()
        & F.col("action").isin(ACTION_SKIP, ACTION_APPLY)
    )


def resolve_problem_actions(
    problems: DataFrame,
    commands: DataFrame,
    instance_id: str,
    topic_path: str,
) -> DataFrame:
    """J2/S12: annotate each problem event with its override action.

    Join on (path, key_json, step, tx_id) for this instance; the LAST
    matching command wins (max cmd_seq — processor.go:218-226). Output =
    problems + ``action`` column: 'skip' | 'apply' | null (no override).
    """
    cmds = commands.filter(
        (F.col("instance_id") == instance_id) & (F.col("path") == topic_path)
    )
    last = cmds.groupBy("key_json", "step", "tx_id").agg(
        F.max_by("action", "cmd_seq").alias("action")
    )
    ev = problems.withColumn("key_json", F.to_json("key"))
    return ev.join(
        F.broadcast(last), ["key_json", "step", "tx_id"], "left"
    ).drop("key_json")
