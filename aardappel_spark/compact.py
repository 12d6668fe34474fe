"""Per-key change compaction — the query heart of the engine.

Semantics (behavioral spec from the reference's merge loop,
/root/reference/internal/dst_table/gen_query.go:395-427 and
gen_query.go:50-57; golden tests gen_query_test.go:89-203):

Scanning a batch of changes in GLOBAL ORDER (step, tx_id, arrival seq):
  * the FINAL operation per key survives (update-then-erase => delete;
    erase-then-update => upsert) — mutual cancellation;
  * consecutive updates to one key UNION their column maps, later value
    winning per column ("column-set merge": absent column != null column);
  * an erase RESETS the accumulated columns — an update after an erase
    starts fresh with only its own columns;
  * duplicate erases collapse into one delete.

Spark-first design: ONE hash aggregation keyed on (table_id, key_json)
— a single shuffle — with all per-key logic in JVM higher-order
functions (collect_list -> array_sort(comparator) -> filter ->
aggregate/map_concat under LAST_WIN). No window, no explode, no Python
UDF: the whole kernel is whole-stage-codegen-able and scales linearly
with batch size; per-key state is bounded by the batch's events for
that key (batches are quorum-bounded, reference README.md:140-143).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .types import OP_ERASE, OP_UPDATE

__all__ = ["compact_changes", "key_json"]


def key_json(key_col: Column | str = "key") -> Column:
    """Canonical per-key merge identity: JSON of the raw key fragments
    (reference serializes the key array the same way, gen_query.go:387-393)."""
    return F.to_json(F.col(key_col) if isinstance(key_col, str) else key_col)


def _cmp_pos(left: Column, right: Column) -> Column:
    """Comparator over (step, tx_id, seq) for array_sort; needed because the
    event struct carries a (non-orderable) map column."""
    return (
        F.when(left["step"] < right["step"], F.lit(-1))
        .when(left["step"] > right["step"], F.lit(1))
        .when(left["tx_id"] < right["tx_id"], F.lit(-1))
        .when(left["tx_id"] > right["tx_id"], F.lit(1))
        .when(left["seq"] < right["seq"], F.lit(-1))
        .when(left["seq"] > right["seq"], F.lit(1))
        .otherwise(F.lit(0))
    )


def compact_changes(events: DataFrame) -> DataFrame:
    """Compact a batch of parsed change events to one mutation per key.

    Input schema: types.CDC_EVENT_SCHEMA (op in {'update','erase'} only —
    heartbeats are not data and must be split off first).

    Output: one row per (table_id, key): op ('update'|'erase'), key
    (raw fragments), columns (merged map for updates, empty for erases),
    step/tx_id/seq of the winning change.

    Requires spark.sql.mapKeyDedupPolicy=LAST_WIN (session.py) so
    map_concat keeps the later value per column.
    """
    ev = events.withColumn("key_json", key_json("key"))

    order = F.struct("step", "tx_id", "seq")
    erase_pos = F.when(F.col("op") == OP_ERASE, order)

    agg = ev.groupBy("table_id", "key_json").agg(
        F.max_by("op", order).alias("op"),
        F.max_by("key", order).alias("key"),
        F.max(order).alias("last_pos"),
        F.max(erase_pos).alias("last_erase"),
        F.collect_list(
            F.struct("step", "tx_id", "seq", "op", "columns")
        ).alias("evs"),
    )

    # Updates that survive: strictly after the last erase (erase resets
    # accumulated columns — gen_query.go:403-418).
    after_erase = F.filter(
        "evs",
        lambda e: (e["op"] == OP_UPDATE)
        & (
            F.col("last_erase").isNull()
            | (_cmp_pos(e, F.col("last_erase")) > F.lit(0))
        ),
    )
    ordered = F.array_sort(after_erase, _cmp_pos)
    empty_map = F.expr("cast(map() as map<string,string>)")
    merged = F.aggregate(
        ordered,
        empty_map,
        lambda acc, e: F.map_concat(acc, F.coalesce(e["columns"], empty_map)),
    )

    # Unknown op (e.g. a heartbeat leaking into the data path) is a hard
    # error, like the reference's "unknown tx operation type" (gen_query.go:424).
    checked_op = (
        F.when(F.col("op").isin(OP_UPDATE, OP_ERASE), F.col("op"))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("compact_changes: unknown tx operation type: "), F.col("op"))
            )
        )
        .alias("op")
    )

    return agg.select(
        "table_id",
        "key_json",
        "key",
        checked_op,
        F.when(F.col("op") == OP_UPDATE, merged).otherwise(empty_map).alias("columns"),
        F.col("last_pos.step").alias("step"),
        F.col("last_pos.tx_id").alias("tx_id"),
        F.col("last_pos.seq").alias("seq"),
    )
