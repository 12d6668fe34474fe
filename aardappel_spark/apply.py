"""Apply kernel: merge compacted, typed mutations into a destination table.

Behavioral spec: the reference applies one batch as UPSERTs + DELETEs plus a
checkpoint row in a single transaction
(/root/reference/internal/processor/processor.go:753-781; statement shapes
gen_query.go:342-376). Spark cannot commit two tables atomically, so we use
the idempotent-replay recipe (SURVEY.md §4.3): a position guard makes replays
converge, and MERGE-by-PK is idempotent.

Column-set semantics (the subtle part): an upsert only overwrites the columns
PRESENT in the change's merged column map; absent columns keep their current
destination value; explicitly-null columns become NULL. That is exactly the
reference's per-column-set UPSERT behavior (gen_query.go:88-108,342-363)
expressed as one full_outer merge instead of N grouped statements — Delta/
Iceberg MERGE INTO would be the managed-table equivalent.

Scale: one shuffle on the PK for the join; the mutation side is already
compacted (1 row per key). At 100 TB the destination side would be a bucketed
/ partitioned table so the join co-locates; AQE handles skew.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .casting import TableMeta, typed_mutations
from .compact import compact_changes
from .types import OP_ERASE, OP_UPDATE


def merge_mutations(dst: DataFrame, typed: DataFrame, meta: TableMeta) -> DataFrame:
    """Post-apply state of ``dst`` after applying typed mutations.

    ``typed`` is ``casting.typed_mutations`` output: one row per key, with
    ``op``, typed PK/value columns, and ``_columns`` (the merged raw map,
    used only for per-column presence).
    """
    pk = meta.primary_key
    mut = typed.withColumnRenamed("op", "_op")

    joined = dst.alias("d").join(mut.alias("m"), on=pk, how="full_outer")

    is_erase = F.col("_op") == OP_ERASE
    is_update = F.col("_op") == OP_UPDATE
    no_change = F.col("_op").isNull()

    out_cols: list[Column] = [F.col(c) for c in pk]
    for c in meta.value_columns:
        present = F.map_contains_key(F.col("m._columns"), F.lit(c))
        out_cols.append(
            F.when(no_change, F.col(f"d.{c}"))
            .when(is_update & present, F.col(f"m.{c}"))
            .otherwise(F.col(f"d.{c}"))
            .alias(c)
        )

    # erase drops the row entirely (DELETE FROM ... ON, gen_query.go:365-376)
    return joined.filter(~F.coalesce(is_erase, F.lit(False))).select(*out_cols)


def apply_batch(
    dst: DataFrame,
    raw_events: DataFrame,
    meta: TableMeta,
    checkpoint: tuple[int | Decimal, int | Decimal] | None = None,
) -> DataFrame:
    """Full batch kernel: parsed events -> stale-filter -> compact -> cast
    -> merge. ``checkpoint`` implements the replay guard (F1): changes with
    position STRICTLY BELOW the stored checkpoint are dropped
    (processor.go:435-445 uses LessThan; the quorum cut is strictly-less so
    an event at exactly the checkpoint has NOT been applied yet —
    README.md:140-143). At-least-once delivery + idempotent apply =
    exactly-once effect.
    """
    ev = raw_events
    if checkpoint is not None:
        cs, ct = Decimal(checkpoint[0]), Decimal(checkpoint[1])
        ev = ev.filter(
            F.struct("step", "tx_id")
            >= F.struct(
                F.lit(cs).cast("decimal(20,0)").alias("step"),
                F.lit(ct).cast("decimal(20,0)").alias("tx_id"),
            )
        )
    compacted = compact_changes(ev)
    typed = typed_mutations(compacted, meta)
    return merge_mutations(dst, typed, meta)
