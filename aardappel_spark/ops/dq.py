"""Declarative data-quality constraint suite (Deequ-style).

The operator a pipeline runs as its admission gate before any data
ships: a list of declarative constraints per table, evaluated in as
few passes as the constraint mix allows, emitting one row per
constraint — ``(tbl, constraint, total, violations, ok)``, all BIGINT,
so the report crosses engines exactly.

Execution shape (the 100 TB story):

- **One fused scan per table**: every row-local predicate (not-null,
  domain membership, value bounds), every uniqueness check
  (violations = ``count(*) - count(DISTINCT key)``), and the row
  totals the RI checks report all run as ONE aggregation pass —
  ``count(*)`` + one ``sum(CASE WHEN NOT pred)`` per predicate + one
  distinct-count per key, the analyzer-batching trick Amazon Deequ
  uses (Schelter et al., VLDB 2018). N constraints cost one pass.
- **Referential integrity** adds a LEFT ANTI join aggregated to a
  count: broadcast when the referenced side is a dimension, ordinary
  shuffle hash join when both sides are facts (AQE still free to pick
  broadcast if the dim turns out small at runtime).

A constraint's predicate must evaluate strictly TRUE to pass — a NULL
predicate (e.g. ``x > 0`` over a null x) counts as a violation, which
is what an admission gate wants.

No reference-repo counterpart: the reference engine (a CDC applier)
validates per-record schema/arity only (casting.py covers that); this
is the corpus-level gate a training pipeline adds on top.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCheck:
    """Row-local predicate constraint: a row violates iff ``predicate``
    does not evaluate TRUE for it (NULL counts as a violation)."""

    name: str
    predicate: str  # SQL boolean expression over the table's columns


@dataclass(frozen=True)
class UniqueCheck:
    """Key-uniqueness constraint: violations = redundant rows, i.e.
    ``count(*) - count(DISTINCT cols)``."""

    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class RefCheck:
    """Referential-integrity constraint: violations = rows whose
    ``cols`` tuple has no match in ``ref.ref_cols`` (left anti join).
    ``broadcast=True`` hints the referenced side is dimension-sized."""

    name: str
    cols: tuple[str, ...]
    ref: DataFrame = field(compare=False)
    ref_cols: tuple[str, ...] = ()
    broadcast: bool = True


def dq_check(
    df: DataFrame,
    tbl: str,
    checks: list[RowCheck | UniqueCheck | RefCheck],
) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns one row per check:
    ``(tbl, constraint, total, violations, ok)`` with BIGINT metrics
    and ok = 1 iff violations = 0.

    Every RowCheck, every UniqueCheck, and the RefChecks' row totals
    all FUSE into ONE aggregation scan of ``df`` (count(*) + one
    conditional sum per predicate + one distinct-count per key); each
    RefCheck then adds only its anti-join violation count. The fused
    1-row frame is checkpointed so its scan runs once however many
    constraints consume it. Note: a UniqueCheck counts null-keyed rows
    against ``count_distinct`` like any other rows — pair it with a
    not-null RowCheck if nulls need their own signal — and multiple
    UniqueChecks on one table cost an Expand fan-out per extra
    distinct aggregate.
    """
    if not checks:
        raise ValueError("dq_check: empty constraint list")
    row_checks = [c for c in checks if isinstance(c, RowCheck)]
    uniq_checks = [c for c in checks if isinstance(c, UniqueCheck)]
    ref_checks = [c for c in checks if isinstance(c, RefCheck)]

    aggs = [F.count("*").cast("bigint").alias("__total")]
    for i, c in enumerate(row_checks):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.expr(c.predicate), F.lit(0)).otherwise(F.lit(1))),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"__v{i}")
        )
    for j, c in enumerate(uniq_checks):
        aggs.append(
            (F.count("*") - F.count_distinct(*[F.col(k) for k in c.cols]))
            .cast("bigint")
            .alias(f"__u{j}")
        )
    # eager=False: the 1-row fused frame materializes inside the
    # report's own action instead of spending a dedicated job per
    # table up front (3 tables = 3 extra jobs); all consumers reuse
    # the same checkpoint blocks either way
    one = df.agg(*aggs).localCheckpoint(eager=False)

    out: list[DataFrame] = []
    stacked = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col("__total").alias("total"),
            F.col(f"__v{i}").alias("violations"),
        )
        for i, c in enumerate(row_checks)
    ] + [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col("__total").alias("total"),
            F.col(f"__u{j}").alias("violations"),
        )
        for j, c in enumerate(uniq_checks)
    ]
    if stacked:
        out.append(
            one.select(F.explode(F.array(*stacked)).alias("r")).select("r.*")
        )

    for c in ref_checks:
        ref_cols = c.ref_cols or c.cols
        ref = c.ref.select(
            *[F.col(rc).alias(lc) for lc, rc in zip(c.cols, ref_cols)]
        ).dropDuplicates(list(c.cols))
        if c.broadcast:
            # dimension ref: broadcast anti-join streams the fact scan
            # with no shuffle — pre-aggregating would ADD one
            ref = F.broadcast(ref)
            missing = df.join(ref, on=list(c.cols), how="left_anti").agg(
                F.count("*").cast("bigint").alias("violations")
            )
        else:
            # fact-fact arm: collapse the probe side to (key, count)
            # BEFORE the shuffle (guide §2.3 — aggregate before you
            # shuffle); violations = sum of per-key row counts whose
            # key has no match, identical to counting the rows
            keyed = df.groupBy(*[F.col(k) for k in c.cols]).agg(
                F.count("*").alias("__n")
            )
            missing = keyed.join(ref, on=list(c.cols), how="left_anti").agg(
                F.coalesce(F.sum("__n"), F.lit(0))
                .cast("bigint")
                .alias("violations")
            )
        out.append(
            one.select(F.col("__total").alias("total"))
            .crossJoin(missing)
            .select(F.lit(c.name).alias("constraint"), "total", "violations")
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.select(
        F.lit(tbl).alias("tbl"),
        "constraint",
        "total",
        "violations",
        F.when(F.col("violations") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ok"),
    )
