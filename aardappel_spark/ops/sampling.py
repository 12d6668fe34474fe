"""Deterministic, content-stable sampling and splitting.

Training pipelines need splits that are (a) reproducible run-to-run,
(b) stable under repartitioning and insertion order, and (c) consistent
across engines. ``rand()``-based sampling violates all three. These
operators key every decision on a salted md5 of the row id: the first 8
hex digits as an integer in [0, 2^32) give a uniform u32 ``ticket``;
thresholding the ticket yields exact, deterministic Bernoulli behavior.
No shuffle at all — pure row-local expressions that pipeline into
whatever reads them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TICKET_SPACE = 1 << 32


def sample_ticket(id_col: str | Column, salt: str = "") -> Column:
    """Uniform u32 from the salted md5 of the id (same formula is
    expressible in any SQL engine: first 8 md5 hex digits as int)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label. ``weights`` maps
    label -> fraction (must sum to <= 1; remainder goes to the last
    label). Default 80/10/10 train/val/test."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if any(f < 0 for f in weights.values()):
        raise ValueError("split fractions must be non-negative")
    if sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions must sum to at most 1")
    t = sample_ticket(id_col, salt)
    expr: Column | None = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        cut = int(acc * TICKET_SPACE)
        cond = t < F.lit(cut)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def deterministic_sample(
    df: DataFrame,
    frac: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ~``frac`` Bernoulli sample keyed on the id —
    rerunning, repartitioning, or porting engines keeps the same rows."""
    return df.filter(sample_ticket(id_col, salt) < F.lit(int(frac * TICKET_SPACE)))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_frac: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus mixing: keep a per-stratum fraction of rows
    (e.g. up-weight books, down-weight web) — the mixture step that
    turns cleaned corpora into a training distribution. Same md5-ticket
    machinery as ``deterministic_sample``, with the threshold chosen per
    stratum; strata absent from ``weights`` get ``default_frac``."""
    t = sample_ticket(id_col, salt)
    cut = F.lit(int(default_frac * TICKET_SPACE))
    for stratum, frac in weights.items():
        cut = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * TICKET_SPACE))
        ).otherwise(cut)
    return df.filter(t < cut)


def stratified_take(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-allocation stratified sampling: take exactly n rows per
    stratum (fewer if the stratum is smaller), chosen deterministically
    by md5 ticket order. Complements ``mixture_sample`` (Bernoulli, so
    per-stratum counts fluctuate): equal allocation is what eval-set
    construction and per-language probes need. One window partitioned by
    stratum — a single shuffle keyed on the stratum; with few strata and
    many rows the window itself is the skew point, so at extreme scale
    pre-filter with a ticket threshold before ranking (the ticket is
    uniform, so thresholding at ~4x the target fraction keeps the window
    input tiny without changing the selected set)."""
    from pyspark.sql.window import Window

    t = sample_ticket(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(t.asc(), F.col(id_col).asc())
    return (
        df.withColumn("pick_order", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pick_order") <= n_per_stratum)
    )


WEIGHTED_SALT = "wsample"


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = WEIGHTED_SALT,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u in (0, 1] from its md5 ticket and
    scores key = ln(u)/w; the k largest keys are exactly a weighted
    sample without replacement. Ordering is on the ROUNDED key (6 dp)
    with an id tie-break, so the cut is engine-portable. One TakeOrdered
    over row-local arithmetic — no shuffle beyond the top-k, which is
    how a 100 TB corpus selects a training subset by quality weight in
    a single pass."""
    t = sample_ticket(id_col, salt)
    u = (t + F.lit(1)) / F.lit(float(TICKET_SPACE))
    # + 0.0 canonicalizes -0.0 (u == 1 gives ln(u) == -0.0, which
    # engines render differently); every other value is unchanged
    key = F.round(F.log(u) / F.col(weight_col), 6) + F.lit(0.0)
    return (
        # weight-0 rows are unsampleable by definition in A-ES (and
        # ln(u)/0 raises under ANSI mode) — drop them before scoring
        df.filter(F.col(weight_col) > 0)
        .withColumn("wkey", key)
        .orderBy(F.desc("wkey"), F.col(id_col))
        .limit(k)
    )
