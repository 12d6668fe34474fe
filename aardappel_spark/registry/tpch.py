"""TPC-H relational suite (joins, aggregates, windows)."""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cdc_queries as cdc
from ..ops.dedup import (
    exact_dedup_groups,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash,
    verify_pairs_jaccard,
)
from ..sources import load_events_ns
from ..ops.similarity import (
    brute_force_topk,
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    lsh_banded_candidates,
    lsh_banded_topk,
    lsh_bucket_topk,
)
from ..ops.text import (
    LANG_PROFILES,
    STOPWORDS,
    fingerprint,
    language_id,
    quality_by_group,
    token_stats,
)

from ._dicts import QUERIES, ORACLES
from ._shared import *  # noqa: F401,F403



def q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + _dec("l_tax"))
    f = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    agg = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("sq"),
        F.sum(_dec("l_extendedprice")).alias("sbp"),
        F.sum(disc_price).alias("sdp"),
        F.sum(charge).alias("sc"),
        F.sum(_dec("l_discount")).alias("sd"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sq").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("sbp").cast("double"), 2).alias("sum_base_price"),
        F.round(F.col("sdp").cast("double"), 2).alias("sum_disc_price"),
        F.round(F.col("sc").cast("double"), 2).alias("sum_charge"),
        F.round(F.col("sq").cast("double") / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("sbp").cast("double") / F.col("count_order"), 4).alias("avg_price"),
        F.round(F.col("sd").cast("double") / F.col("count_order"), 6).alias("avg_disc"),
        "count_order",
    )


def q_tpch_q3(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).alias("rev"))
        .select(
            "l_orderkey",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(F.col("r_name") == "ASIA")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, (o["o_custkey"] == c["c_custkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(disc_price).alias("rev"))
        .select("n_name", F.round(F.col("rev").cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_tpch_q6(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = _dec("l_discount")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (disc >= F.lit("0.05").cast("decimal(3,2)"))
        & (disc <= F.lit("0.07").cast("decimal(3,2)"))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(_dec("l_extendedprice") * disc).cast("double"), 2).alias("revenue")
    )


def q_tpch_q4(spark, sf_dir):
    """Order-priority checking via EXISTS — adapted predicate
    (l_shipdate > o_orderdate; testdata has no commit/receipt dates).
    Left-semi join: each order emitted once regardless of line matches."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sj = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return sj.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q_tpch_q13(spark, sf_dir):
    """Customer order-count distribution: left outer join (customers with
    zero matching orders count as c_count=0), two cascaded aggregations."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "left")
    cnt = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return cnt.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_tpch_q18(spark, sf_dir):
    """Large-volume orders: HAVING subquery folded into a pre-aggregation
    (sum l_quantity per order > 180), then order + broadcast customer."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sumq"))
        .filter(F.col("sumq") > F.lit("180").cast("decimal(12,2)"))
    )
    j = o.join(big, o["o_orderkey"] == big["l_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    return j.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.round(_dec("o_totalprice").cast("double"), 2).alias("o_totalprice"),
        F.round(F.col("sumq").cast("double"), 2).alias("sum_qty"),
    )


def q_tpch_q14(spark, sf_dir):
    """Promo revenue share: fact-to-dim broadcast join + conditional agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-12-01").cast("timestamp"))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0).cast("decimal(14,4)"))
    )
    total = F.sum(disc_price)
    return j.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / total.cast("double"), 4
        ).alias("promo_revenue")
    )


def q_tpch_q10(spark, sf_dir):
    """Returned-item revenue by customer: 3-way join, conditional fact
    filter, top-20 by aggregated revenue (TakeOrdered, no global sort)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.sum(disc_price).alias("rev"))
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_tpch_q19(spark, sf_dir):
    """Disjunctive-predicate join (q19-adapted to available columns):
    OR-of-AND branches over the joined fact+dim. The brand/size legs
    prune the broadcast dim; the quantity legs filter the fact scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    s = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 15) & s.between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 25) & s.between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 35) & s.between(1, 30))
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    return j.filter(branch).agg(
        F.round(F.sum(disc_price).cast("double"), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


def q_tpch_q22(spark, sf_dir):
    """Dormant rich customers (q22-adapted): above-average balance AND no
    order since 2000 — anti join + scalar subquery. The average test is
    cross-multiplied in exact decimals (bal * n > tot) so both engines
    compare exactly, with no float-summation-order boundary risk."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bal = _dec("c_acctbal")
    s = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).cast("decimal(20,2)").alias("tot"), F.count("*").alias("n")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    dormant = c.join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
    return (
        dormant.crossJoin(F.broadcast(s))
        .filter(bal * F.col("n") > F.col("tot"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum(bal).cast("double"), 2).alias("sum_bal"),
        )
    )


def q_tpch_q2(spark, sf_dir):
    """Min-cost supplier (q2-adapted: testdata has no partsupp, so the
    part-supplier 'supply cost' is each supplier's MIN lineitem
    extendedprice for the part). Keeps q2's shape: region-filtered
    supplier dim, per-part correlated-min subquery, equality join back.
    Exact decimal mins, so the equality is boundary-safe."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(F.col("r_name") == "EUROPE")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_size") == 15)
    supply = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(_dec("l_extendedprice")).alias("cost"))
    )
    # correlated min as a window over the already-aggregated supply frame:
    # ONE pass over the fact side (a groupBy-then-self-join recomputed the
    # whole 5-table join twice — 10 parquet scans, no exchange reuse)
    from pyspark.sql.window import Window

    return (
        supply.withColumn(
            "min_cost", F.min("cost").over(Window.partitionBy("p_partkey"))
        )
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            F.round(_dec("s_acctbal").cast("double"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q7(spark, sf_dir):
    """Volume shipping between two nations (q7): bidirectional nation
    pair filter, revenue by (supp nation, cust nation, ship year)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("sk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("ck"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(disc_price).cast("double"), 2).alias("revenue"))
    )


def q_tpch_q8(spark, sf_dir):
    """National market share (q8): NATION_1's share of ECONOMY-part
    revenue sold into ASIA customers, by order year. Numerator and
    denominator are exact decimal sums; only the final ratio is double."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(F.col("r_name") == "ASIA")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    n2 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("ck"))
        .join(F.broadcast(r), F.col("crk") == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("sk"))
    )
    zero = F.lit(0).cast("decimal(14,4)")
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", disc_price).otherwise(zero)).alias("nat"),
            F.sum(disc_price).alias("tot"),
        )
        .select(
            "o_year",
            F.round(F.col("nat").cast("double") / F.col("tot").cast("double"), 4).alias("mkt_share"),
        )
    )


def q_tpch_q9(spark, sf_dir):
    """Product-type profit (q9-adapted: no ps_supplycost — cost proxy is
    p_retailprice * l_quantity / 10). Name-pattern part filter, profit by
    (supplier nation, order year); all arithmetic exact decimals."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_name").contains("red")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    cost = _dec("p_retailprice") * _dec("l_quantity") * F.lit("0.10").cast("decimal(3,2)")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(disc_price - cost).cast("double"), 2).alias("sum_profit"))
    )


def q_tpch_q11(spark, sf_dir):
    """Important stock (q11-adapted: no partsupp — per-part 'inventory
    value' is summed lineitem extendedprice from AFRICA suppliers).
    Keeps the shape: grouped value vs a global-scalar fraction, compared
    by exact-decimal cross-multiplication (value * 10000 > total)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(F.col("r_name") == "AFRICA")
    af = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    value = af.groupBy("l_partkey").agg(F.sum(_dec("l_extendedprice")).alias("val"))
    # scale-free fraction (the original scales its 0.0001 by 1/SF): keep
    # parts worth more than 2x the average per-part value, compared by
    # exact-decimal cross-multiplication. Both scalars come from a window
    # over the per-part frame (catalog cardinality), so the fact-side
    # join+agg runs ONCE instead of thrice.
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    return (
        value.withColumn("tot", F.sum("val").over(w).cast("decimal(24,2)"))
        .withColumn("n", F.count("*").over(w))
        .filter(F.col("val") * F.col("n") > F.col("tot") * 2)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val").cast("double"), 2).alias("value"),
        )
    )


def q_tpch_q12(spark, sf_dir):
    """Shipping-priority classes (q12-adapted: l_linestatus stands in for
    the absent l_shipmode; the window runs on l_shipdate). Conditional
    priority counts per class."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


def q_tpch_q15(spark, sf_dir):
    """Top supplier (q15): quarterly revenue per supplier, emit those
    equal to the maximum — the revenue view + scalar max of the original,
    with exact-decimal equality (no view needed on Spark)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
    rev = li.groupBy("l_suppkey").agg(F.sum(disc_price).alias("total"))
    # global max via a window on the aggregated frame (one row per
    # supplier — catalog cardinality, so the single-partition window is
    # bounded; the scalar-subquery crossJoin recomputed the quarter's
    # lineitem aggregation twice)
    from pyspark.sql.window import Window

    return (
        rev.withColumn("mx", F.max("total").over(Window.partitionBy()))
        .filter(F.col("total") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total").cast("double"), 2).alias("total_revenue"),
        )
    )


def q_tpch_q16(spark, sf_dir):
    """Part-supplier relationship census (q16-adapted: relationships come
    from lineitem instead of the absent partsupp; the complaints NOT IN
    exclusion becomes negative-balance suppliers). Distinct supplier
    count per (brand, type, size)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def q_tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (q17): per-part average-quantity
    correlated subquery. The fractional-average comparison is
    cross-multiplied into exact integers-in-decimal (qty * 5 * n_lines <
    sum_qty, i.e. qty < 0.2 * avg) so no engine ever computes a float
    average at the boundary."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_brand") == "Brand#3")
    stats = li.groupBy(F.col("l_partkey").alias("sp")).agg(
        F.sum(_dec("l_quantity")).alias("sumq"), F.count("*").alias("cnt")
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).join(
        stats, li["l_partkey"] == F.col("sp")
    )
    small = j.filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sumq"))
    return small.agg(
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly")
    )


def q_tpch_q20(spark, sf_dir):
    """Potential part promotion (q20-adapted: no partsupp/availqty — the
    'excess stock' test is suppliers who shipped > 50 units of a SMALL
    part in 1997). Preserves the nested-semi-join chain: suppliers
    semi-joined to a grouped-having inner query over name-filtered
    parts, dimension-filtered to one region."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_type") == "SMALL")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(F.col("r_name") == "EUROPE")
    heavy = (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit("50").cast("decimal(12,2)"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )


def q_tpch_q21(spark, sf_dir):
    """Suppliers who kept orders waiting (q21-adapted: no receipt/commit
    dates — 'late' is holding the order's LATEST ship date). For
    finished orders: count, per supplier, lines where the supplier hit
    the order's max ship date, another supplier participated (EXISTS /
    left-semi), and no other supplier shares that max (NOT EXISTS /
    left-anti). Timestamp equality is exact in both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    l1 = li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    mx = l1.groupBy(F.col("l_orderkey").alias("mk")).agg(
        F.max("l_shipdate").alias("max_ship")
    )
    late = l1.join(
        mx, (l1["l_orderkey"] == F.col("mk")) & (l1["l_shipdate"] == F.col("max_ship"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = l1.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    exists_other = late.join(
        l2,
        (late["l_orderkey"] == F.col("k2")) & (late["l_suppkey"] != F.col("s2")),
        "left_semi",
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sole = exists_other.join(
        l3,
        (exists_other["l_orderkey"] == F.col("k3"))
        & (exists_other["l_suppkey"] != F.col("s3")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
QUERIES["tpch_q1"] = q_tpch_q1
QUERIES["tpch_q3"] = q_tpch_q3
QUERIES["tpch_q5"] = q_tpch_q5
QUERIES["tpch_q4"] = q_tpch_q4
QUERIES["tpch_q6"] = q_tpch_q6
QUERIES["tpch_q13"] = q_tpch_q13
QUERIES["tpch_q14"] = q_tpch_q14
QUERIES["tpch_q18"] = q_tpch_q18
QUERIES["tpch_q19"] = q_tpch_q19
QUERIES["tpch_q10"] = q_tpch_q10
QUERIES["tpch_q22"] = q_tpch_q22
QUERIES["tpch_q2"] = q_tpch_q2
QUERIES["tpch_q7"] = q_tpch_q7
QUERIES["tpch_q8"] = q_tpch_q8
QUERIES["tpch_q9"] = q_tpch_q9
QUERIES["tpch_q11"] = q_tpch_q11
QUERIES["tpch_q12"] = q_tpch_q12
QUERIES["tpch_q15"] = q_tpch_q15
QUERIES["tpch_q16"] = q_tpch_q16
QUERIES["tpch_q17"] = q_tpch_q17
QUERIES["tpch_q20"] = q_tpch_q20
QUERIES["tpch_q21"] = q_tpch_q21
ORACLES["tpch_q1"] = (
"""
WITH f AS (
  SELECT l_returnflag, l_linestatus,
         l_quantity::DECIMAL(12,2) AS qty,
         l_extendedprice::DECIMAL(12,2) AS price,
         l_discount::DECIMAL(12,2) AS disc,
         l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(12,2)) AS disc_price,
         l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(12,2))
           * (1.00::DECIMAL(3,2) + l_tax::DECIMAL(12,2)) AS charge
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(qty) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(price) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(disc_price) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(charge) AS DOUBLE), 2) AS sum_charge,
       round(CAST(sum(qty) AS DOUBLE) / count(*), 4) AS avg_qty,
       round(CAST(sum(price) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(disc) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
"""
)
ORACLES["tpch_q3"] = (
"""
SELECT l.l_orderkey,
       round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)
             * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 2) AS revenue,
       CAST(o.o_orderdate AS DATE) AS o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
"""
)
ORACLES["tpch_q5"] = (
"""
SELECT n.n_name,
       round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)
             * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""
)
ORACLES["tpch_q6"] = (
"""
SELECT round(CAST(sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(12,2)) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount::DECIMAL(12,2) BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""
)
ORACLES["tpch_q4"] = (
"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1998-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""
)
ORACLES["tpch_q13"] = (
"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""
)
ORACLES["tpch_q18"] = (
"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity::DECIMAL(12,2)) AS sumq
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity::DECIMAL(12,2)) > 180
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       round(CAST(o.o_totalprice::DECIMAL(12,2) AS DOUBLE), 2) AS o_totalprice,
       round(CAST(b.sumq AS DOUBLE), 2) AS sum_qty
FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""
)
ORACLES["tpch_q14"] = (
"""
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN l.l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))
             ELSE 0 END) AS DOUBLE)
       / CAST(sum(l.l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 4)
       AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-12-01'
"""
)
ORACLES["tpch_q19"] = (
"""
SELECT round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)
             * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 15 AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 25 AND p.p_size BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 35 AND p.p_size BETWEEN 1 AND 30)
"""
)
ORACLES["tpch_q10"] = (
"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)
             * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, c_custkey LIMIT 20
"""
)
ORACLES["tpch_q22"] = (
"""
WITH s AS (
  SELECT CAST(sum(c_acctbal::DECIMAL(12,2)) AS DECIMAL(20,2)) AS tot, count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       round(CAST(sum(c.c_acctbal::DECIMAL(12,2)) AS DOUBLE), 2) AS sum_bal
FROM customer c, s
WHERE c.c_acctbal::DECIMAL(12,2) * s.n > s.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
"""
)
ORACLES["tpch_q2"] = (
"""
WITH supply AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         min(l.l_extendedprice::DECIMAL(12,2)) AS cost
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size = 15
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT round(CAST(sp.s_acctbal::DECIMAL(12,2) AS DOUBLE), 2) AS s_acctbal,
       sp.s_name, sp.n_name, sp.p_partkey, sp.p_name
FROM supply sp
WHERE sp.cost = (SELECT min(cost) FROM supply m WHERE m.p_partkey = sp.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""
)
ORACLES["tpch_q7"] = (
"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)
             * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""
)
ORACLES["tpch_q8"] = (
"""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
             THEN l.l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))
             ELSE 0 END) AS DOUBLE)
       / CAST(sum(l.l_extendedprice::DECIMAL(12,2)
             * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))) AS DOUBLE), 4) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""
)
ORACLES["tpch_q9"] = (
"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)
               * (1.00::DECIMAL(3,2) - l.l_discount::DECIMAL(12,2))
             - p.p_retailprice::DECIMAL(12,2) * l.l_quantity::DECIMAL(12,2)
               * 0.10::DECIMAL(3,2)) AS DOUBLE), 2) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""
)
ORACLES["tpch_q11"] = (
"""
WITH af AS (
  SELECT l.l_partkey, l.l_extendedprice::DECIMAL(12,2) AS price
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'AFRICA'
),
v AS (SELECT l_partkey, sum(price) AS val FROM af GROUP BY l_partkey),
t AS (SELECT CAST(sum(price) AS DECIMAL(24,2)) AS tot FROM af),
nv AS (SELECT count(*) AS n FROM v)
SELECT v.l_partkey AS p_partkey, round(CAST(v.val AS DOUBLE), 2) AS value
FROM v, t, nv WHERE v.val * nv.n > t.tot * 2
"""
)
ORACLES["tpch_q12"] = (
"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""
)
ORACLES["tpch_q15"] = (
"""
WITH rev AS (
  SELECT l_suppkey, sum(l_extendedprice::DECIMAL(12,2)
         * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(12,2))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(CAST(r.total AS DOUBLE), 2) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT max(total) FROM rev)
"""
)
ORACLES["tpch_q16"] = (
"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""
)
ORACLES["tpch_q17"] = (
"""
WITH stats AS (
  SELECT l_partkey, sum(l_quantity::DECIMAL(12,2)) AS sumq, count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(l.l_extendedprice::DECIMAL(12,2)) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#3'
JOIN stats st ON l.l_partkey = st.l_partkey
WHERE l.l_quantity::DECIMAL(12,2) * 5 * st.cnt < st.sumq
"""
)
ORACLES["tpch_q20"] = (
"""
WITH heavy AS (
  SELECT DISTINCT l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'SMALL'
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity::DECIMAL(12,2)) > 50
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
"""
)
ORACLES["tpch_q21"] = (
"""
WITH l1 AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
mx AS (SELECT l_orderkey, max(l_shipdate) AS max_ship FROM l1 GROUP BY l_orderkey),
late AS (
  SELECT l1.l_orderkey, l1.l_suppkey, l1.l_shipdate
  FROM l1 JOIN mx ON l1.l_orderkey = mx.l_orderkey AND l1.l_shipdate = mx.max_ship
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late t
JOIN supplier s ON t.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM l1 WHERE l1.l_orderkey = t.l_orderkey
              AND l1.l_suppkey <> t.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late x WHERE x.l_orderkey = t.l_orderkey
                  AND x.l_suppkey <> t.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name LIMIT 20
"""
)
