"""TPC-H-shaped analytics queries adapted to the testdata schema.

The testdata tables are TPC-H-ish but slimmer (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, p_type is a single word), so
each query keeps the *shape* of its TPC-H namesake — the join
topology, subquery kind, and aggregation pattern Catalyst must plan —
with predicates rewritten to the available columns. Every query has a
DuckDB oracle twin; float outputs follow the repo parity conventions
(DECIMAL(18,4) money sums cast to double; ratios as floored ppm —
identical doubles in, identical BIGINT out).

Scale notes (local[32] now, 1000 executors later):
- dims (region/nation/supplier/part/customer at these SFs) broadcast;
  only lineitem<->orders shuffles, and that join is bucketable
  (SCALE.md) — the same DDL removes the exchange here.
- semi/anti joins ship only the key column to the build side.
- q19's OR-of-ANDs keeps the part filter disjunction INSIDE the join
  condition evaluation but its l_quantity bounds and the p_brand IN
  list still reach the scans as pushed filters.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _dec(c: str):
    return F.col(c).cast("decimal(18,4)")


def _rev():
    """Per-lineitem discounted revenue, exact decimal."""
    one = F.lit(1).cast("decimal(18,4)")
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS -> left-semi join with a non-equi conjunct
# ---------------------------------------------------------------------------

def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority counts for orders with at least one LATE line (shipped
    after the order quarter's end-of-window): EXISTS == left-semi join
    on the order key with the non-equi lateness conjunct evaluated on
    the joined pair. Only (l_orderkey, l_shipdate) flows to the semi
    join; counts aggregate on a 5-value key."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    late = o.join(
        li.select("l_orderkey", "l_shipdate"),
        (o.o_orderkey == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ORACLE_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q5 shape: 6-way star join, local-supplier equality across dims
# ---------------------------------------------------------------------------

def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where the supplier and customer share a
    nation, restricted to one region and a date window. customer/
    supplier/nation/region broadcast; lineitem<->orders is the only
    shuffle (bucketed DDL in SCALE.md removes it on a cluster)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


_ORACLE_TPCH_Q5 = """
SELECT n_name AS nation,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation ASC
"""


# ---------------------------------------------------------------------------
# Q7 shape: nation-pair volume shipping by year
# ---------------------------------------------------------------------------

def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations by ship year, both directions.
    The nation-pair disjunction lands after broadcast joins of the two
    tiny nation-keyed sides; lineitem<->orders is again the one
    shuffle; group key is (nation, nation, year)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    rpair = (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_ORACLE_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year, CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue, top-20 customers
# ---------------------------------------------------------------------------

def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer in one quarter, top 20.
    Group on the customer key only, then decorate with broadcast
    customer/nation AFTER the aggregate — the shuffle carries
    (custkey, partial sum), not the full row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    agg = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-07-01"))
                & (F.col("o_orderdate") < _ts("1996-10-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )
    return (
        agg.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


_ORACLE_TPCH_Q10 = """
SELECT c_custkey AS custkey, c_name AS name, ROUND(c_acctbal, 2) AS acctbal,
       n_name AS nation,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 shape: CASE aggregation — late lines by priority class
# ---------------------------------------------------------------------------

def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment counts split into urgent/other priority classes
    per return flag: the conditional-aggregation shape (SUM(CASE)) —
    one scan, one shuffle on a 3-value key."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_TPCH_Q12 = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share (ratio as floored ppm)
# ---------------------------------------------------------------------------

def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO parts in one month. part broadcasts
    into the lineitem scan; the ratio is emitted as floor(1e6 * x) —
    both engines divide the same exact-decimal-derived doubles, so the
    ppm is integer-identical (repo float conventions)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    joined = li.filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(18,4)")))
        .alias("promo"),
        F.sum(_rev()).alias("total"),
    )
    # round-to-scale-2 while decimal, THEN cast: >16-digit decimals
    # convert to double with engine-dependent last-ulp rounding
    pr = F.round(F.col("promo"), 2).cast("double")
    tr = F.round(F.col("total"), 2).cast("double")
    return agg.select(
        pr.alias("promo_revenue"),
        tr.alias("total_revenue"),
        F.floor(F.lit(1000000.0) * pr / tr).cast("long").alias("promo_ppm"),
    )


_ORACLE_TPCH_Q14 = """
WITH agg AS (
  SELECT SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                  ELSE 0 END) AS promo,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
)
SELECT CAST(ROUND(promo, 2) AS DOUBLE) AS promo_revenue,
       CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue,
       FLOOR(1000000.0 * CAST(ROUND(promo, 2) AS DOUBLE)
             / CAST(ROUND(total, 2) AS DOUBLE))::BIGINT AS promo_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Q18 shape: HAVING on a grouped fact, decorated top-k
# ---------------------------------------------------------------------------

def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (total quantity > 300): aggregate-then-
    filter (HAVING), decorate the few survivors with broadcast
    customer + orders lookups, top-20. The HAVING prunes before the
    decoration joins — survivors are rare, so the second join's probe
    side is tiny."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("qty").cast("double").alias("quantity"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(20)
    )


_ORACLE_TPCH_Q18 = """
SELECT c_name AS name, c_custkey AS custkey, o_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice,
       CAST(qty AS DOUBLE) AS quantity
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, orderkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive brand/size/quantity bands
# ---------------------------------------------------------------------------

def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three alternative (brand, size-band, quantity-band)
    channels: OR-of-ANDs across join columns. The p_brand IN-list and
    the overall l_quantity envelope still push into the scans; the
    full disjunction evaluates on the broadcast-joined pair."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    q = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.filter(q.between(1, 30))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            F.coalesce(F.round(F.sum(_rev()), 2).cast("double"), F.lit(0.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_ORACLE_TPCH_Q19 = """
SELECT COALESCE(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE), 0.0) AS revenue,
       COUNT(*)::BIGINT AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22 shape: scalar subquery threshold + NOT EXISTS anti-join
# ---------------------------------------------------------------------------

def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lapsed high-balance customers per nation: acctbal above the
    positive-balance average AND no order since mid-2000 (the testdata
    has no order-less customers, so Q22's 'never ordered' becomes
    recent-inactivity — same NOT EXISTS shape). The average enters as
    a cross-multiplied exact-decimal predicate (bal * n > total) — no
    FP division, so the threshold is bit-identical cross-engine; the
    inactivity test is an anti-join shipping only filtered o_custkey."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") >= _ts("2000-07-01")
    )
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_dec("c_acctbal")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    rich = (
        cust.crossJoin(F.broadcast(thresh))
        .filter(_dec("c_acctbal") * F.col("n") > F.col("total"))
    )
    idle = rich.join(
        orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


_ORACLE_TPCH_Q22 = """
WITH thresh AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS total, COUNT(*)::BIGINT AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey::BIGINT AS nationkey, COUNT(*)::BIGINT AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM customer, thresh
WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > total
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-07-01'
  )
GROUP BY c_nationkey
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# Q8 shape: market share (conditional share of a grouped total)
# ---------------------------------------------------------------------------

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of the EUROPE customer market by order
    year. The share is conditional-sum / total-sum within each group —
    emitted as floor(1e6 * x): both engines divide the same exact-
    decimal-derived doubles, so the ppm is integer-identical."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    europe_cust_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(europe_cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                F.lit(0).cast("decimal(18,4)"))).alias("nation_vol"),
            F.sum(vol).alias("total_vol"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_vol"), 2).cast("double").alias("nation_volume"),
            F.round(F.col("total_vol"), 2).cast("double").alias("total_volume"),
            F.floor(
                F.lit(1000000.0)
                * F.round(F.col("nation_vol"), 2).cast("double")
                / F.round(F.col("total_vol"), 2).cast("double")
            ).cast("long").alias("mkt_share_ppm"),
        )
        .orderBy("o_year")
    )


_ORACLE_TPCH_Q8 = """
WITH vols AS (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
         SUM(CASE WHEN n2.n_name = 'NATION_5'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                  ELSE 0 END) AS nation_vol,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1
)
SELECT o_year, CAST(ROUND(nation_vol, 2) AS DOUBLE) AS nation_volume,
       CAST(ROUND(total_vol, 2) AS DOUBLE) AS total_volume,
       FLOOR(1000000.0 * CAST(ROUND(nation_vol, 2) AS DOUBLE)
             / CAST(ROUND(total_vol, 2) AS DOUBLE))::BIGINT AS mkt_share_ppm
FROM vols
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q13 shape: LEFT OUTER join + two-level aggregation (count distribution)
# ---------------------------------------------------------------------------

def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of order counts per customer (urgent orders
    excluded from the count, customers with zero orders kept by the
    LEFT join). First aggregate is customer-keyed; the second is over
    the tiny distinct-count domain."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_ORACLE_TPCH_Q13 = """
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q15 shape: aggregate, take the max, equality-match back (top supplier)
# ---------------------------------------------------------------------------

def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue: the max revenue is a
    single broadcast row matched back by exact-decimal equality (ties
    all surface, as in TPC-H's view formulation)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


_ORACLE_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name AS name,
       CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY suppkey
"""


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group average threshold
# ---------------------------------------------------------------------------

def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity lines of one brand: l_quantity below 20% of the
    part's average quantity. The correlated AVG becomes a per-part
    (sum, count) aggregate joined back, and the 0.2*avg comparison is
    cross-multiplied into exact decimals (qty * 5 * n < sum) — no FP
    division anywhere."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#12")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(_dec("l_quantity") * 5 * F.col("qty_n") < F.col("qty_sum"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("total_extprice"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_ORACLE_TPCH_Q17 = """
WITH per_part AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_sum,
         COUNT(*)::BIGINT AS qty_n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_extprice,
       COUNT(*)::BIGINT AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = 'Brand#12'
  AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * qty_n < qty_sum
"""


# ---------------------------------------------------------------------------
# Q2 shape: correlated scalar-min subquery (min-cost supplier per part)
# ---------------------------------------------------------------------------

def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost European supplier per SMALL part. partsupp is absent
    from the testdata, so the (part, supplier) offer table is derived
    from lineitem (cost = MIN extendedprice per pair) — the Q2 topology
    is intact: region-restricted offers, a correlated per-part MIN
    (rewritten as aggregate + equi-join back on the exact decimal
    cost), then dim decoration and top-100. supplier/nation/region and
    the filtered part side all broadcast; the offers aggregate is the
    one shuffle and carries only (partkey, suppkey, cost)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("cost")
    )
    europe = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    rps = offers.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(europe), F.col("s_nationkey") == F.col("n_nationkey"))
    minc = rps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("cost").alias("mincost")
    )
    return (
        rps.join(minc, (F.col("l_partkey") == F.col("pk")) & (F.col("cost") == F.col("mincost")))
        .join(
            F.broadcast(
                part.filter((F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("s_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            "p_name",
        )
        .orderBy(F.desc("acctbal"), F.asc("nation"), F.asc("name"), F.asc("partkey"))
        .limit(100)
    )


_ORACLE_TPCH_Q2 = """
WITH offers AS (
  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
rps AS (
  SELECT l_partkey, cost, s_name, s_acctbal, n_name
  FROM offers
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
minc AS (SELECT l_partkey AS pk, MIN(cost) AS mincost FROM rps GROUP BY l_partkey)
SELECT ROUND(s_acctbal, 2) AS acctbal, s_name AS name, n_name AS nation,
       p_partkey AS partkey, p_name
FROM rps
JOIN minc ON l_partkey = pk AND cost = mincost
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 15 AND p_type = 'SMALL'
ORDER BY acctbal DESC, nation ASC, name ASC, partkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q9 shape: 5-way join, profit by (supplier nation, order year)
# ---------------------------------------------------------------------------

def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on '%bolt%' parts by supplier nation and order year. The
    real Q9 cost term is ps_supplycost * l_quantity; without partsupp
    the cost proxy is p_retailprice * l_quantity — the same
    lineitem-side expression over a broadcast part column, keeping the
    join topology (part + supplier + nation broadcast, lineitem<->
    orders the one shuffle) and the (nation, year DESC) grouping. All
    money math is exact decimal; cast to double only at the end."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    amount = _rev() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%bolt%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_ORACLE_TPCH_Q9 = """
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
           - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 shape: group-by HAVING vs a global-scalar threshold
# ---------------------------------------------------------------------------

def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose value (sum of extendedprice shipped by NATION_3
    suppliers) exceeds 1/1000 of the nation's total. The global scalar
    lands via a broadcast cross-join of a 1-row aggregate; the
    fraction compare is cross-multiplied (value * 1000 > total) so
    both engines compare exact decimals — no FP threshold flakiness.
    The per-part aggregate is computed once and reused for both sides
    (Spark caches the plan subtree; the shuffle carries (partkey,
    partial-sum) only)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nat_supp = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("val"))
    )
    total = val.agg(F.sum("val").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 1000 > F.col("total"))
        .select("partkey", F.round(F.col("val"), 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


_ORACLE_TPCH_Q11 = """
WITH val AS (
  SELECT l_partkey AS partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT partkey, CAST(ROUND(val, 2) AS DOUBLE) AS value
FROM val
WHERE val * 1000 > (SELECT SUM(val) FROM val)
ORDER BY value DESC, partkey ASC
"""


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN exclusion + COUNT DISTINCT per part attribute
# ---------------------------------------------------------------------------

def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, type, size) over the
    lineitem bridge, excluding low-balance suppliers (the testdata's
    stand-in for Q16's complaint-comment NOT IN). The NOT IN becomes a
    broadcast left-anti join on the supplier key (keys are non-null so
    the semantics coincide); COUNT(DISTINCT) shuffles only the
    (brand, type, size, suppkey) tuple."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    sizes = [1, 5, 11, 15, 23, 28, 37, 42]
    excluded = supp.filter(F.col("s_acctbal") < 500).select("s_suppkey")
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#12") & F.col("p_size").isin(sizes)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


_ORACLE_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#12'
  AND p_size IN (1, 5, 11, 15, 23, 28, 37, 42)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# ---------------------------------------------------------------------------
# Q20 shape: nested IN subqueries with a correlated-aggregate threshold
# ---------------------------------------------------------------------------

def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than half of a 'small%' part's 1996
    volume (the availqty > 0.5*sum threshold of the real Q20, with the
    per-(supplier, part) shipped quantity standing in for availqty).
    The correlated half-of-total compare is cross-multiplied into
    exact decimals (sq * 2 > tq); the parts IN-list is a broadcast
    semi-join; the supplier IN becomes a broadcast semi-join on the
    distinct qualifying supplier keys."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    window = li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).join(
        F.broadcast(part.filter(F.col("p_name").like("small%")).select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    sp = window.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sq")
    )
    tp = window.groupBy(F.col("l_partkey").alias("pk2")).agg(
        F.sum(_dec("l_quantity")).alias("tq")
    )
    qualifying = (
        sp.join(tp, F.col("l_partkey") == F.col("pk2"))
        .filter(F.col("sq") * 2 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_name").alias("name"), F.col("n_name").alias("nation"))
        .orderBy("name")
    )


_ORACLE_TPCH_Q20 = """
SELECT s_name AS name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT sk FROM (
    SELECT l_suppkey AS sk, l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_suppkey, l_partkey
  ) sp
  JOIN (
    SELECT l_partkey AS pk2, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS tq
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_partkey
  ) tp ON pk = pk2
  WHERE sq * 2 > tq
)
ORDER BY name
"""


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS self-joins (waiting suppliers)
# ---------------------------------------------------------------------------

def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose late line (shipped >60 days after order date on
    a finished order) was the ONLY late line of a multi-supplier
    order. l_receiptdate/l_commitdate are absent, so "late" is the
    repo's established ship-lag predicate (same as the Q4 adaptation).
    EXISTS -> left-semi self-join on the order key with a
    different-supplier conjunct; NOT EXISTS over the late set ->
    left-anti self-join; supplier decorates after, broadcast. The
    late set is renamed-column projected so the self-joins are
    unambiguous (no Spark same-lineage ambiguity)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        ).select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(100)
    )


_ORACLE_TPCH_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name AS name, COUNT(*)::BIGINT AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, name ASC
LIMIT 100
"""


TPCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q7": q_tpch_q7,
    "tpch_q10": q_tpch_q10,
    "tpch_q12": q_tpch_q12,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q22": q_tpch_q22,
    "tpch_q8": q_tpch_q8,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
}

TPCH_ORACLES: dict[str, str] = {
    "tpch_q4": _ORACLE_TPCH_Q4,
    "tpch_q5": _ORACLE_TPCH_Q5,
    "tpch_q7": _ORACLE_TPCH_Q7,
    "tpch_q10": _ORACLE_TPCH_Q10,
    "tpch_q12": _ORACLE_TPCH_Q12,
    "tpch_q14": _ORACLE_TPCH_Q14,
    "tpch_q18": _ORACLE_TPCH_Q18,
    "tpch_q19": _ORACLE_TPCH_Q19,
    "tpch_q22": _ORACLE_TPCH_Q22,
    "tpch_q8": _ORACLE_TPCH_Q8,
    "tpch_q13": _ORACLE_TPCH_Q13,
    "tpch_q15": _ORACLE_TPCH_Q15,
    "tpch_q17": _ORACLE_TPCH_Q17,
    "tpch_q2": _ORACLE_TPCH_Q2,
    "tpch_q9": _ORACLE_TPCH_Q9,
    "tpch_q11": _ORACLE_TPCH_Q11,
    "tpch_q16": _ORACLE_TPCH_Q16,
    "tpch_q20": _ORACLE_TPCH_Q20,
    "tpch_q21": _ORACLE_TPCH_Q21,
}
