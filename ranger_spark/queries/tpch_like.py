"""TPC-H-shaped queries adapted to the driver's synthetic star schema —
the classic analytic patterns (filter-agg, grouped top-k joins, disjunctive
predicates, correlated having, ratio-of-sums) that a warehouse replacing
the reference must run. All are DataFrame-first with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ranger_spark.queries import register
from ranger_spark.queries.core_sql import MONEY_ROUND2_SQL, money_round2
from ranger_spark.tables import load, view


def _net():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(CAST(round(sum(l_extendedprice * l_discount), 4) AS DECIMAL(38,4)), 2) AS DOUBLE) AS revenue,
           count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan → global agg (fully
    pushed-down scan, zero shuffle beyond the final 1-row combine).
    Single-parse spark.sql (r14, guide §7.3 — Dataset ops cost
    ~13-30 ms of driver analysis EACH on this box); plan identical,
    double literals D-suffixed (bare 0.03 parses as DECIMAL)."""
    return spark.sql(
        f"""
        SELECT {MONEY_ROUND2_SQL.format(
            e="sum(l_extendedprice * l_discount)", g=4)} AS revenue,
               count(1) AS cnt
        FROM {view(spark, sf_dir, "lineitem")}
        WHERE l_shipdate >= timestamp'1997-01-01'
          AND l_shipdate <  timestamp'1998-01-01'
          AND l_discount BETWEEN 0.03D AND 0.07D
          AND l_quantity < 24
        """
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table predicate →
    semi-join on (orderkey) with the l_shipdate > o_orderdate condition."""
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(1) AS order_count
        FROM (SELECT * FROM {view(spark, sf_dir, "orders")}
              WHERE o_orderdate >= timestamp'1997-01-01'
                AND o_orderdate <  timestamp'1997-07-01') o
        LEFT SEMI JOIN {view(spark, sf_dir, "lineitem")} l
          ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        GROUP BY o_orderpriority
        """
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DECIMAL(38,4)), 2) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "limit"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking; nation broadcast."""
    rev = MONEY_ROUND2_SQL.format(
        e="sum(l_extendedprice * (1.0D - l_discount))", g=4
    )
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        FROM (
          SELECT /*+ BROADCAST(n) */ c_custkey, c_name, c_acctbal, n_name,
                 {rev} AS revenue
          FROM {view(spark, sf_dir, "customer")} c
          JOIN (SELECT * FROM {view(spark, sf_dir, "orders")}
                WHERE o_orderdate >= timestamp'1997-01-01'
                  AND o_orderdate <  timestamp'1998-01-01') o
            ON c_custkey = o_custkey
          JOIN (SELECT * FROM {view(spark, sf_dir, "lineitem")}
                WHERE l_returnflag = 'R') l
            ON l_orderkey = o_orderkey
          JOIN {view(spark, sf_dir, "nation")} n
            ON c_nationkey = n_nationkey
          GROUP BY c_custkey, c_name, c_acctbal, n_name
        )
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """
    )


@register(
    "q12_priority_split",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderstatus
    """,
    tags=("case", "agg"),
)
def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum pivot on priority class."""
    hi = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               sum(CASE WHEN {hi} THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN NOT ({hi}) THEN 1 ELSE 0 END) AS low_line_count
        FROM {view(spark, sf_dir, "orders")}
        WHERE o_orderdate >= timestamp'1996-01-01'
        GROUP BY o_orderstatus
        """
    )


@register(
    "q14_promo_share",
    # r13 revenue-scale lint conversion: the numerator/denominator are
    # summed as EXACT integers on the 4dp grid the price×(1−disc)
    # product lives on (floor(net·10⁴ + 0.5) per row — within ~1e-8 of
    # its integer on both engines, and codegen-friendly where Spark's
    # Round on DOUBLE allocates a BigDecimal per row), so the sums are
    # order-independent; the remaining 100·p/t division and 4dp round
    # act on bit-identical inputs on both engines. Exact up to sums
    # < 2⁵³ (sf0.1 ≈ 6e13 — nine orders of margin).
    # r14 (ADVICE r13 #1): the last double-quotient round is gone — the
    # 4dp share is computed ENTIRELY in integers, q1's avg_price idiom:
    # (2·10⁶·P + T) div (2T) = round_half_up(10⁶·(100P/T)/100) =
    # round_half_up(10⁴ · percent-share), then ONE division by 10⁴ of
    # the same integer on both engines. 2·10⁶·P overflows int64 at
    # sf0.1 (P ≈ 10¹³ on the 4dp grid), so the widening is explicit:
    # DECIMAL(38,0) on Spark, HUGEINT on DuckDB — both exact.
    oracle="""
    SELECT CAST((2000000 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
                              THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                              ELSE 0 END) AS HUGEINT)
                 + sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)))
                // (2 * CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS HUGEINT))
            AS BIGINT) / 10000.0 AS promo_share
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("join", "agg", "ratio"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total revenue."""
    net4 = ("cast(floor((l_extendedprice * (1.0D - l_discount)) * 10000"
            " + 0.5D) as bigint)")
    return spark.sql(
        f"""
        SELECT CAST((2000000 * CAST(__p AS DECIMAL(38,0)) + __t)
                    div (2 * CAST(__t AS DECIMAL(38,0))) AS BIGINT)
                 / 10000.0D AS promo_share
        FROM (
          SELECT sum(CASE WHEN p_type = 'ECONOMY' THEN {net4}
                          ELSE cast(0 as bigint) END) AS __p,
                 sum({net4}) AS __t
          FROM (SELECT * FROM {view(spark, sf_dir, "lineitem")}
                WHERE l_shipdate >= timestamp'1997-01-01'
                  AND l_shipdate <  timestamp'1997-04-01') l
          JOIN {view(spark, sf_dir, "part")} p
            ON l_partkey = p_partkey
        )
        """
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("subquery", "having", "limit"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN (grouped HAVING subquery) → semi-join against
    the pre-aggregated order quantities."""
    li_v = view(spark, sf_dir, "lineitem")
    o_v = view(spark, sf_dir, "orders")
    c_v = view(spark, sf_dir, "customer")
    o_semi = f"""
          SELECT oo.* FROM {o_v} oo
          LEFT SEMI JOIN (SELECT l_orderkey
                          FROM (SELECT l_orderkey,
                                       sum(l_quantity) AS __q
                                FROM {li_v} GROUP BY l_orderkey)
                          WHERE __q > 150) b
            ON oo.o_orderkey = b.l_orderkey"""
    if spark.conf.get("spark.ranger.bucketed.db", ""):
        # bucketed layout: the HAVING aggregation, the semi-join, and the
        # orders⋈lineitem join are ALL keyed on the bucket column — the
        # whole fact pipeline runs exchange-free; only the final customer
        # join moves data (by custkey)
        joined = f"""({o_semi}) o
          JOIN {li_v} l ON o.o_orderkey = l.l_orderkey
          JOIN {c_v} c ON c_custkey = o_custkey"""
    else:
        joined = f"""{c_v} c
          JOIN ({o_semi}) o ON c_custkey = o_custkey
          JOIN {li_v} l ON o.o_orderkey = l.l_orderkey"""
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM {joined}
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
        """
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT CAST(round(CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DECIMAL(38,4)), 2) AS DOUBLE) AS revenue,
           count(*) AS cnt
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 21)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 10 AND 30)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
            AND l_quantity BETWEEN 20 AND 40))
    """,
    tags=("join", "disjunction"),
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/qty triples
    evaluated post-join (Catalyst extracts the common l_partkey=p_partkey
    equi-condition; the OR residual stays a join filter)."""
    rev = MONEY_ROUND2_SQL.format(
        e="sum(l_extendedprice * (1.0D - l_discount))", g=4
    )
    return spark.sql(
        f"""
        SELECT {rev} AS revenue, count(1) AS cnt
        FROM {view(spark, sf_dir, "lineitem")} l
        JOIN {view(spark, sf_dir, "part")} p
          ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
        """
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(round(CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DECIMAL(38,4)), 2) AS DOUBLE) AS volume
    FROM customer, orders, lineitem, supplier, nation n1, nation n2
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_nationkey <> n2.n_nationkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
      AND n1.n_nationkey < 4 AND n2.n_nationkey < 4
    GROUP BY 1, 2, 3
    """,
    tags=("join", "agg"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume (two aliases of the
    same broadcast dim, inequality residual on the pair)."""
    n_v = view(spark, sf_dir, "nation")
    vol = MONEY_ROUND2_SQL.format(
        e="sum(l_extendedprice * (1.0D - l_discount))", g=4
    )
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(n1), BROADCAST(n2) */
               cust_nation, supp_nation, year(l_shipdate) AS l_year,
               {vol} AS volume
        FROM {view(spark, sf_dir, "customer")} c
        JOIN {view(spark, sf_dir, "orders")} o ON c_custkey = o_custkey
        JOIN (SELECT * FROM {view(spark, sf_dir, "lineitem")}
              WHERE l_shipdate >= timestamp'1997-01-01'
                AND l_shipdate <  timestamp'1999-01-01') l
          ON o_orderkey = l_orderkey
        JOIN {view(spark, sf_dir, "supplier")} s ON l_suppkey = s_suppkey
        JOIN (SELECT n_nationkey AS n1_key, n_name AS cust_nation
              FROM {n_v} WHERE n_nationkey < 4) n1 ON c_nationkey = n1_key
        JOIN (SELECT n_nationkey AS n2_key, n_name AS supp_nation
              FROM {n_v} WHERE n_nationkey < 4) n2 ON s_nationkey = n2_key
        WHERE NOT (n1_key = n2_key)
        GROUP BY cust_nation, supp_nation, year(l_shipdate)
        """
    )


@register(
    "q13_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "histogram"),
)
def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram (left join with a
    filtered join condition, double aggregation)."""
    return spark.sql(
        f"""
        SELECT c_count, count(1) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM {view(spark, sf_dir, "customer")} c
          LEFT OUTER JOIN (SELECT * FROM {view(spark, sf_dir, "orders")}
                           WHERE NOT (o_orderpriority = '1-URGENT')) o
            ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        """
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DECIMAL(38,4)), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    derived aggregate reused twice (revenue table + its max)."""
    rev = MONEY_ROUND2_SQL.format(
        e="sum(l_extendedprice * (1.0D - l_discount))", g=4
    )
    revenue_sql = f"""
          SELECT l_suppkey AS supplier_no, {rev} AS total_revenue
          FROM {view(spark, sf_dir, "lineitem")}
          WHERE l_shipdate >= timestamp'1997-01-01'
            AND l_shipdate <  timestamp'1997-04-01'
          GROUP BY l_suppkey"""
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(m) */ s_suppkey, s_name, total_revenue
        FROM {view(spark, sf_dir, "supplier")} s
        JOIN ({revenue_sql}) r ON s_suppkey = supplier_no
        CROSS JOIN (SELECT max(total_revenue) AS __max
                    FROM ({revenue_sql})) m
        WHERE total_revenue = __max
        """
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("subquery", "correlated"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold →
    decorrelated into a pre-aggregated per-part threshold join (the plan
    Catalyst itself produces for the correlated SQL)."""
    li_v = view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT round(sum(l_extendedprice) / 7.0D, 2) AS avg_yearly
        FROM {li_v} l
        JOIN (SELECT * FROM {view(spark, sf_dir, "part")}
              WHERE p_brand = 'Brand#1') p
          ON l_partkey = p_partkey
        JOIN (SELECT l_partkey AS t_partkey,
                     0.5D * avg(l_quantity) AS half_avg_qty
              FROM {li_v} GROUP BY l_partkey) t
          ON l_partkey = t_partkey
        WHERE l_quantity < half_avg_qty
        """
    )


@register(
    "q22_idle_balances",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "antijoin", "agg"),
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + anti-join (customers
    above average balance with no large order)."""
    c_v = view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT c_mktsegment, count(1) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (
          SELECT /*+ BROADCAST(a) */ c.* FROM {c_v} c
          CROSS JOIN (SELECT avg(c_acctbal) AS __avg FROM {c_v}
                      WHERE c_acctbal > 0) a
          WHERE c_acctbal > __avg
        ) cc
        LEFT ANTI JOIN (SELECT * FROM {view(spark, sf_dir, "orders")}
                        WHERE o_totalprice > 300000) o
          ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost AS min_cost
    FROM part, supplier, cost, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND unit_cost = (
        SELECT min(c2.unit_cost) FROM cost c2, supplier s2, nation n2, region r2
        WHERE c2.l_partkey = p_partkey AND c2.l_suppkey = s2.s_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
    tags=("subquery", "correlated", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part within a region —
    correlated MIN subquery decorrelated into a per-part min join. The
    synthetic schema has no partsupp, so the part↔supplier offer relation
    is derived from lineitem: unit_cost = min(l_extendedprice/l_quantity)
    per (part, supplier) — min() is order-independent, so the double is
    bitwise identical across engines and the equality join is exact.
    At scale: cost table is a map-side-combined agg over lineitem; the
    per-part min is a second small agg; region/nation dims broadcast."""
    # per-part min as a WINDOW over the single eu_cost pass (the
    # agg+self-join decorrelation computed the lineitem cost aggregate
    # twice — 1.03 s → 0.6 s at sf0.1); the part filter joins FIRST,
    # shrinking the window input without changing any per-part min
    # (the filter is on part attributes, never on offers)
    return spark.sql(
        f"""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               unit_cost AS min_cost
        FROM (
          SELECT /*+ BROADCAST(n), BROADCAST(r), BROADCAST(p) */
                 s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost,
                 min(unit_cost) OVER (PARTITION BY l_partkey) AS m_cost
          FROM (SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS unit_cost
                FROM {view(spark, sf_dir, "lineitem")}
                GROUP BY l_partkey, l_suppkey) cost
          JOIN {view(spark, sf_dir, "supplier")} s
            ON l_suppkey = s_suppkey
          JOIN {view(spark, sf_dir, "nation")} n
            ON s_nationkey = n_nationkey
          JOIN (SELECT * FROM {view(spark, sf_dir, "region")}
                WHERE r_name = 'EUROPE') r
            ON n_regionkey = r_regionkey
          JOIN (SELECT * FROM {view(spark, sf_dir, "part")}
                WHERE p_size BETWEEN 10 AND 20
                  AND p_type = 'STANDARD') p
            ON l_partkey = p_partkey
        )
        WHERE unit_cost = m_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 20
        """
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN n_name = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume, n2.n_name
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey
            AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
            AND s_nationkey = n2.n_nationkey
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
            AND p_type = 'ECONOMY') t
    GROUP BY o_year
    """,
    tags=("join", "ratio", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a region's purchases
    per year — conditional-sum ratio over a 6-table star join. Both nation
    roles (customer side, supplier side) broadcast; the fact-side joins
    shuffle on their keys. Share rounded to 6dp (sum order differs across
    engines only in the last ulps)."""
    n_v = view(spark, sf_dir, "nation")
    vol = "(l_extendedprice * (1.0D - l_discount))"
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(p), BROADCAST(r), BROADCAST(n1),
                   BROADCAST(n2) */
               cast(year(o_orderdate) as int) AS o_year,
               round(sum(CASE WHEN n_name = 'NATION_7' THEN {vol}
                              ELSE 0.0D END) / sum({vol}), 6) AS mkt_share
        FROM {view(spark, sf_dir, "lineitem")} l
        JOIN (SELECT * FROM {view(spark, sf_dir, "part")}
              WHERE p_type = 'ECONOMY') p ON l_partkey = p_partkey
        JOIN (SELECT * FROM {view(spark, sf_dir, "orders")}
              WHERE o_orderdate >= timestamp'1996-01-01'
                AND o_orderdate <= timestamp'1997-12-31') o
          ON l_orderkey = o_orderkey
        JOIN {view(spark, sf_dir, "customer")} c ON o_custkey = c_custkey
        JOIN (SELECT n_nationkey AS n1_key, n_regionkey FROM {n_v}) n1
          ON c_nationkey = n1_key
        JOIN (SELECT * FROM {view(spark, sf_dir, "region")}
              WHERE r_name = 'ASIA') r ON n_regionkey = r_regionkey
        JOIN {view(spark, sf_dir, "supplier")} s ON l_suppkey = s_suppkey
        JOIN (SELECT n_nationkey AS n2_key, n_name FROM {n_v}) n2
          ON s_nationkey = n2_key
        GROUP BY cast(year(o_orderdate) as int)
        """
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           sum(CAST(round((l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity) * 10000, 0) AS BIGINT))
             / 10000.0 AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier-nation × year for a part-name
    family. No partsupp in the synthetic schema, so supply cost is proxied
    by 10% of part retail price (joined dim attribute, same join topology
    as Q9: part-filter pushed into the lineitem join). Per-row profit is an
    exact 4dp decimal (2dp × 2dp products), so it is integer-scaled ×10⁴
    and summed as longs — the group sums are exact in both engines and no
    boundary-sensitive final rounding is needed."""
    profit4 = ("cast(round(((l_extendedprice * (1.0D - l_discount))"
               " - (0.1D * p_retailprice) * l_quantity) * 10000, 0)"
               " as bigint)")
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(p), BROADCAST(n) */
               n_name AS nation,
               cast(year(o_orderdate) as int) AS o_year,
               sum({profit4}) / 10000.0D AS sum_profit
        FROM {view(spark, sf_dir, "lineitem")} l
        JOIN (SELECT * FROM {view(spark, sf_dir, "part")}
              WHERE p_name LIKE '%widget%') p ON l_partkey = p_partkey
        JOIN {view(spark, sf_dir, "orders")} o ON l_orderkey = o_orderkey
        JOIN {view(spark, sf_dir, "supplier")} s ON l_suppkey = s_suppkey
        JOIN {view(spark, sf_dir, "nation")} n ON s_nationkey = n_nationkey
        GROUP BY n_name, cast(year(o_orderdate) as int)
        """
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
      FROM lineitem, supplier, nation, region
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey, round(val, 2) AS part_value
    FROM v WHERE val > (SELECT 0.001 * sum(val) FROM v)
    ORDER BY part_value DESC, partkey
    LIMIT 50
    """,
    tags=("subquery", "having", "agg"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose regional revenue exceeds a fraction of
    the global total — grouped agg compared against a scalar subquery over
    the same agg. The per-part value table is computed once and reused for
    both sides (broadcast 1-row threshold, no second scan)."""
    v_sql = f"""
          SELECT /*+ BROADCAST(n), BROADCAST(r) */
                 l_partkey, sum(l_extendedprice * (1.0D - l_discount)) AS val
          FROM {view(spark, sf_dir, "lineitem")} l
          JOIN (SELECT s_suppkey, s_nationkey
                FROM {view(spark, sf_dir, "supplier")}) s
            ON l_suppkey = s_suppkey
          JOIN {view(spark, sf_dir, "nation")} n ON s_nationkey = n_nationkey
          JOIN (SELECT * FROM {view(spark, sf_dir, "region")}
                WHERE r_name = 'EUROPE') r ON n_regionkey = r_regionkey
          GROUP BY l_partkey"""
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(t) */ l_partkey AS partkey,
               round(val, 2) AS part_value
        FROM ({v_sql}) v
        CROSS JOIN (SELECT 0.001D * sum(val) AS __thresh
                    FROM ({v_sql})) t
        WHERE val > __thresh
        ORDER BY part_value DESC, partkey
        LIMIT 50
        """
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 40
    """,
    tags=("antijoin", "distinct", "agg"),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute triple,
    excluding a supplier blacklist (NOT IN → left anti join; the part↔
    supplier relation again derived from lineitem)."""
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(p) */ p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (
          SELECT /*+ BROADCAST(bad) */ l.* FROM
          {view(spark, sf_dir, "lineitem")} l
          LEFT ANTI JOIN (SELECT s_suppkey
                          FROM {view(spark, sf_dir, "supplier")}
                          WHERE s_acctbal < 0) bad
            ON l_suppkey = bad.s_suppkey
        ) l
        JOIN (SELECT * FROM {view(spark, sf_dir, "part")}
              WHERE NOT (p_brand = 'Brand#1') AND NOT (p_type = 'PROMO')
                AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)) p
          ON l_partkey = p_partkey
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 40
        """
    )


@register(
    "q20_part_promo_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'large%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100)
      AND s_nationkey = n_nationkey AND n_regionkey < 3
    ORDER BY s_name
    """,
    tags=("subquery", "semijoin", "having"),
)
def q20_part_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped a material volume of a
    part-name family in a year — nested IN chain decorrelated to
    semi-join → grouped HAVING → semi-join. l_quantity is integral-valued,
    so the HAVING sum is exact across engines."""
    big_sql = f"""
          SELECT l_suppkey FROM (
            SELECT l_suppkey, sum(l_quantity) AS __qty
            FROM (
              SELECT /*+ BROADCAST(pk) */ ll.* FROM
              (SELECT * FROM {view(spark, sf_dir, "lineitem")}
               WHERE l_shipdate >= timestamp'1997-01-01'
                 AND l_shipdate <  timestamp'1998-01-01') ll
              LEFT SEMI JOIN (SELECT p_partkey
                              FROM {view(spark, sf_dir, "part")}
                              WHERE p_name LIKE 'large%') pk
                ON l_partkey = pk.p_partkey
            )
            GROUP BY l_suppkey
          ) WHERE __qty > 100"""
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(n) */ s_name, n_name
        FROM {view(spark, sf_dir, "supplier")} s
        LEFT SEMI JOIN ({big_sql}) b ON s_suppkey = b.l_suppkey
        JOIN (SELECT * FROM {view(spark, sf_dir, "nation")}
              WHERE n_regionkey < 3) n
          ON s_nationkey = n_nationkey
        ORDER BY s_name
        """
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND o3.o_orderkey = l3.l_orderkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey AND n_nationkey < 13
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("subquery", "correlated", "antijoin"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier in multi-supplier orders.
    The synthetic lineitem has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + 60 days. EXISTS/NOT-EXISTS pair
    decorrelated into one per-order aggregate (distinct suppliers,
    distinct late suppliers) — a single extra shuffle on orderkey instead
    of two correlated scans; the filter keeps lines whose order has ≥2
    suppliers and exactly one late supplier (necessarily l1's)."""
    # per-order distinct/late-distinct supplier counts as WINDOW
    # collect_sets over ONE orderkey exchange — the agg+join-back form
    # re-computed the lineitem⋈orders lineage twice (0.80→0.55 s at
    # sf0.1); set sizes are bounded by suppliers-per-order, tiny
    late = "l_shipdate > o_orderdate + INTERVAL 60 DAYS"
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(n) */ s_name, count(1) AS numwait
        FROM (
          SELECT *,
                 size(collect_set(l_suppkey)
                      OVER (PARTITION BY l_orderkey)) AS __n_supp,
                 size(collect_set(CASE WHEN {late} THEN l_suppkey END)
                      OVER (PARTITION BY l_orderkey)) AS __n_late
          FROM {view(spark, sf_dir, "lineitem")} l
          JOIN (SELECT * FROM {view(spark, sf_dir, "orders")}
                WHERE o_orderstatus = 'F') o
            ON l_orderkey = o_orderkey
        ) lo
        JOIN {view(spark, sf_dir, "supplier")} s ON l_suppkey = s_suppkey
        JOIN (SELECT * FROM {view(spark, sf_dir, "nation")}
              WHERE n_nationkey < 13) n
          ON s_nationkey = n_nationkey
        WHERE ({late}) AND __n_supp >= 2 AND __n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


# ---------------------------------------------------------------------------
# Bucketed star join through the ENGINE's SQL statement path
# ---------------------------------------------------------------------------
def ensure_engine_bucketed_db(
    spark: SparkSession, sf_dir: str, buckets: int = 8
) -> str:
    """Build (once per session/sf_dir) bucketed copies of the
    lineitem/orders facts ENTIRELY through the engine statement path:
    ``CREATE TABLE ... SETTINGS clustered_by = <key>, buckets = N`` then
    ``INSERT INTO ... SELECT`` (engine.py CREATE-TABLE CLUSTERED BY DDL;
    the reference parses SETTINGS but its Iceberg layer always writes an
    empty partition spec — SURVEY §1.3 — so this exceeds it). Returns
    the database name; Spark's scan reports the bucket distribution and
    the fact⋈fact join plans with zero Exchange at any scale."""
    import hashlib

    from ranger_spark.engine import Engine

    tag = hashlib.md5(f"{sf_dir}|{buckets}".encode()).hexdigest()[:8]
    db = f"engbkt_{tag}"
    try:
        if spark.catalog.tableExists(f"{db}.orders") and spark.catalog.tableExists(
            f"{db}.lineitem"
        ):
            return db
    except Exception:
        pass
    eng = Engine(spark)
    eng.execute(f"CREATE DATABASE IF NOT EXISTS {db};")
    eng.execute(
        f"CREATE TABLE IF NOT EXISTS {db}.orders ("
        "o_orderkey int64, o_custkey int64, o_orderstatus string, "
        "o_totalprice float64, o_orderdate timestamp, "
        "o_orderpriority string) "
        f"SETTINGS clustered_by = 'o_orderkey', buckets = {buckets};"
    )
    eng.execute(
        f"CREATE TABLE IF NOT EXISTS {db}.lineitem ("
        "l_orderkey int64, l_partkey int64, l_suppkey int64, "
        "l_linenumber int32, l_quantity float64, l_extendedprice float64, "
        "l_discount float64, l_tax float64, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp) "
        f"SETTINGS clustered_by = 'l_orderkey', buckets = {buckets};"
    )
    if spark.table(f"{db}.lineitem").isEmpty():
        load(spark, sf_dir, "orders").createOrReplaceTempView(f"src_o_{tag}")
        load(spark, sf_dir, "lineitem").createOrReplaceTempView(
            f"src_l_{tag}"
        )
        eng.execute(
            f"INSERT INTO {db}.orders SELECT * FROM src_o_{tag};"
        )
        eng.execute(
            f"INSERT INTO {db}.lineitem SELECT * FROM src_l_{tag};"
        )
    return db


@register(
    "bucketed_star_join_sql",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(CAST(round(sum(l_extendedprice * (1 - l_discount)), 4)
                AS DECIMAL(38,4)), 2) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'X'
    GROUP BY o_orderpriority
    """,
    tags=("join", "bucketed", "engine"),
)
def bucketed_star_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact revenue rollup over tables created and populated through
    the engine's SQL surface with a bucketed layout (SETTINGS
    clustered_by/buckets → CLUSTERED BY ... INTO N BUCKETS DDL): both
    scans report the bucket distribution, so the join is exchange-free —
    the layout answer to the shuffle that dominates fact joins at 100 TB.
    The oracle runs the identical query over the plain parquet (same
    rows by construction — populated via INSERT ... SELECT)."""
    db = ensure_engine_bucketed_db(spark, sf_dir)
    o = spark.table(f"{db}.orders")
    li = spark.table(f"{db}.lineitem")
    return (
        o.filter(F.col("o_orderstatus") != "X")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_round2(F.sum(_net()), 4).alias("revenue"),
        )
    )
