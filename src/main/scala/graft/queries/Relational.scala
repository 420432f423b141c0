package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational tier — SURVEY.md §2.1-2.3, §2.6, §2.7, §2.9.
  *
  * Scans, filter/project, joins of every kind, sort/limit/top-N,
  * set operations, unnest, sampling, subqueries, CTEs. All plans are
  * declarative DataFrame/SQL so Catalyst performs pushdown, pruning,
  * join-strategy selection and AQE re-planning (SURVEY.md §4 — every
  * Presto optimizer rewrite is built into Catalyst).
  *
  * Scale notes: joins to `nation`/`region`/`supplier`/`part` are
  * dimension joins — explicitly `broadcast()` so a 100 TB fact scan
  * never shuffles for them. Fact-fact joins (lineitem⋈orders) shuffle
  * on the join key, which is the partition-transparent layout Spark's
  * EnsureRequirements picks; at cluster scale these benefit from
  * bucketing both tables on orderkey, and AQE handles skew.
  */
object Relational extends QueryGroup {
  private def r4(c: Column): Column = round(c, 4)

  // Flagship: TPC-H Q1 shape (scan+filter+agg+sort; SURVEY.md §7.1).
  //
  // Exact fixed-point sums (r12): the full-table price sums reach
  // ~2.8e10 at sf1, where double precision (~1e-5 absolute) exceeds
  // the 1e-4 rounding quantum — round(sum(double), 4) then flips its
  // last digit on summation order. Each row's price expression is a
  // DETERMINISTIC double, so quantizing per row (cents for the raw
  // price, 1e-4 units for the discount/charge products) and summing
  // BIGINTs is order-free and engine-identical. The averages stay
  // double: their magnitude (~5e4) keeps noise far below the quantum.
  def tpchQ1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def cents(c: Column): Column = round(c * 100).cast("long")
    def dm(c: Column): Column = round(c * 10000).cast("long")
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r4(sum($"l_quantity")).as("sum_qty"),
        (sum(cents($"l_extendedprice")).cast("double") / 100.0)
          .as("sum_base_price"),
        (sum(dm($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .cast("double") / 10000.0).as("sum_disc_price"),
        (sum(dm($"l_extendedprice" * (lit(1.0) - $"l_discount") *
          (lit(1.0) + $"l_tax"))).cast("double") / 10000.0).as("sum_charge"),
        r4(avg($"l_quantity")).as("avg_qty"),
        r4(avg($"l_extendedprice")).as("avg_price"),
        r4(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag".asc_nulls_last, $"l_linestatus".asc_nulls_last)
  }

  val tpchQ1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
      |    AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
      |    * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 10000.0
      |    AS sum_disc_price,
      |  CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
      |    * (1.0 + l_tax) * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 10000.0 AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  override def defs: Map[String, QueryDef] = Map(
    "tpch_q1" -> QueryDef(tpchQ1, Some(tpchQ1Oracle)),

    // §2.1 scan + §2.2 filter/project: pushdown-friendly narrow scan.
    "scan_filter_project" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_quantity" > 45.0 && $"l_discount" >= 0.05)
          .select($"l_orderkey", $"l_linenumber",
            r4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"))
          // net_price tie-break: the driver testdata has duplicate
          // (l_orderkey, l_linenumber) pairs, so the 2-key sort is not
          // total over the projection (r12 order audit)
          .orderBy($"l_orderkey", $"l_linenumber", $"net_price")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice * (1.0 - l_discount), 4) AS net_price
             |FROM lineitem WHERE l_quantity > 45.0 AND l_discount >= 0.05
             |ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin)),

    // §2.1 VALUES inline relation.
    "values_inline" -> QueryDef(
      (s, _) => {
        import s.implicits._
        Seq((1L, "presto"), (2L, "spark"), (3L, "graft"))
          .toDF("id", "name").orderBy($"id")
      },
      Some("SELECT * FROM (VALUES (1, 'presto'), (2, 'spark'), (3, 'graft')) t(id, name) ORDER BY id")),

    // §2.2 predicates: BETWEEN / IN-list / LIKE / IS NULL / null-safe eq.
    "predicates" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .filter($"o_totalprice".between(1000.0, 50000.0) &&
            $"o_orderstatus".isin("O", "F") &&
            $"o_orderpriority".like("%URGENT%") &&
            $"o_custkey".isNotNull &&
            ($"o_orderstatus" <=> lit("O") || $"o_orderstatus" <=> lit("F")))
          .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
             |WHERE o_totalprice BETWEEN 1000.0 AND 50000.0
             |  AND o_orderstatus IN ('O', 'F')
             |  AND o_orderpriority LIKE '%URGENT%'
             |  AND o_custkey IS NOT NULL
             |  AND (o_orderstatus IS NOT DISTINCT FROM 'O' OR o_orderstatus IS NOT DISTINCT FROM 'F')
             |ORDER BY o_orderkey""".stripMargin)),

    // §2.3 equi inner join, fact⋈fact (shuffles on orderkey; AQE-skew-safe).
    "join_inner" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey", "inner")
          .filter($"o_orderstatus" === "F")
          .select($"l_orderkey", $"l_linenumber", $"o_custkey",
            r4($"l_extendedprice").as("price"))
          .orderBy($"l_orderkey", $"l_linenumber", $"price")
      },
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, round(l_extendedprice, 4) AS price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'F'
             |ORDER BY l_orderkey, l_linenumber, price""".stripMargin)),

    // §2.3 left outer join (probe-outer in Presto terms).
    "join_left" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val bigOrders = Tables.orders(s, dir).filter($"o_totalprice" > 100000.0)
        Tables.customer(s, dir)
          .join(bigOrders, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n_big_orders"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_big_orders
             |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 100000.0) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // §2.3 right outer join.
    "join_right" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir).filter($"o_totalprice" > 150000.0)
          .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey", "right")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n
             |FROM (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
             |RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // §2.3 full outer join with unmatched rows on both sides.
    "join_full" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rich = Tables.customer(s, dir).filter($"c_acctbal" > 5000.0)
          .select($"c_custkey", $"c_acctbal")
        val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_urgent"))
        rich.join(urgent, $"c_custkey" === $"o_custkey", "full")
          .select(
            coalesce($"c_custkey", $"o_custkey").as("custkey"),
            r4($"c_acctbal").as("acctbal"),
            $"n_urgent")
          .orderBy($"custkey")
      },
      Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
             |  round(c.c_acctbal, 4) AS acctbal, o.n_urgent
             |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0) c
             |FULL JOIN (SELECT o_custkey, count(*) AS n_urgent FROM orders
             |           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
             |  ON c.c_custkey = o.o_custkey
             |ORDER BY custkey""".stripMargin)),

    // §2.3 cross join (nested-loop) over small dims.
    "join_cross" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.nation(s, dir).crossJoin(Tables.region(s, dir))
          .select($"n_nationkey", $"r_regionkey")
          .orderBy($"n_nationkey", $"r_regionkey")
      },
      Some("""SELECT n_nationkey, r_regionkey FROM nation CROSS JOIN region
             |ORDER BY n_nationkey, r_regionkey""".stripMargin)),

    // §2.3 semi join (EXISTS): customers having an urgent order.
    "join_semi" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey")
        Tables.customer(s, dir)
          .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // §2.3 anti join (NOT EXISTS): customers with no filled order.
    "join_anti" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val filled = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
          .select($"o_custkey")
        Tables.customer(s, dir)
          .join(filled, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey").orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // §2.3 theta join: equi key + residual inequality filter
    // (Presto's fast-inequality-join; Spark evaluates the residual
    // inside the hash join). The result is near fact-scale, so the
    // oracle determinism comes from a bucketed count+checksum partial
    // aggregation, NOT a global sort — at 100 TB a full orderBy of
    // this output would be the dominant cost for no semantic gain.
    "join_theta" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        li.join(o, $"l_orderkey" === $"o_orderkey" &&
            $"l_extendedprice" > $"o_totalprice" * 0.5, "inner")
          .groupBy(($"l_orderkey" % 16).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"l_orderkey" * 100 + $"l_linenumber").as("keysum"))
          .orderBy($"bucket")
      },
      Some("""SELECT l_orderkey % 16 AS bucket, count(*) AS n,
             |  CAST(sum(l_orderkey * 100 + l_linenumber) AS BIGINT) AS keysum
             |FROM lineitem JOIN orders
             |  ON l_orderkey = o_orderkey AND l_extendedprice > o_totalprice * 0.5
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // TPC-H Q3 shape: 3-way join + agg + top-N by revenue.
    "tpch_q3" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" < to_timestamp(lit("1995-03-15")))
        val l = Tables.lineitem(s, dir)
          .filter($"l_shipdate" > to_timestamp(lit("1995-03-15")))
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
          .orderBy($"revenue".desc_nulls_last, $"l_orderkey")
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: 6-way star join; dims broadcast.
    "tpch_q5" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1994-01-01")) &&
            $"o_orderdate" < to_timestamp(lit("1997-01-01")))
        val c = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(sup), $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
          .orderBy($"revenue".desc_nulls_last, $"n_name")
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q6 shape: selective scan + global agg (pure pushdown test).
    "tpch_q6" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1994-01-01")) &&
            $"l_shipdate" < to_timestamp(lit("1995-01-01")) &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
          .agg(r4(sum($"l_extendedprice" * $"l_discount")).as("revenue"))
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin)),

    // TPC-H Q10 shape: revenue per customer, top 20 (agg + topN).
    "tpch_q10" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1994-01-01")) &&
            $"o_orderdate" < to_timestamp(lit("1995-01-01")))
        Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
          .join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name")
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
          .orderBy($"revenue".desc_nulls_last, $"c_custkey")
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
             |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q14 shape: conditional-sum ratio (promo revenue share).
    "tpch_q14" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1995-09-01")) &&
            $"l_shipdate" < to_timestamp(lit("1995-10-01")))
          .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
          .agg(r4(
            sum(when($"p_type".startsWith("PROMO"),
              $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(0.0)) * 100.0 /
              sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
            .as("promo_revenue_pct"))
      },
      Some("""SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
             |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END) /
             |  sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin)),

    // TPC-H Q18 shape: HAVING over a fact aggregate, semi-joined back.
    "tpch_q18" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val big = Tables.lineitem(s, dir)
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity").as("total_qty"))
          .filter($"total_qty" > 150.0)
        Tables.orders(s, dir)
          .join(big, $"o_orderkey" === big("l_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
          .select($"c_custkey", $"o_orderkey", r4($"o_totalprice").as("price"),
            r4($"total_qty").as("total_qty"))
          .orderBy($"total_qty".desc_nulls_last, $"o_orderkey")
          .limit(100)
      },
      Some("""SELECT c_custkey, o_orderkey, round(o_totalprice, 4) AS price,
             |  round(total_qty, 4) AS total_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
             |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150.0) t
             |  ON o_orderkey = t.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q19 shape: OR-of-ANDs predicate — Catalyst pushes the
    // common l_partkey=p_partkey up and evaluates the disjunction
    // inside the broadcast join.
    "tpch_q19" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey" &&
            (($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 21)) ||
             ($"p_brand" === "Brand#2" && $"p_size".between(1, 30) && $"l_quantity".between(10, 30)) ||
             ($"p_brand" === "Brand#3" && $"p_size".between(1, 45) && $"l_quantity".between(20, 40))))
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)""".stripMargin)),

    // TPC-H Q22 shape: scalar avg subquery + NOT EXISTS anti join.
    "tpch_q22" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT substring(c_name, 1, 10) AS cntrycode_proxy,
                |  count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
                |FROM customer c
                |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
                |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                |GROUP BY 1 ORDER BY cntrycode_proxy""".stripMargin)
      },
      Some("""SELECT substring(c_name, 1, 10) AS cntrycode_proxy,
             |  count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
             |FROM customer c
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY 1 ORDER BY cntrycode_proxy""".stripMargin)),

    // Exact DECIMAL(12,2) aggregation (SURVEY §1.2 decimal row): sums
    // must match the oracle bit-exactly, no float rounding involved.
    "agg_decimal_exact" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select($"l_returnflag",
            $"l_extendedprice".cast("decimal(12,2)").as("price_dec"))
          .groupBy($"l_returnflag")
          .agg(sum($"price_dec").cast("decimal(38,2)").as("sum_exact"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_exact,
             |  count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // §2.9 inline (array-of-structs UNNEST → ArrayOfRowsUnnester).
    "unnest_inline" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.nation(s, dir)
          .select($"n_nationkey",
            inline(array(
              struct(lit("first").as("tag"), $"n_nationkey".as("v")),
              struct(lit("double").as("tag"), ($"n_nationkey" * 2).as("v")))))
          .orderBy($"n_nationkey", $"tag")
      },
      Some("""SELECT n_nationkey, u.tag AS tag, u.v AS v
             |FROM nation, LATERAL (SELECT unnest([
             |  {'tag': 'first', 'v': n_nationkey},
             |  {'tag': 'double', 'v': n_nationkey * 2}], recursive := true) ) u(tag, v)
             |ORDER BY n_nationkey, tag""".stripMargin)),

    // §2.6 multi-key sort with Presto null ordering (ASC → NULLS LAST).
    "sort_multi" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderkey", $"o_orderstatus", r4($"o_totalprice").as("price"))
          .orderBy($"o_orderstatus".asc_nulls_last, $"price".desc_nulls_last,
            $"o_orderkey".asc_nulls_last)
      },
      Some("""SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS price
             |FROM orders
             |ORDER BY o_orderstatus ASC NULLS LAST, price DESC NULLS LAST, o_orderkey""".stripMargin)),

    // §2.6 top-N: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort).
    "limit_topn" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderkey", r4($"o_totalprice").as("price"))
          .orderBy($"price".desc_nulls_last, $"o_orderkey")
          .limit(25)
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 4) AS price FROM orders
             |ORDER BY price DESC, o_orderkey LIMIT 25""".stripMargin)),

    // §2.6 distinct + limit (deterministic via sort).
    "distinct_limit" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select($"l_returnflag", $"l_linestatus").distinct()
          .orderBy($"l_returnflag", $"l_linestatus").limit(4)
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus LIMIT 4""".stripMargin)),

    // §2.7 UNION ALL.
    "setop_union_all" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val a = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
          .select($"o_orderkey", lit("filled").as("tag"))
        val b = Tables.orders(s, dir).filter($"o_totalprice" > 200000.0)
          .select($"o_orderkey", lit("big").as("tag"))
        a.unionAll(b).orderBy($"o_orderkey", $"tag")
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, 'filled' AS tag FROM orders WHERE o_orderstatus = 'F'
             |  UNION ALL
             |  SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 200000.0) t
             |ORDER BY o_orderkey, tag""".stripMargin)),

    // §2.7 UNION (distinct).
    "setop_union" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val a = Tables.orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
        val b = Tables.orders(s, dir).filter($"o_totalprice" > 100000.0).select($"o_custkey")
        a.union(b).distinct().orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |UNION
             |SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
             |ORDER BY o_custkey""".stripMargin)),

    // §2.7 INTERSECT (distinct).
    "setop_intersect" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val a = Tables.orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
        val b = Tables.orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
        a.intersect(b).orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_custkey""".stripMargin)),

    // §2.7 EXCEPT (distinct).
    "setop_except" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val a = Tables.customer(s, dir).select($"c_custkey")
        val b = Tables.orders(s, dir).select($"o_custkey".as("c_custkey"))
        a.except(b).orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
             |EXCEPT
             |SELECT o_custkey AS c_custkey FROM orders
             |ORDER BY c_custkey""".stripMargin)),

    // §2.9 UNNEST with ordinality (posexplode).
    "unnest_ordinality" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.part(s, dir)
          .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
          .select($"p_partkey", ($"pos" + 1).as("pos"), $"word")
          .orderBy($"p_partkey", $"pos")
      },
      Some("""SELECT p_partkey, ord.pos AS pos, ord.word AS word
             |FROM part, LATERAL (
             |  SELECT unnest(string_split(p_name, ' ')) AS word,
             |         generate_subscripts(string_split(p_name, ' '), 1) AS pos) ord
             |ORDER BY p_partkey, pos""".stripMargin)),

    // §2.9 multi-array UNNEST (Presto UNNEST(a, b) zips arrays of
    // different lengths, null-padding the shorter — arrays_zip +
    // inline reproduces exactly that).
    "unnest_multi" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT n_nationkey, z.`0` AS w, z.`1` AS num
                |FROM nation
                |LATERAL VIEW explode(arrays_zip(split(n_name, '_'),
                |  array(n_nationkey, n_regionkey, n_nationkey + n_regionkey))) zt AS z
                |ORDER BY n_nationkey, num NULLS LAST, w NULLS LAST""".stripMargin)
      },
      Some("""WITH t AS (
             |  SELECT n_nationkey, string_split(n_name, '_') AS ws,
             |    [n_nationkey, n_regionkey, n_nationkey + n_regionkey] AS nums
             |  FROM nation)
             |SELECT n_nationkey,
             |  CASE WHEN i <= len(ws) THEN ws[i] END AS w,
             |  CASE WHEN i <= len(nums) THEN nums[i] END AS num
             |FROM t, LATERAL (SELECT unnest(generate_series(1,
             |  greatest(len(ws), len(nums)))) AS i) u
             |ORDER BY n_nationkey, num, w""".stripMargin)),

    // §2.9 TABLESAMPLE as deterministic filter (Presto rewrites
    // BERNOULLI to a filter; here keyed on orderkey so the oracle
    // agrees — real random sample is ds.sample(), tested in specs).
    "sample_bernoulli" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_orderkey" % 97 < 10)
          .agg(count(lit(1)).as("n"), r4(sum($"l_quantity")).as("qty"))
      },
      Some("""SELECT count(*) AS n, round(sum(l_quantity), 4) AS qty
             |FROM lineitem WHERE l_orderkey % 97 < 10""".stripMargin)),

    // §2.9 real TABLESAMPLE syntax (Presto BERNOULLI sampling): sample
    // membership is engine-specific, so the oracle anchors the total
    // count as a real value and checks the sample fraction statistical
    // bound (10% ±4 percentage points over 6k+ rows, >5σ).
    "sample_tablesample" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT (SELECT count(*) FROM lineitem) AS n_total,
                |  (SELECT count(*) FROM lineitem TABLESAMPLE (10 PERCENT)
                |     REPEATABLE (42)) * 1.0
                |    / (SELECT count(*) FROM lineitem) BETWEEN 0.06 AND 0.14
                |    AS ratio_ok""".stripMargin)
      },
      Some("""SELECT count(*) AS n_total, true AS ratio_ok FROM lineitem""".stripMargin)),

    // §2.2 scalar subquery (EnforceSingleRow semantics).
    "subquery_scalar" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, round(o_totalprice, 4) AS price FROM orders
                |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 4) AS price FROM orders
             |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // §2.2 IN subquery (correlated decorrelation is Catalyst-native).
    "subquery_in" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey FROM customer
                |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // §2.2 correlated EXISTS with an extra correlated predicate.
    "subquery_exists_corr" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, round(c_acctbal, 4) AS acctbal FROM customer c
                |WHERE EXISTS (SELECT 1 FROM orders o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_totalprice > c.c_acctbal * 10)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, round(c_acctbal, 4) AS acctbal FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > c.c_acctbal * 10)
             |ORDER BY c_custkey""".stripMargin)),

    // §2.2 NOT IN (null-aware anti join path).
    "subquery_not_in" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey FROM customer
                |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    // §2.9 WITH / CTE (inlined by both planners).
    "cte_inline" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        // exact cents (r12): at sf1 the segment totals reach ~7e10 and
        // round(sum(double), 4) flips its last digit on summation
        // order; BIGINT cents are order-free (see tpch_q11)
        s.sql("""WITH cust_orders AS (
                |  SELECT o_custkey, count(*) AS n,
                |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                |      AS BIGINT) AS total_cents
                |  FROM orders GROUP BY o_custkey)
                |SELECT c_mktsegment, count(*) AS n_cust,
                |  CAST(CAST(sum(total_cents) AS BIGINT) AS DOUBLE) / 100.0
                |    AS segment_total
                |FROM customer JOIN cust_orders ON c_custkey = o_custkey
                |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""WITH cust_orders AS (
             |  SELECT o_custkey, count(*) AS n,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS total_cents
             |  FROM orders GROUP BY o_custkey)
             |SELECT c_mktsegment, count(*) AS n_cust,
             |  CAST(CAST(sum(total_cents) AS BIGINT) AS DOUBLE) / 100.0
             |    AS segment_total
             |FROM customer JOIN cust_orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // §2.9 AssignUniqueId: ids are engine-specific, so verify the
    // distributed-uniqueness property (n distinct ids == n rows).
    "assign_unique_id" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .withColumn("uid", monotonically_increasing_id())
          .agg(count(lit(1)).as("n_rows"),
            countDistinct($"uid").as("n_distinct_ids"))
      },
      Some("SELECT count(*) AS n_rows, count(*) AS n_distinct_ids FROM orders"))
  )
}
