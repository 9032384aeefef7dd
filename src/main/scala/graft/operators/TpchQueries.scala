package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Classic TPC-H composition shapes (Q3/Q5/Q10 adapted to the testdata's
  * simplified column sets) — multi-join + decimal aggregation + top-k in
  * one plan, the canonical end-to-end analytics stress of the relational
  * core. Q5 exercises the supplier dimension (local-supplier condition
  * c_nationkey = s_nationkey). */
object TpchQueries {

  private def discPrice = (Tables.dec(col("l_extendedprice")) *
    (lit(1) - Tables.dec(col("l_discount")))).cast("decimal(18,6)")

  val queries: Map[String, Q] = Map(
    // Q3: shipping-priority — revenue of unshipped orders for a segment.
    "tpch_q3_shipping" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" < expr("TIMESTAMP_NTZ '1996-03-15 00:00:00'"))
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .filter($"l_shipdate" > expr("TIMESTAMP_NTZ '1996-03-15 00:00:00'"))
        .groupBy($"l_orderkey",
          $"o_orderdate".cast("date").cast("string").as("orderdate"),
          $"o_orderpriority")
        .agg(sum(discPrice).cast("decimal(18,6)").as("revenue"))
        .select($"l_orderkey", $"orderdate", $"o_orderpriority",
          Tables.e6($"revenue").as("revenue_e6"))
        .orderBy($"revenue_e6".desc, $"l_orderkey".asc)
        .limit(10)
    }),

    // Q5: local-supplier volume per nation within a region and year.
    "tpch_q5_local_supplier" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          $"o_orderdate" < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        // supplier is the smallest non-tiny table (10x smaller than
        // customer in TPC-H proportions) — broadcast it to save the third
        // shuffle; at extreme scale AQE's size estimate would make the call
        .join(broadcast(Tables.supplier(s, d)),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(sum(discPrice).cast("decimal(18,6)").as("revenue"))
        .select($"n_name", Tables.e6($"revenue").as("revenue_e6"))
        .orderBy($"revenue_e6".desc, $"n_name".asc)
    }),

    // Q10: returned-item reporting — top customers by lost revenue.
    "tpch_q10_returns" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          $"o_orderdate" < expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .filter($"l_returnflag" === "R")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum(discPrice).cast("decimal(18,6)").as("revenue"))
        .select($"c_custkey", $"c_name", $"n_name", Tables.e6($"revenue").as("revenue_e6"))
        .orderBy($"revenue_e6".desc, $"c_custkey".asc)
        .limit(20)
    }),

    // Q7: volume shipping — bilateral trade flow between two nations per
    // ship year (supplier nation → customer nation, both directions).
    // Two broadcast hops resolve both nation names from one dim; the
    // OR-pair predicate stays an equi-join prefix on the keys.
    "tpch_q7_volume" -> ((s, d) => {
      import s.implicits._
      val n1 = Tables.nation(s, d)
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          $"l_shipdate" < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .filter(($"s_nationkey" === 2 && $"c_nationkey" === 3) ||
                ($"s_nationkey" === 3 && $"c_nationkey" === 2))
        .join(broadcast(n1), $"s_nationkey" === $"s_nk")
        .join(broadcast(n2), $"c_nationkey" === $"c_nk")
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("ship_year"))
        .agg(sum(discPrice).cast("decimal(18,6)").as("revenue"))
        .select($"supp_nation", $"cust_nation", $"ship_year",
          Tables.e6($"revenue").as("revenue_e6"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    }),

    // Q14: promo revenue share in a ship year — the conditional-sum /
    // total-sum ratio emitted as exact parts-per-million (the decimal
    // ratio rides one DECIMAL(38,0) lift, R7 stepwise).
    "tpch_q14_promo" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
          $"l_shipdate" < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        .agg(
          sum(when($"p_type" === "PROMO", discPrice).otherwise(lit(0))
            .cast("decimal(18,6)")).cast("decimal(18,6)").as("promo"),
          sum(discPrice).cast("decimal(18,6)").as("total"))
        .select(Tables.e6($"promo").as("promo_rev_e6"),
          Tables.e6($"total").as("total_rev_e6"))
        .withColumn("promo_ppm",
          expr("cast(cast(promo_rev_e6 as decimal(38,0)) * 1000000 div total_rev_e6 as bigint)"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tpch_q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue_e6
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue_e6 DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "tpch_q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue_e6
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue_e6 DESC, n_name ASC""".stripMargin,
    "tpch_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue_e6
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e6 DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "tpch_q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue_e6
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((s_nationkey = 2 AND c_nationkey = 3)
        |    OR (s_nationkey = 3 AND c_nationkey = 2))
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    "tpch_q14_promo" ->
      """WITH a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS BIGINT) AS promo_rev_e6,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_rev_e6
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT promo_rev_e6, total_rev_e6,
        |  CAST(CAST(promo_rev_e6 AS HUGEINT) * 1000000 // total_rev_e6 AS BIGINT) AS promo_ppm
        |FROM a""".stripMargin
  )
}
