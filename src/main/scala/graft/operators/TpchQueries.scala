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
        |ORDER BY revenue_e6 DESC, c_custkey ASC LIMIT 20""".stripMargin
  )
}
