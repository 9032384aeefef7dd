package graft.operators

import graft.{Q, Tables}

/** Relational completeness: SQL subquery forms. Catalyst decorrelates these
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery) into the
  * same join shapes as §2-C — registered through `spark.sql` to exercise
  * the parser→analyzer→decorrelation path end-to-end. */
object Subqueries {

  private def withViews(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
  }

  val queries: Map[String, Q] = Map(
    // Correlated scalar subquery → left outer join + agg after decorrelation.
    "sub_scalar_correlated" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c_custkey,
          |  (SELECT COUNT(*) FROM graft_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |  CAST((SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,6))
          |   FROM graft_orders o WHERE o.o_custkey = c.c_custkey) * 1000000 AS BIGINT) AS max_price_e6
          |FROM graft_customer c
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Uncorrelated IN subquery → left semi join.
    "sub_in_uncorrelated" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c_custkey, c_mktsegment
          |FROM graft_customer
          |WHERE c_custkey IN (
          |  SELECT o_custkey FROM graft_orders WHERE o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // NOT IN with a guaranteed-non-null subquery → null-aware anti join.
    "sub_not_in" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c_custkey
          |FROM graft_customer
          |WHERE c_custkey NOT IN (
          |  SELECT o_custkey FROM graft_orders WHERE o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sub_scalar_correlated" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  CAST((SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |   FROM orders o WHERE o.o_custkey = c.c_custkey) * 1000000 AS BIGINT) AS max_price_e6
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,
    "sub_in_uncorrelated" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "sub_not_in" ->
      """SELECT c_custkey
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin
  )
}
