/** graft — a Spark-native analytics engine with the query and
  * data-processing capabilities of ecohealthalliance/flirt-consume,
  * re-expressed Spark-first (DataFrame/Dataset + Catalyst + Structured
  * Streaming), plus large-scale training-data-pipeline operators
  * (dedup, similarity search, text analysis, multimodal plumbing).
  */
package object graft {
  /** A registered query: (session, scale-factor dir) => result. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Per-process root for fixture-writing queries (ingest round-trips,
    * COW-merge sinks). PID-scoped so a concurrent test suite and Verify
    * run can't clobber each other's fixtures mid-read; oracle SQL strings
    * that reference these paths are built in the same JVM, so query and
    * oracle always agree. `SPARK_GRAFT_FIXTURE_ROOT` pins it for scale
    * runs: a SUBSET Verify into an existing outDir rewrites
    * oracle_sql.json with ITS OWN root, which invalidates every other
    * query's fixture-path oracle unless both runs share the root (the
    * sf30 round-10 compare hit exactly this). */
  val fixtureRoot: String = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_ROOT",
    s"/tmp/graft_fixtures_${ProcessHandle.current().pid()}")
}
