/** graft — a Spark-native analytics engine with the query and
  * data-processing capabilities of ecohealthalliance/flirt-consume,
  * re-expressed Spark-first (DataFrame/Dataset + Catalyst + Structured
  * Streaming), plus large-scale training-data-pipeline operators
  * (dedup, similarity search, text analysis, multimodal plumbing).
  */
package object graft {
  /** A registered query: (session, scale-factor dir) => result. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
