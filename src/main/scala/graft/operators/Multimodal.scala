package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (§2-J7 + north-star): media as opaque BINARY
  * columns with typed metadata. The query below proves the Spark-side
  * plumbing on synthesized bytes (deterministic md5-derived BLOBs —
  * the testdata has no real media); the decode/feature-extraction stubs
  * and `mapPartitions` batch shapes live in [[graft.functions.Media]] with
  * unit tests. */
object Multimodal {

  val queries: Map[String, Q] = Map(
    // Binary passthrough: synthesize a 16-byte BLOB per document, carry it
    // through the engine, emit exact byte length + hex prefix.
    "multimodal_fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", unhex(md5($"text".cast("binary"))).as("blob"))
        .select($"doc_id",
          length($"blob").as("byte_len"),
          substring(hex($"blob"), 1, 16).as("hex16"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_fingerprint" ->
      """SELECT doc_id,
        |  CAST(octet_length(unhex(md5(text))) AS INT) AS byte_len,
        |  substring(hex(unhex(md5(text))), 1, 16) AS hex16
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
