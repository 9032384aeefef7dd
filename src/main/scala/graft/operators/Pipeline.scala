package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the dedup/similarity family:
  * chunking, deterministic sampling, PII scrubbing, repetition filtering.
  * All are single-scan, shuffle-free per-row transforms (chunking explodes
  * ~n_tokens/stride rows per doc) — embarrassingly parallel at 100 TB, and
  * every output is integer/string so the driver hash-compare is exact.
  */
object Pipeline {

  import org.apache.spark.sql.{Column, DataFrame}

  /** Overlapping token-window chunks of `textCol`: (idCol, chunk_id, n_tok,
    * chunk_tok, chunk). Chunk starts at 1, 1+stride, ... ≤ max(n-window+1, 1)
    * so every token is covered and short docs yield one ragged chunk. */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 20, stride: Int = 10): DataFrame = {
    docs.select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol), size(col("t")).as("n_tok"),
        posexplode(expr(
          s"transform(sequence(1, greatest(size(t) - ${window - 1}, 1), $stride), " +
          s"p -> concat_ws(' ', slice(t, p, $window)))"))
          .as(Seq("chunk_id", "chunk")))
      .select(col(idCol), col("chunk_id"), col("n_tok"),
        size(split(col("chunk"), " ")).as("chunk_tok"), col("chunk"))
  }

  /** Deterministic keep-filter: md5-bucket `keyCol` into 100 buckets, keep
    * bucket < keepPct. No rand() — reproducible across runs and engines. */
  def sampleByHash(df: DataFrame, keyCol: String, keepPct: Int): DataFrame =
    df.filter(
      conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100 < keepPct)

  /** Redact emails then 3+-digit runs with placeholder tokens. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
      "[0-9]{3,}", "<NUM>")

  /** Distinct-token ratio of a whitespace-tokenized text column as an exact
    * ×1e4 BIGINT. Truncating integer division built as (a - a mod b) / b:
    * Column./ is double division, but an exactly-divisible quotient this
    * small is exact in double, so the result matches SQL `div`. */
  def uniqRatioE4(textCol: Column): Column = {
    val t = split(textCol, " ")
    val a = size(array_distinct(t)).cast("long") * 10000
    val b = size(t).cast("long")
    ((a - pmod(a, b)) / b).cast("long")
  }

  val queries: Map[String, Q] = Map(
    // Overlapping token-window chunking (context-window preparation):
    // 20-token windows, stride 10. Chunk starts are 1, 11, 21, ... up to
    // greatest(n-19, 1) so every token lands in ≥1 chunk and a short doc
    // still yields its single (possibly ragged) chunk. Zero shuffles —
    // generator + projection inside whole-stage codegen.
    "pipe_chunk_overlap" -> ((s, d) =>
      chunkOverlap(Tables.documents(s, d), "doc_id", "text", 20, 10)
        .orderBy("doc_id", "chunk_id")),

    // Deterministic stratified corpus sampling: md5-bucket each doc_id into
    // 100 buckets, keep bucket < 20 (a reproducible 20% sample — no rand(),
    // so re-runs and both engines agree row-for-row). Per-language counts
    // prove the strata survive.
    "pipe_sample_stratified" -> ((s, d) => {
      import s.implicits._
      sampleByHash(Tables.documents(s, d), "doc_id", 20)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_sampled"), sum($"doc_id").as("id_checksum"))
        .orderBy("lang")
    }),

    // PII scrubbing: emails then 3+-digit runs → placeholder tokens, with
    // per-doc redaction counts. The synthetic corpus has no natural PII, so
    // a deterministic contact line (derived from doc_id) is appended first —
    // the patterns and replacement order are the operator under test.
    "pipe_pii_scrub" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter($"doc_id" < 200)
        .withColumn("raw", concat($"text",
          lit(" contact user"), $"doc_id", lit("@example.com ref "), $"doc_id" * 7919))
        .select($"doc_id",
          size(expr("regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+', 0)")).as("n_email"),
          size(expr("regexp_extract_all(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>'), '[0-9]{3,}', 0)")).as("n_num"),
          scrubPii($"raw").as("scrubbed"))
        .orderBy("doc_id")
    }),

    // Repetition filter: docs whose distinct-token ratio falls below 30%
    // are dropped (boilerplate/spam heuristic). Ratio as exact ×1e4
    // integer, truncating division on both engines.
    "pipe_repetition_filter" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", $"lang", split($"text", " ").as("t"),
          uniqRatioE4($"text").as("uniq_ratio_e4"))
        .select($"doc_id", $"lang",
          size($"t").as("n_tok"),
          size(array_distinct($"t")).as("n_uniq"),
          $"uniq_ratio_e4")
        .filter($"uniq_ratio_e4" >= 3000)
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "pipe_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |starts AS (
        |  SELECT doc_id, t, len(t) AS n_tok, 1 + 10 * k AS p,
        |    CAST(k AS INT) AS chunk_id
        |  FROM t, range(0, 64) r(k)
        |  WHERE 1 + 10 * k <= greatest(len(t) - 19, 1))
        |SELECT doc_id, chunk_id, CAST(n_tok AS INT) AS n_tok,
        |  CAST(len(t[p:p+19]) AS INT) AS chunk_tok,
        |  array_to_string(t[p:p+19], ' ') AS chunk
        |FROM starts ORDER BY doc_id, chunk_id""".stripMargin,
    "pipe_sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |WHERE bucket < 20 GROUP BY lang ORDER BY lang""".stripMargin,
    "pipe_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ref '
        |         || CAST(doc_id * 7919 AS VARCHAR) AS raw
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'), '[0-9]{3,}')) AS INT) AS n_num,
        |  regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'), '[0-9]{3,}', '<NUM>', 'g') AS scrubbed
        |FROM raw ORDER BY doc_id""".stripMargin,
    "pipe_repetition_filter" ->
      """SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
        |  (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 10000)
        |    // len(string_split(text, ' ')) AS uniq_ratio_e4
        |FROM documents
        |WHERE (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 10000)
        |    // len(string_split(text, ' ')) >= 3000
        |ORDER BY doc_id""".stripMargin
  )
}
