package graft.operators

import graft.{Q, Tables}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2-A2/A3 promoted to oracle-checked queries (round-2 verdict item 6).
  *
  * Each query round-trips a deterministic fixture (derived from the
  * SF-independent 25-row `nation` table) through the engine's text
  * source/sink and returns the parsed rows; the oracle re-parses the SAME
  * files with DuckDB's `read_csv`/`read_json`, so the check covers the
  * parse semantics themselves — quoting, embedded separators, NULL
  * encoding, date parsing, nested structs/arrays, absent JSON keys — not
  * just row counts. Fixtures are tiny and rewritten on every run; at
  * 100 TB the same readers apply unchanged (explicit schema, no infer
  * pass, splittable line-oriented formats).
  */
object Ingest {

  private val csvFixture  = s"${graft.fixtureRoot}/csv_nation"
  private val jsonFixture = s"${graft.fixtureRoot}/json_nation"
  private val partFixture = s"${graft.fixtureRoot}/part_nation"

  private val csvSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("note", StringType), StructField("d", DateType),
    StructField("opt", LongType)))

  private val jsonSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("geo", StructType(Seq(
      StructField("rk", LongType), StructField("nm", StringType)))),
    StructField("arr", ArrayType(LongType)), StructField("opt_s", StringType)))

  val queries: Map[String, Q] = Map(
    // A2: write RFC-4180 CSV (embedded commas + doubled quotes in `note`,
    // empty-field NULL in `opt`, ISO dates), read it back, emit the rows.
    "ingest_csv_roundtrip" -> ((s, d) => {
      import s.implicits._
      Sources.writeCsv(
        Tables.nation(s, d).select(
          $"n_nationkey", $"n_name",
          concat(lit("a,\"q\" "), $"n_name").as("note"),
          date_add(lit("1992-01-03").cast("date"), $"n_nationkey").as("d"),
          when($"n_nationkey" % 3 === 0, lit(null).cast("long"))
            .otherwise($"n_nationkey".cast("long") * 7L).as("opt")),
        csvFixture)
      Sources.readCsv(s, csvFixture, csvSchema)
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          $"note", date_format($"d", "yyyy-MM-dd").as("d_s"), $"opt")
        .orderBy("n_nationkey")
    }),

    // A3: write JSON-lines with a nested struct, an array, and a NULL
    // string (Spark omits the key entirely — the reader must backfill),
    // read it back with an explicit schema, flatten for the compare.
    "ingest_json_roundtrip" -> ((s, d) => {
      import s.implicits._
      Tables.nation(s, d).select(
          $"n_nationkey", $"n_name",
          struct($"n_regionkey".cast("long").as("rk"),
                 upper($"n_name").as("nm")).as("geo"),
          array($"n_nationkey".cast("long"),
                $"n_nationkey".cast("long") * 2L).as("arr"),
          when($"n_nationkey" % 4 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("c:"), $"n_name")).as("opt_s"))
        .coalesce(1).write.mode("overwrite").json(jsonFixture)
      Sources.readJsonLines(s, jsonFixture, jsonSchema)
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          $"geo.rk".as("geo_rk"), $"geo.nm".as("geo_nm"),
          array_join($"arr", ",").as("arr_s"), $"opt_s")
        .orderBy("n_nationkey")
    }),

    // A4: the partitioned parquet sink, graded through the LAYOUT itself —
    // the oracle re-reads the directory tree with DuckDB's
    // hive_partitioning, so the check covers the partition-directory
    // encoding (key=value dirs, partition column reconstructed from the
    // path, data files carrying only the non-partition columns), not just
    // the row payload. This layout is what makes partition pruning work
    // at 100 TB: a region-filtered read lists one directory.
    "ingest_partitioned_roundtrip" -> ((s, d) => {
      import s.implicits._
      Sources.writePartitioned(
        Tables.nation(s, d).join(Tables.region(s, d),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey".cast("long").as("n_nationkey"),
            $"n_name", $"r_name"),
        partFixture, Seq("r_name"))
      s.read.parquet(partFixture)
        .select($"n_nationkey", $"n_name", $"r_name".cast("string").as("r_name"))
        .orderBy("n_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ingest_csv_roundtrip" ->
      s"""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, note,
         |       CAST(d AS VARCHAR) AS d_s, opt
         |FROM read_csv('$csvFixture/*.csv', header=true,
         |  columns={'n_nationkey':'INTEGER','n_name':'VARCHAR','note':'VARCHAR','d':'DATE','opt':'BIGINT'})
         |ORDER BY n_nationkey""".stripMargin,
    "ingest_json_roundtrip" ->
      s"""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
         |       geo.rk AS geo_rk, geo.nm AS geo_nm,
         |       array_to_string(arr, ',') AS arr_s, opt_s
         |FROM read_json('$jsonFixture/*.json', format='newline_delimited',
         |  columns={'n_nationkey':'INTEGER','n_name':'VARCHAR','geo':'STRUCT(rk BIGINT, nm VARCHAR)','arr':'BIGINT[]','opt_s':'VARCHAR'})
         |ORDER BY n_nationkey""".stripMargin,
    // Re-reads the engine-written key=value directory tree; the partition
    // column comes back from the PATH, proving the layout encoding.
    "ingest_partitioned_roundtrip" ->
      s"""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
         |       CAST(r_name AS VARCHAR) AS r_name
         |FROM read_parquet('$partFixture/*/*.parquet', hive_partitioning=true)
         |ORDER BY n_nationkey""".stripMargin
  )
}
