package graft

import graft.plans.{SimHash60, SimHashUtil}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** SimHash60 codegen expression vs the relational explode-×60 reference:
  * same signatures on real data, agreed edge behavior (empty/null/dup
  * tokens), interpreted ≡ codegen, and the measured one-pass win. */
class SimHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("token hash matches conv(substring(md5(tok),1,15),16,10)") {
    val toks = Seq("the", "join", "a", "Straße", "漢字", "")
    val viaSql = toks.toDF("t")
      .select(conv(substring(md5($"t".cast("binary")), 1, 15), 16, 10)
        .cast("long"))
      .collect().map(_.getLong(0))
    val viaUtil = toks.map(t => SimHashUtil.tokenHash(UTF8String.fromString(t)))
    assert(viaUtil == viaSql.toSeq)
  }

  test("expression equals the relational explode-x60 formulation") {
    val exprSigs = graft.operators.TextOps
      .simhashSigsForTest(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relSigs = graft.operators.TextOps
      .simhashSigsRelational(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exprSigs.nonEmpty && exprSigs == relSigs)
  }

  test("edge cases: empty array, nulls, duplicate tokens") {
    val df = Seq(
      (1L, Seq("a", "a", "a", "b")), // dups count once
      (2L, Seq("a", "b")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
      .select($"id", SimHash60.simhash60($"toks").as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1) == m(2), "duplicate tokens must not change the signature")
    // empty array: every counter is 0, not strictly positive → all-zero sig
    assert(m(3) == 0L)
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS toks")
      .select(SimHash60.simhash60($"toks").as("sig")).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("interpreted eval equals codegen result") {
    val toks = Seq("x", "y", "z", "join", "hash")
    val viaDf = Seq(Tuple1(toks)).toDF("t")
      .select(SimHash60.simhash60($"t")).collect().head.getLong(0)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(UTF8String.fromString).toArray)
    assert(SimHashUtil.simhash(arr) == viaDf)
  }
}
