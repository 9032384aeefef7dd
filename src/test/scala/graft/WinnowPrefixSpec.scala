package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theorem tests for the two round-3 dedup additions.
  *
  * Winnowing (k=8, w=4): any substring shared between two documents of
  * length ≥ k + w - 1 = 11 characters guarantees a shared fingerprint —
  * the whole point of the window-minimum selection rule (a shared run of
  * ≥ w consecutive k-gram hashes contains at least one full window, and
  * both documents select the same minimum inside it, provided the run
  * isn't clipped by either document's end where windows stop forming).
  *
  * Prefix filtering (t = 0.5): probing only each set's n div 2 + 1
  * rarest tokens loses NO pair with Jaccard ≥ t — proven here by equality
  * with the naive all-pairs join on seeded random corpora engineered to
  * straddle the threshold.
  */
class WinnowPrefixSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("winnowing: an 11-char shared substring always yields a shared fingerprint") {
    val rnd = new scala.util.Random(20260813L)
    def randStr(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // 40 pairs: distinct random bodies with the same 11-char snippet
    // planted at interior positions ≥ w so the guarantee window can't be
    // clipped by the document boundary on either side.
    val docs = (0 until 40).flatMap { i =>
      val shared = randStr(11)
      val a = randStr(8 + rnd.nextInt(40)) + shared + randStr(8 + rnd.nextInt(40))
      val b = randStr(8 + rnd.nextInt(40)) + shared + randStr(8 + rnd.nextInt(40))
      Seq((2L * i, a, i.toLong), (2L * i + 1, b, i.toLong))
    }.toDF("doc_id", "text", "pair")
    val fps = operators.TextOps.winnowFingerprints(docs)
    val sharedCount = fps.as("x").join(fps.as("y"),
        col("x.h") === col("y.h") &&
        col("x.doc_id") + 1 === col("y.doc_id") &&
        col("x.doc_id") % 2 === 0)
      .select((col("x.doc_id") / 2).cast("long").as("pair")).distinct().count()
    assert(sharedCount == 40L,
      s"all 40 planted pairs must share a fingerprint, got $sharedCount")
  }

  test("winnowing: codegen expression ≡ relational form on the testdata") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .filter($"doc_id" < 120).select($"doc_id", $"text")
    val exprFp = operators.TextOps.winnowFingerprints(docs)
      .as[(Long, Long)].collect().toSet
    val relFp = operators.TextOps.winnowFingerprintsRelational(docs)
      .as[(Long, Long)].collect().toSet
    assert(exprFp == relFp,
      s"missing=${(relFp -- exprFp).take(5)} extra=${(exprFp -- relFp).take(5)}")
    assert(exprFp.nonEmpty)
  }

  test("winnowing: expression ≡ relational on random unicode (char-based substring semantics)") {
    // the expression k-grams via UTF8String.substringSQL, the relational
    // form via Spark substring() — both must slice by CHARACTER; mixing
    // multi-byte code points into random docs catches any byte/char
    // confusion the ASCII testdata cannot
    val rnd = new scala.util.Random(424242L)
    val alphabet = "ab φψ界漢🚀é1".toCharArray.filterNot(_.isSurrogate) :+ 'z'
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val e = operators.TextOps.winnowFingerprints(docs)
      .as[(Long, Long)].collect().toSet
    val r = operators.TextOps.winnowFingerprintsRelational(docs)
      .as[(Long, Long)].collect().toSet
    assert(e == r, s"missing=${(r -- e).take(5)} extra=${(e -- r).take(5)}")
  }

  test("winnowing: density is ~2/(w+1) of k-gram positions, never zero on real docs") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .filter($"doc_id" < 50).select($"doc_id", $"text")
    val nPos = docs.select(sum(greatest(length($"text") - 7, lit(0)))).as[Long].head()
    val nFp = operators.TextOps.winnowFingerprints(docs).count()
    // distinct-h per doc undercounts repeated selections, so allow a wide
    // band around the theoretical 2/(w+1) = 0.4 expectation
    assert(nFp > 0 && nFp < nPos, s"fp=$nFp positions=$nPos")
    assert(nFp.toDouble / nPos > 0.05 && nFp.toDouble / nPos < 0.6,
      s"selection density ${nFp.toDouble / nPos} outside sanity band")
  }

  test("prefix filter: identical pair set as the naive all-pairs join (seeded corpora)") {
    val rnd = new scala.util.Random(777123L)
    // 60 docs over a 120-token vocabulary with Zipf-ish reuse: doc i
    // draws 10–30 tokens, half from a hot pool (high df) and half from a
    // cold pool (low df), plus 10 mutated near-copies — pairs land on
    // both sides of Jaccard = 0.5.
    val vocab = (0 until 120).map(i => s"w$i")
    val base = (0 until 60).map { i =>
      val n = 10 + rnd.nextInt(21)
      val toks = (0 until n).map { _ =>
        if (rnd.nextBoolean()) vocab(rnd.nextInt(20))
        else vocab(20 + rnd.nextInt(100))
      }
      (i.toLong, toks.distinct.mkString(" "))
    }
    val mutated = (0 until 10).map { j =>
      val (_, text) = base(j)
      val toks = text.split(" ").toSeq
      val dropped = toks.drop(1 + rnd.nextInt(math.max(1, toks.size / 3)))
      ((100 + j).toLong, (dropped :+ vocab(rnd.nextInt(120))).distinct.mkString(" "))
    }
    val docs = (base ++ mutated).toDF("doc_id", "text")
    val filtered = operators.TextOps.jaccardPrefixPairs(docs)
      .select($"d1", $"d2", $"inter", $"jac_e6")
      .as[(Long, Long, Long, Long)].collect().toSet
    // naive: every pair through the full posting-list join
    val toks = docs.select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val naive = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .select($"d1", $"d2", $"inter",
        expr("(inter * 1000000) div (n1 + n2 - inter)").as("jac_e6"))
      .filter($"jac_e6" >= 500000)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(naive.nonEmpty, "corpus must produce qualifying pairs for the test to bite")
    assert(filtered == naive,
      s"prefix filter must be lossless: missing=${naive -- filtered} extra=${filtered -- naive}")
  }

  test("prefix filter: candidate volume is smaller than the naive join's") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .filter($"doc_id" < 150).select($"doc_id", $"text")
    val toks = docs.select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
    val W = org.apache.spark.sql.expressions.Window
    val prefix = toks
      .withColumn("df", count(lit(1)).over(W.partitionBy($"tok")))
      .withColumn("n", count(lit(1)).over(W.partitionBy($"doc_id")))
      .withColumn("r", row_number().over(W.partitionBy($"doc_id").orderBy($"df", $"tok")))
      .filter(expr("r <= n div 2 + 1"))
      .select($"doc_id", $"tok")
    def joinRows(t: org.apache.spark.sql.DataFrame): Long =
      t.as("a").join(t.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")).count()
    val full = joinRows(toks)
    val pref = joinRows(prefix)
    assert(pref < full, s"prefix candidates $pref must undercut naive $full")
  }
}
