package graft

import graft.functions.{AnnSearch, LangId, Media}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2-H7 map functions, lang-ID heuristic, ANN search recall, multimodal
  * plumbing. */
class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("H7: map construction + map functions") {
    val df = Tables.nation(spark, TestSpark.sfDir)
      .select(map(lit("key"), $"n_nationkey", lit("region"), $"n_regionkey").as("m"))
    val row = df.select(
      map_keys($"m").as("ks"),
      element_at($"m", "key").as("k"),
      size($"m").as("n")).orderBy($"k").head()
    assert(row.getAs[scala.collection.Seq[String]]("ks").toSeq == Seq("key", "region"))
    assert(row.getAs[Int]("k") == 0)
    assert(row.getAs[Int]("n") == 2)
    // map_from_entries + aggregation over map values
    val agg = Tables.nation(spark, TestSpark.sfDir)
      .select(map_from_arrays(array(lit("nk")), array($"n_nationkey")).as("m"))
      .select(element_at($"m", "nk").as("v"))
      .agg(sum($"v")).as[Long].head()
    assert(agg == (0 until 25).sum)
  }

  test("lang-ID heuristic classifies authored sentences") {
    val samples = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("der hund ist nicht mit der katze", "de"),
      ("le chien est dans la maison et il est content", "fr"),
      ("el perro es una mascota en la casa", "es"),
      ("这是 一个 中文 句子", "zh"),
      ("zzz qqq xxx", "und"))
    val df = samples.toDF("text", "expected")
      .withColumn("got", LangId.langId($"text"))
    val wrong = df.filter($"got" =!= $"expected").collect()
    assert(wrong.isEmpty, wrong.mkString(", "))
  }

  test("ANN auto-sizing: width/list-count grow with the corpus and clamp") {
    // clamp floor at tiny corpora, ceiling at absurd ones, monotone between
    assert(AnnSearch.autoBits(0) == 5 && AnnSearch.autoBits(500) == 5)
    assert(AnnSearch.autoBits(2000) == 7)    // ceil(log2(2000/16)) = 7
    assert(AnnSearch.autoBits(200000) == 14) // the sf10 corpus
    assert(AnnSearch.autoBits(Long.MaxValue) == 16)
    val bits = (1L to 60L).map(e => AnnSearch.autoBits(1L << math.min(e, 62L).toInt))
    assert(bits == bits.sorted, "autoBits must be monotone in n")
    assert(AnnSearch.autoCentroids(10) == 8 && AnnSearch.autoCentroids(500) == 23)
    assert(AnnSearch.autoCentroids(1000000) == 1000)
    assert(AnnSearch.autoCentroids(100000000L) == 4096) // two-level cap
    assert(AnnSearch.autoCoarse(8) == 4 && AnnSearch.autoCoarse(448) == 22)
    assert(AnnSearch.autoCoarse(4096) == 64)
    assert(AnnSearch.autoTrainN(500, 23) == 500)
    assert(AnnSearch.autoTrainN(200000, 448) == 14336)
  }

  test("ANN LSH top-k achieves good recall vs brute force") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = AnnSearch.cosineTopK(e.filter($"vec_id" =!= 0), q, 20)
      .select($"vec_id").as[Long].collect().toSet
    val approx = AnnSearch.annTopK(e.filter($"vec_id" =!= 0), q, 20, dim = 64,
        nBits = 5, nTables = 12)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low; approx=$approx")
  }

  test("ANN IVF top-k beats the probe-fraction prior vs brute force") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = AnnSearch.cosineTopK(e.filter($"vec_id" =!= 0), q, 20)
      .select($"vec_id").as[Long].collect().toSet
    val approx = AnnSearch.ivfTopK(e, q, 20, nCentroids = 8, nProbe = 2,
        nCoarse = 4, trainN = 256L, gProbe = 2, excludeId = 0L)
      .select($"vec_id").as[Long].collect().toSet
    assert(approx.size == 20, s"probed clusters must hold >= k candidates")
    val recall = (exact intersect approx).size.toDouble / exact.size
    // probing 2/8 clusters at random would catch ~25% of the true top-k;
    // probing the query's NEAREST clusters must do meaningfully better
    assert(recall >= 0.35, s"recall $recall no better than random probing")
  }

  test("multi-probe LSH beats exact-bucket probing at the corpus auto width") {
    // The recall-per-byte claim behind sim_ann_lsh_multiprobe: at the
    // corpus-sized width, 4 tables probed at bucket+flips must beat BOTH
    // 4-table and 12-table exact-bucket probing (measured on this corpus:
    // single4=0.05, single12=0.2, multi4=0.55 — one third the index
    // storage, better recall). graft.RecallProbe reproduces the numbers.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val nb = AnnSearch.autoBits(e.count())
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = AnnSearch.cosineTopK(e.filter($"vec_id" =!= 0), q, 20)
      .select($"vec_id").as[Long].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"vec_id").as[Long].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val single4 = recallOf(AnnSearch.annTopK(
      e.filter($"vec_id" =!= 0), q, 20, dim = 64, nBits = nb, nTables = 4))
    val single12 = recallOf(AnnSearch.annTopK(
      e.filter($"vec_id" =!= 0), q, 20, dim = 64, nBits = nb, nTables = 12))
    val multi4 = recallOf(AnnSearch.annTopKMulti(
      e.filter($"vec_id" =!= 0), q, 20, dim = 64, nBits = nb, nTables = 4))
    assert(multi4 >= single4 && multi4 >= single12,
      s"multi-probe $multi4 must beat single-probe ($single4 @4t, $single12 @12t)")
    assert(multi4 >= 0.5, s"multi-probe recall $multi4 too low at width $nb")
  }

  test("trained two-level IVF reaches production recall at sf0.1 auto params") {
    // The VERDICT-r7 gate: recall@20 >= 0.9 vs the exact scan, at the same
    // auto-derived parameters the graded sim_ann_ivf row uses.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val nC = AnnSearch.autoCentroids(n)
    val nG = AnnSearch.autoCoarse(nC)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = AnnSearch.cosineTopK(e.filter($"vec_id" =!= 0), q, 20)
      .select($"vec_id").as[Long].collect().toSet
    val approx = AnnSearch.ivfTopK(e, q, 20, nCentroids = nC,
        nProbe = math.max(2, nC / 8), nCoarse = nG,
        trainN = AnnSearch.autoTrainN(n, nC),
        gProbe = math.max(2, nG / 4), excludeId = 0L)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"trained-IVF recall $recall < 0.9 at sf0.1")
  }

  test("IVF-PQ reaches near-IVF recall from 4-byte codes at sf0.1 auto params") {
    // The claim behind sim_ann_ivf_pq: ranking probed-list candidates by
    // 8 auto-width PQ codes through the query's ADC table (>=32x less
    // candidate data touched than raw vectors) and exact-reranking only
    // the top-autoRerank survivors must still deliver production recall
    // vs the exact scan -- measured equal to the trained-IVF recall at
    // sf0.1 AND at sf30's 8-bit/2343-window auto point.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val nC = AnnSearch.autoCentroids(n)
    val nG = AnnSearch.autoCoarse(nC)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = AnnSearch.cosineTopK(e.filter($"vec_id" =!= 0), q, 20)
      .select($"vec_id").as[Long].collect().toSet
    val approx = AnnSearch.ivfPqTopK(e, q, 20, nCentroids = nC,
        nProbe = math.max(2, nC / 8), nCoarse = nG,
        trainN = AnnSearch.autoTrainN(n, nC),
        ksub = AnnSearch.autoKsub(n), rerankR = AnnSearch.autoRerank(n),
        gProbe = math.max(2, nG / 4), excludeId = 0L)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF-PQ recall $recall < 0.9 at sf0.1")
  }

  test("filtered ANN: pre-filter fills k allowed rows where post-filter starves") {
    // The claim behind sim_ann_ivf_filtered: with a ~10% metadata filter
    // (label = 7), pre-filtering candidates inside the probe (widened
    // nc/8 → nc/2) returns a FULL k of allowed-only results at usable
    // recall, while the naive alternative — post-filtering the unfiltered
    // top-k — starves to a handful of rows. Recall gates at 0.6, not the
    // unfiltered 0.9: the filtered true top-20 corresponds to unfiltered
    // ranks reaching ~200, which on this structureless corpus (the ANN
    // worst case) scatter across most lists — measured 0.70 at np = nc/2,
    // 0.75 at np = nc/2 with ALL coarse cells, 1.0 only at np = nc (the
    // exact scan). Production engines switch to brute force over the
    // filtered subset below ~1/8 selectivity for exactly this reason.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val nC = AnnSearch.autoCentroids(n)
    val nG = AnnSearch.autoCoarse(nC)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val allowedDf = e.filter($"label" === 7).select($"vec_id")
    val allowedIds = allowedDf.as[Long].collect().toSet
    val exact = AnnSearch
      .cosineTopK(e.filter($"vec_id" =!= 0 && $"label" === 7), q, 20)
      .select($"vec_id").as[Long].collect().toSet
    val pre = AnnSearch.ivfTopK(e, q, 20, nCentroids = nC,
        nProbe = math.max(8, nC / 2), nCoarse = nG,
        trainN = AnnSearch.autoTrainN(n, nC),
        gProbe = math.max(4, nG / 2), excludeId = 0L,
        allowed = Some(allowedDf))
      .select($"vec_id").as[Long].collect().toSet
    assert(pre.size == 20, s"pre-filter must fill k; got ${pre.size}")
    assert(pre.subsetOf(allowedIds), "pre-filter leaked a disallowed id")
    val preRecall = (exact intersect pre).size.toDouble / exact.size
    assert(preRecall >= 0.6, s"pre-filter recall $preRecall < 0.6")
    // Post-filter: unfiltered top-20 at the graded unfiltered params,
    // then apply the predicate — keeps only the few label-7 rows that
    // happened to rank in the global top-20 (expected ~10% of k).
    val post = AnnSearch.ivfTopK(e, q, 20, nCentroids = nC,
        nProbe = math.max(2, nC / 8), nCoarse = nG,
        trainN = AnnSearch.autoTrainN(n, nC),
        gProbe = math.max(2, nG / 4), excludeId = 0L)
      .select($"vec_id").as[Long].collect().toSet
      .intersect(allowedIds)
    assert(post.size < 10, s"post-filter unexpectedly kept ${post.size} rows")
    assert(pre.size > post.size, "pre-filter must beat post-filter coverage")
  }

  test("batched ANN agrees with the single-query path for each batch member") {
    // One trained index serving a 4-query batch must return, for qid 0,
    // the same neighbor set the dedicated single-query ivfTopK returns —
    // the two code paths (broadcast-single-query vs (qid,cid) probe
    // relation + qid-partitioned rank) prove each other.
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val n = e.count()
    val nC = AnnSearch.autoCentroids(n)
    val nG = AnnSearch.autoCoarse(nC)
    val q1 = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val single = AnnSearch.ivfTopK(e, q1, 20, nCentroids = nC,
        nProbe = math.max(2, nC / 8), nCoarse = nG,
        trainN = AnnSearch.autoTrainN(n, nC),
        gProbe = math.max(2, nG / 4), excludeId = 0L)
      .select($"vec_id").as[Long].collect().toSet
    val qb = e.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val batch = AnnSearch.ivfTopKBatch(e, qb, 20, nCentroids = nC,
        nProbe = math.max(2, nC / 8), nCoarse = nG,
        trainN = AnnSearch.autoTrainN(n, nC), gProbe = math.max(2, nG / 4))
    val batch0 = batch.filter($"qid" === 0)
      .select($"vec_id").as[Long].collect().toSet
    assert(batch0 == single,
      s"batch qid=0 ${batch0.toSeq.sorted} != single ${single.toSeq.sorted}")
    // every batch member gets a full k
    val counts = batch.groupBy($"qid").count()
      .as[(Long, Long)].collect().toMap
    assert((0L to 3L).forall(counts.get(_).contains(20L)), counts.toString)
  }

  test("hybrid RRF fusion is self-consistent and draws from both arms") {
    // pipe_hybrid_retrieval invariants the oracle hash can't articulate:
    // every fused score equals the RRF formula recomputed from the ranks,
    // scores are non-increasing in output order, and the fused top-10
    // actually mixes modalities (neither arm alone dictates the page).
    val rows = SparkEntry.queries("pipe_hybrid_retrieval")(
        spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"lex_rank", $"vec_rank", $"rrf_e6")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { case (id, lr, vr, s) =>
      val want = (if (lr > 0) 1000000L / (60 + lr) else 0L) +
                 (if (vr > 0) 1000000L / (60 + vr) else 0L)
      assert(s == want, s"doc $id rrf $s != recomputed $want")
    }
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 >= b._4 },
      "fused scores must be non-increasing")
    assert(rows.exists(_._2 > 0) && rows.exists(_._3 > 0),
      "fused top-10 must contain rows from both arms")
  }

  test("PqCodes expression encodes exactly like the relational argmax") {
    // The codegen encode (one compiled triple loop, codebook as bounded
    // constants) must be bit-identical to the join-all-codewords relational
    // argmax the DuckDB oracle runs — the WinnowFp/SimHash60 pattern: the
    // fast path and the oracle path prove each other. 8-bit width forced so
    // the test exercises the scale configuration, not just ksub=16.
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val eq = AnnSearch.quantize(e, "vec_id", "embedding")
    val book = AnnSearch.pqTrain(eq, 8, 8, 256, 1024L, "vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("sub").cast("long"), col("code"))
        .as[(Long, Long, Long)].collect().toSet
    val exprCodes = rows(AnnSearch.pqEncode(eq, book, 8, 8, "vec_id"))
    val relCodes = rows(AnnSearch.pqEncodeRelational(eq, book, 8, 8, "vec_id"))
    book.unpersist()
    assert(exprCodes.size == e.count() * 8, "m codes per vector")
    assert(exprCodes == relCodes, "expression encode must equal relational encode")
  }

  test("incremental IVF append merges to exactly the one-pass assignment") {
    // The maintenance contract behind sim_ann_ivf_incremental: assigning
    // the base, then the appended batch, against the FROZEN base-trained
    // centroids and merging must equal assigning the whole corpus in one
    // pass over the same index — the append path loses nothing and moves
    // no existing vector.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val baseN = e.count() * 9 / 10
    val nC = AnnSearch.autoCentroids(baseN)
    val nG = AnnSearch.autoCoarse(nC)
    val tn = AnnSearch.autoTrainN(baseN, nC)
    val inc = AnnSearch.ivfAppendLists(e, baseN, nC, nG, tn).collect().toSeq
    val eq = e.select($"vec_id",
      expr("transform(embedding, x -> round(cast(x as double) * 10000))").as("__q"))
    val cent = AnnSearch.trainCentroids(eq.filter($"vec_id" < baseN), nC, tn, "vec_id")
    val (coarse, f2g) = AnnSearch.coarseFine(cent, nG)
    val onePass = AnnSearch.assignTwoLevel(eq, coarse, f2g, "vec_id")
      .groupBy($"cid")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when($"vec_id" >= baseN, 1L).otherwise(0L)).as("n_new"))
      .orderBy($"cid").collect().toSeq
    assert(inc == onePass)
    assert(inc.map(_.getAs[Long]("n_new")).sum == e.count() - baseN)
  }

  test("multimodal plumbing: schema, feature extraction, frame sampling") {
    val media = Media.synthesize(spark, 30)
    assert(media.toDF().schema.map(f => (f.name, f.dataType)) ==
      Media.mediaSchema.map(f => (f.name, f.dataType)))
    val feats = Media.extractFeatures(media, dim = 8)
    val rows = feats.collect()
    assert(rows.length == 30 && rows.forall(_.features.length == 8))
    // deterministic: same bytes -> same features
    val again = Media.extractFeatures(Media.synthesize(spark, 30), dim = 8).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    val frames = Media.sampleFrames(media, frameBytes = 16, everyNth = 2)
    assert(frames.count() > 0)
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    val thumbs = Media.resizeStub(media, 4, 3).collect()
    assert(thumbs.length == 30)
    assert(thumbs.forall(_.getAs[scala.collection.Seq[Int]]("thumb").length == 12))
    assert(thumbs.forall(r => r.getAs[Int]("out_w") == 4 && r.getAs[Int]("out_h") == 3))
  }
}
