package graft

import org.scalatest.funsuite.AnyFunSuite

/** The KMV (bottom-k) set-algebra estimator behind
  * `sketch_bottomk_intersect`, property-tested on random sets — the
  * cross-engine exactness is driver-graded; what's gated here is the
  * MATH the query's comments claim:
  *
  *  1. merge correctness: min-k of (min-k(A) ∪ min-k(B)) = min-k(A ∪ B)
  *     — the associativity that makes per-segment sketches composable;
  *  2. membership exactness: every union-sketch element that belongs to
  *     A is in A's sketch (h_k(U) ≤ h_k(A)), so ρ is exact — the
  *     intersection estimator is unbiased given the union estimate;
  *  3. the union estimate lands within the ~1/√k concentration range on
  *     uniform hashes (generous 6/√k gate so the test is not flaky by
  *     construction: fixed seeds, deterministic).
  */
class KmvSpec extends AnyFunSuite {
  private val K = 16
  private val DOMAIN = 1L << 56

  /** 56-bit md5-derived hash, same family as the query. */
  private def h(x: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(x.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(7).map("%02x".format(_)).mkString, 16)
  }

  private def sketch(s: Set[Long]): Vector[Long] =
    s.map(h).toVector.sorted.take(K)

  private def estUnion(u: Vector[Long]): Long =
    if (u.length < K || u.last <= 0) u.length
    else (K - 1) * (DOMAIN / u.last)

  test("min-k merge of sketches equals min-k of the union (all seeds)") {
    for (seed <- Seq(1, 7, 42, 20260813)) {
      val rnd = new scala.util.Random(seed)
      val a = Set.fill(800)(rnd.nextLong().abs % 1000000L)
      val b = Set.fill(600)(rnd.nextLong().abs % 1000000L)
      val merged = (sketch(a) ++ sketch(b)).distinct.sorted.take(K)
      assert(merged == sketch(a ++ b), s"seed $seed: KMV merge broke")
    }
  }

  test("union-sketch membership in each input sketch is exact") {
    for (seed <- Seq(3, 11, 99, 31415)) {
      val rnd = new scala.util.Random(seed)
      val a = Set.fill(700)(rnd.nextLong().abs % 500000L)
      val b = Set.fill(700)(rnd.nextLong().abs % 500000L)
      val aHashes = a.map(h)
      val bHashes = b.map(h)
      val skA = sketch(a).toSet
      val skB = sketch(b).toSet
      sketch(a ++ b).foreach { x =>
        assert(aHashes.contains(x) == skA.contains(x),
          s"seed $seed: union-sketch element $x A-membership not decidable from A's sketch")
        assert(bHashes.contains(x) == skB.contains(x),
          s"seed $seed: same for B")
      }
    }
  }

  test("union and intersection estimates concentrate on random sets") {
    for (seed <- Seq(5, 17, 123, 271828)) {
      val rnd = new scala.util.Random(seed)
      // overlap by construction: shared core + disjoint tails
      val core = Set.fill(400)(rnd.nextLong().abs)
      val a = core ++ Set.fill(300)(rnd.nextLong().abs)
      val b = core ++ Set.fill(300)(rnd.nextLong().abs)
      val u = sketch(a ++ b)
      val skA = sketch(a).toSet
      val skB = sketch(b).toSet
      val est = estUnion(u)
      val rho = u.count(x => skA.contains(x) && skB.contains(x)).toLong
      val estInt = rho * est / K
      val nU = (a ++ b).size
      val nI = a.intersect(b).size
      val tol = 6.0 / math.sqrt(K) // ~1.5 — generous, deterministic gate
      assert(math.abs(est - nU) <= tol * nU, s"seed $seed: est_union $est vs $nU")
      assert(math.abs(estInt - nI) <= tol * nU,
        s"seed $seed: est_intersect $estInt vs $nI (tol over union size)")
    }
  }
}
