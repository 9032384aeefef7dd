package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: no query key may be declared twice ANYWHERE — a
  * duplicate inside one Map literal silently self-shadows (last entry
  * wins) before SparkEntry's cross-registry merge check can see it, which
  * is exactly how round 12 briefly lost the graded etl_sql_time_travel
  * row. The only reliable detector is the source text itself. */
class RegistrySpec extends AnyFunSuite {

  private val keyRe = """"([a-z0-9_]+)" -> \(\(s, d\)""".r

  private def sourceKeys(): Seq[String] = {
    val root = Paths.get("src/main/scala")
    assume(Files.isDirectory(root), s"run from the repo root (cwd=${
      Paths.get("").toAbsolutePath})")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap(p => keyRe.findAllMatchIn(
        new String(Files.readAllBytes(p))).map(_.group(1)))
      .toSeq
  }

  test("no query key is declared twice in the source") {
    val keys = sourceKeys()
    val dup = keys.groupBy(identity).collect {
      case (k, v) if v.size > 1 => s"$k (${v.size}x)" }
    assert(dup.isEmpty, s"shadowed query keys: ${dup.mkString(", ")}")
    // and the merged registry holds exactly the declared set
    assert(SparkEntry.queries.size == keys.size,
      s"registry size ${SparkEntry.queries.size} != declared ${keys.size}")
  }

  test("every oracle key has a query; every query key has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).mkString(", ")}")
    // the driver records a weaker rows-only check for oracle-less queries;
    // this project's policy is every row graded — keep the sets equal
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).mkString(", ")}")
  }
}
