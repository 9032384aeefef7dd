package graft

import graft.functions.Geo
import org.scalatest.funsuite.AnyFunSuite

/** Geo capability: haversine / bearing / cell-blocking over airport-style
  * lon/lat, checked against surveyed great-circle distances. */
class GeoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // (name, lat, lon) — and surveyed great-circle km between pairs
  private val pts = Seq(
    ("JFK", 40.6413, -73.7781), ("LHR", 51.4700, -0.4543),
    ("LAX", 33.9416, -118.4085), ("SYD", -33.9399, 151.1753))

  test("haversine matches surveyed distances within 0.5%") {
    val df = pts.toDF("code", "lat", "lon")
    val a = df.select($"code".as("a"), $"lat".as("lat1"), $"lon".as("lon1"))
    val b = df.select($"code".as("b"), $"lat".as("lat2"), $"lon".as("lon2"))
    val d = a.crossJoin(b).filter($"a" < $"b")
      .select($"a", $"b",
        Geo.haversineKm($"lat1", $"lon1", $"lat2", $"lon2").as("km"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val surveyed = Map(
      ("JFK", "LHR") -> 5540.0, ("JFK", "LAX") -> 3980.0,
      ("LAX", "SYD") -> 12050.0, ("LHR", "SYD") -> 17020.0)
    surveyed.foreach { case (k, exp) =>
      val got = d(k)
      assert(math.abs(got - exp) / exp < 0.005, s"$k: got $got expected ~$exp")
    }
  }

  test("bearing is directionally sane and in [0, 360)") {
    val df = Seq((40.6413, -73.7781, 51.47, -0.4543)).toDF("a", "b", "c", "d")
    val brg = df.select(Geo.bearingDeg($"a", $"b", $"c", $"d"))
      .head().getDouble(0)
    // JFK → LHR initial bearing ≈ 51° (NE)
    assert(brg > 40 && brg < 60, s"JFK->LHR bearing $brg")
  }

  test("geoCell blocks nearby points together and far apart ones apart") {
    val df = pts.toDF("code", "lat", "lon")
      .select($"code", Geo.geoCell($"lat", $"lon", 5.0).as("cell"))
    val cells = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cells("JFK") != cells("SYD"))
    // a point 0.3° from JFK lands in the same 5° cell
    val near = Seq(("NEAR", 40.9, -73.5)).toDF("code", "lat", "lon")
      .select(Geo.geoCell($"lat", $"lon", 5.0)).head().getLong(0)
    assert(near == cells("JFK"))
  }
}
