package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo functions for the flight domain (airports carry lon/lat — see
  * sources.Sources.airportsSchema and the FlightPipeline enrichment).
  *
  * All composed from codegen'd built-ins (no UDF). Float trig is not
  * bit-reproducible across engines, so these are SPEC-covered
  * capabilities (GeoSpec: known city-pair distances within 0.5%), not
  * oracle queries — the same rows-only rule as every float-valued score
  * before integer quantization.
  */
object Geo {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * degrees in, haversine formula. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Initial great-circle bearing in degrees [0, 360). */
  def bearingDeg(lat1: Column, lon1: Column,
                 lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dLon)
    (degrees(atan2(y, x)) + 360) % 360
  }

  /** Integer lat/lon cell id at `cellDeg` granularity — the 2-D analogue
    * of RangeJoinRewrite's cells: a proximity join blocks on the cell (and
    * its 8 neighbors on one side) and reranks with exact haversine, never
    * going quadratic. Composable with MortonInterleave for a 1-D sort key. */
  def geoCell(lat: Column, lon: Column, cellDeg: Double): Column = {
    val latC = floor((lat + 90.0) / cellDeg).cast("long")
    val lonC = floor((lon + 180.0) / cellDeg).cast("long")
    // Row stride exceeds the max lon cell index (360/cellDeg), so cell
    // ids never collide across latitude rows regardless of cellDeg —
    // callers doing ±1 neighbor-id arithmetic stay correct at any
    // granularity (the old fixed 100000 stride collided below ~0.0036°).
    val stride = math.ceil(360.0 / cellDeg).toLong + 1L
    latC * stride + lonC
  }
}
