package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial filters — the geo:search service analog.
  *
  * The reference packs lat/lon(/time) into z-order-encoded literals and range-scans them
  * with a BigMin advancer (`rdf/…/service/geospatial/GeoSpatial.java:83-85`,
  * `ZOrderIndexBigMinAdvancer.java`, `GeoSpatialServiceFactory.java`). Columnar storage
  * replaces the index trick: lat/lon live in shadow DOUBLE columns, rectangle search is
  * two range predicates (parquet min/max pruning), circle search is a bounding-box
  * prefilter + exact haversine. The z-order cell id is still useful as a *partition/
  * clustering key* at 100 TB — `zorder()` below interleaves the quantized coordinates
  * for that purpose, replacing B+Tree BigMin scans with partition pruning.
  */
object Geo {

  val EarthRadiusMeters: Double = 6371000.0

  /** Haversine distance in meters between two (lat, lon) pairs in degrees. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** inRectangle: pure range predicates (pushdown-friendly). */
  def inRectangle(lat: Column, lon: Column,
                  latMin: Double, lonMin: Double, latMax: Double, lonMax: Double): Column =
    lat >= latMin && lat <= latMax && lon >= lonMin && lon <= lonMax

  /** inCircle: bounding-box prefilter (sargable) + exact haversine. */
  def inCircle(lat: Column, lon: Column,
               centerLat: Double, centerLon: Double, radiusMeters: Double): Column = {
    val dLat = math.toDegrees(radiusMeters / EarthRadiusMeters)
    val dLon = math.toDegrees(radiusMeters /
      (EarthRadiusMeters * math.max(0.01, math.cos(math.toRadians(centerLat)))))
    inRectangle(lat, lon, centerLat - dLat, centerLon - dLon, centerLat + dLat, centerLon + dLon) &&
      haversineMeters(lat, lon, lit(centerLat), lit(centerLon)) <= radiusMeters
  }

  /** Z-order cell id: interleave `bits`-bit quantizations of lat/lon — clustering /
    * partition-pruning key for geo-heavy tables at scale.
    */
  def zorder(lat: Column, lon: Column, bits: Int = 16): Column = {
    val qLat = ((lat + 90.0) / 180.0 * ((1 << bits) - 1)).cast("long")
    val qLon = ((lon + 180.0) / 360.0 * ((1 << bits) - 1)).cast("long")
    (0 until bits).map { i =>
      val latBit = shiftright(qLat, i).bitwiseAND(1)
      val lonBit = shiftright(qLon, i).bitwiseAND(1)
      shiftleft(latBit, 2 * i + 1).bitwiseOR(shiftleft(lonBit, 2 * i))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Geo view over the events table: deterministic lat/lon derived from event fields
    * (the driver data has no native coordinates; the derivation is reproducible in SQL).
    */
  def eventsGeo(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      // event_id-driven so the grid covers the full globe at every scale factor
      // (user_id's range is sf-dependent and collapses the latitude band)
      ((col("event_id") % 1800) / 10.0 - 90.0).as("lat"),
      (((col("event_id") * 7) % 3600) / 10.0 - 180.0).as("lon"))
}
