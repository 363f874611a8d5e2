package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial operators — the location-aware curation/analytics slice:
  * nearest-site assignment against a broadcast reference set, and a
  * radius proximity self-join via GRID BUCKETING (the spatial analog of
  * LSH banding: candidates only from a point's 3×3 cell neighborhood,
  * never the N² pair space).
  *
  * The fixture derives deterministic coordinates from integer ids
  * (events has no native lat/lon), so every value is a 0.01-degree-
  * granular double both engines construct identically — all downstream
  * arithmetic is then the same IEEE op chain and hash-compares exactly.
  *
  * Scale stance: nearest-site is one scan with a |sites|-row broadcast
  * (argmin via a single min(struct) aggregate — no window over the
  * corpus); the proximity join shuffles each point 9× (its probe
  * cells), joins on the cell key, and verifies exactly — candidates
  * are bounded by local density, never by corpus size. Radius ≤ cell
  * size makes the 3×3 probe COMPLETE (any pair within r falls in
  * adjacent cells). The haversine spherical distance is exposed for
  * real-world use and unit-tested against known city distances; the
  * oracle-checked queries rank on floor-scaled values with id
  * tiebreaks, the convention every transcendental query here follows.
  */
object GeoOps {

  /** Earth mean radius (km) for [[haversineKm]]. */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two (lat, lon) degree pairs. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Deterministic per-user coordinates: 0.01-degree grid snapped, so
    * both engines build bit-identical doubles from integer ids.
    */
  private def userPoints(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .select(col("user_id")).distinct()
      .select(col("user_id"),
        (((col("user_id") * 37) % 18000).cast("double") / 100.0 - 90.0).as("lat"),
        (((col("user_id") * 73) % 36000).cast("double") / 100.0 - 180.0).as("lon"))

  /** Reference sites from the nation table (25 rows — a broadcast dim). */
  private def sites(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("site_id"), col("n_name").as("site"),
        (((col("n_nationkey") * 53) % 18000).cast("double") / 100.0 - 90.0).as("slat"),
        (((col("n_nationkey") * 97) % 36000).cast("double") / 100.0 - 180.0).as("slon"))

  val all: Seq[GQuery] = Seq(

    GQuery(
      "geo_nearest_site",
      (s, dir) => {
        // NEAREST-SITE ASSIGNMENT: each user snaps to the closest of 25
        // broadcast reference sites by haversine distance. The argmin is
        // ONE aggregate — min(struct(dist_e2, site_id, site)) — so the
        // corpus never enters a window; ties break by site_id inside the
        // struct ordering. dist_e2 floors at hectometer resolution: the
        // transcendental chain (radians/sin/cos/asin/sqrt) is identical
        // in both engines and the floor absorbs last-ulp libm noise (the
        // BM25-ln convention).
        val pts = userPoints(s, dir)
        pts.join(broadcast(sites(s, dir)))
          .select(col("user_id"),
            struct(
              floor(haversineKm(col("lat"), col("lon"), col("slat"), col("slon")) * 100)
                .cast("long").as("dist_e2"),
              col("site_id"), col("site")).as("cand"))
          .groupBy("user_id")
          .agg(min(col("cand")).as("c"))
          .select(col("user_id"), col("c.site").as("site"),
            col("c.dist_e2").as("dist_e2"))
          .orderBy("user_id")
      },
      Some("""WITH pts AS (SELECT DISTINCT user_id,
             |                    ((user_id * 37) % 18000)::DOUBLE / 100.0 - 90.0 AS lat,
             |                    ((user_id * 73) % 36000)::DOUBLE / 100.0 - 180.0 AS lon
             |             FROM events),
             |     sites AS (SELECT n_nationkey::BIGINT AS site_id, n_name AS site,
             |                      ((n_nationkey * 53) % 18000)::DOUBLE / 100.0 - 90.0 AS slat,
             |                      ((n_nationkey * 97) % 36000)::DOUBLE / 100.0 - 180.0 AS slon
             |               FROM nation),
             |     cand AS (SELECT user_id, site_id, site,
             |                     floor(2 * 6371.0088 * asin(sqrt(
             |                       pow(sin(radians(slat - lat) / 2), 2) +
             |                       cos(radians(lat)) * cos(radians(slat)) *
             |                       pow(sin(radians(slon - lon) / 2), 2))) * 100)::BIGINT AS dist_e2
             |              FROM pts, sites),
             |     ranked AS (SELECT user_id, site, dist_e2,
             |                       row_number() OVER (PARTITION BY user_id
             |                         ORDER BY dist_e2, site_id) AS rn
             |                FROM cand)
             |SELECT user_id, site, dist_e2 FROM ranked WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),

    GQuery(
      "geo_grid_proximity_pairs",
      (s, dir) => {
        // RADIUS SELF-JOIN VIA GRID BUCKETING: document pairs within
        // 4.0 degrees (euclidean on the degree plane — exact arithmetic
        // end to end). Each point probes its 3×3 cell neighborhood
        // (cell size = radius, so the probe is COMPLETE); the equi-join
        // on cell keys generates candidates bounded by local density,
        // and each unordered pair materializes exactly once (the probe
        // of the smaller id meets the home cell of the larger — the
        // reverse direction fails the id inequality). No N² anywhere;
        // the exact distance check is the verify stage, LSH-style.
        val g = 4.0
        val cells = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            (((col("doc_id") * 37) % 18000).cast("double") / 100.0 - 90.0).as("lat"),
            (((col("doc_id") * 73) % 36000).cast("double") / 100.0 - 180.0).as("lon"))
          .withColumn("cx", floor(col("lon") / g).cast("long"))
          .withColumn("cy", floor(col("lat") / g).cast("long"))
        val probes = cells
          .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
          .select(col("doc_id"), col("lat"), col("lon"),
            (col("cx") + col("dx")).as("px"), (col("cy") + col("dy")).as("py"))
        val d2 = pow(col("a.lat") - col("b.lat"), 2) + pow(col("a.lon") - col("b.lon"), 2)
        probes.as("a").join(cells.as("b"),
            col("a.px") === col("b.cx") && col("a.py") === col("b.cy") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            floor(d2 * 10000).cast("long").as("d2_e4"))
          .where(col("d2_e4") <= (g * g * 10000).toLong)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH pts AS (SELECT doc_id,
             |                    ((doc_id * 37) % 18000)::DOUBLE / 100.0 - 90.0 AS lat,
             |                    ((doc_id * 73) % 36000)::DOUBLE / 100.0 - 180.0 AS lon
             |             FROM documents),
             |     cells AS (SELECT doc_id, lat, lon,
             |                      floor(lon / 4.0)::BIGINT AS cx,
             |                      floor(lat / 4.0)::BIGINT AS cy
             |               FROM pts),
             |     probes AS (SELECT doc_id, lat, lon, cx + dx AS px, cy + dy AS py
             |                FROM cells, unnest([-1, 0, 1]) AS t1(dx),
             |                     unnest([-1, 0, 1]) AS t2(dy)),
             |     pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |                      floor((pow(a.lat - b.lat, 2) + pow(a.lon - b.lon, 2)) * 10000)::BIGINT AS d2_e4
             |               FROM probes a JOIN cells b
             |                 ON a.px = b.cx AND a.py = b.cy AND a.doc_id < b.doc_id)
             |SELECT doc_a, doc_b, d2_e4 FROM pairs
             |WHERE d2_e4 <= 160000
             |ORDER BY doc_a, doc_b""".stripMargin)))
}
