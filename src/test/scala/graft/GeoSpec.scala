package graft

import graft.operators.GeoOps
import org.apache.spark.sql.functions._

/** Geospatial surface: haversine against known real-world distances,
  * and completeness/uniqueness of the grid-bucketed proximity join
  * versus the all-pairs truth.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("haversine matches known city distances within 0.5%") {
    // (from, to, lat1, lon1, lat2, lon2, expected km)
    val cases = Seq(
      ("paris", "london", 48.8566, 2.3522, 51.5074, -0.1278, 343.5),
      ("nyc", "la", 40.7128, -74.0060, 34.0522, -118.2437, 3935.7),
      ("sydney", "tokyo", -33.8688, 151.2093, 35.6762, 139.6503, 7823.0))
    val got = cases.toDF("a", "b", "lat1", "lon1", "lat2", "lon2", "exp")
      .select(col("a"), col("exp"),
        GeoOps.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("km"))
      .as[(String, Double, Double)].collect()
    got.foreach { case (name, exp, km) =>
      assert(math.abs(km - exp) / exp < 0.005, s"$name: got $km expected ~$exp")
    }
  }

  test("grid proximity join equals the all-pairs truth (complete and duplicate-free)") {
    val out = SparkEntry.queries("geo_grid_proximity_pairs")(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(out.length == out.distinct.length, "duplicate pairs emitted")
    // brute-force truth over the same derived points
    val pts = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        (((col("doc_id") * 37) % 18000).cast("double") / 100.0 - 90.0).as("lat"),
        (((col("doc_id") * 73) % 36000).cast("double") / 100.0 - 180.0).as("lon"))
      .as[(Long, Double, Double)].collect()
    val truth = (for {
      i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      d2 = math.pow(pts(i)._2 - pts(j)._2, 2) + math.pow(pts(i)._3 - pts(j)._3, 2)
      if math.floor(d2 * 10000) <= 160000
    } yield (pts(i)._1, pts(j)._1)).toSet
    assert(out.toSet == truth,
      s"grid join missed ${(truth -- out.toSet).size} pairs, " +
        s"invented ${(out.toSet -- truth).size}")
  }

  test("nearest-site assignment is the true argmin for a sample of users") {
    val assigned = SparkEntry.queries("geo_nearest_site")(spark, sf)
      .select("user_id", "dist_e2").as[(Long, Long)].collect().toMap
    val sites = Tables.t(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"),
        (((col("n_nationkey") * 53) % 18000).cast("double") / 100.0 - 90.0),
        (((col("n_nationkey") * 97) % 36000).cast("double") / 100.0 - 180.0))
      .as[(Long, Double, Double)].collect()
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val (rl1, rl2) = (math.toRadians(lat1), math.toRadians(lat2))
      val a = math.pow(math.sin(math.toRadians(lat2 - lat1) / 2), 2) +
        math.cos(rl1) * math.cos(rl2) *
          math.pow(math.sin(math.toRadians(lon2 - lon1) / 2), 2)
      2 * GeoOps.EarthRadiusKm * math.asin(math.sqrt(a))
    }
    assigned.take(10).foreach { case (uid, distE2) =>
      val lat = ((uid * 37) % 18000).toDouble / 100.0 - 90.0
      val lon = ((uid * 73) % 36000).toDouble / 100.0 - 180.0
      val best = sites.map(s => math.floor(hav(lat, lon, s._2, s._3) * 100).toLong).min
      assert(distE2 == best, s"user $uid: assigned $distE2, true min $best")
    }
  }
}
