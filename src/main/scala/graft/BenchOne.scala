package graft

import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time named registry queries (cold + N warm reps) on
  * SPARK_GRAFT_SF_DIR through the same noop sink as [[Bench]].
  *
  *   sbt "runMain graft.BenchOne dedup_ngram_jaccard asof_join"
  *
  * Prints per-query cold and min-warm seconds — min over reps is the
  * stable signal for plan-shape comparisons (GC/JIT noise collapses).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    // no args → sweep the ENTIRE registry (the round-5 outlier hunt);
    // pipe through `sort -k3` on the warm_min column to rank
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.registry.map(_.name)
    names.foreach { name =>
      val q = byName.getOrElse(name, sys.error(s"unknown query: $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warms = (1 to reps).map(_ => once())
      println(f"[benchone] $name%-28s cold=$cold%6.3f warm_min=${warms.min}%6.3f warm=${warms.map(w => f"$w%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
