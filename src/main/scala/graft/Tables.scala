package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet. One quirk: `events.ts` is written as
  * parquet INT64 TIMESTAMP(NANOS) which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]); we read it as a long (nanos since epoch) via
  * `spark.sql.legacy.parquet.nanosAsLong` and expose both the raw `ts_ns`
  * and a truncated-to-micros TIMESTAMP_NTZ `ts` (matching what DuckDB's
  * `ts::TIMESTAMP` cast produces, so oracle comparison is exact).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session relation cache: `spark.read.parquet` pays file listing
    * + footer/schema decode on every call, and the registry re-loads the
    * same ten tables for every query — hundreds of redundant listings
    * per Verify/Bench run. DataFrames are immutable, so handing back the
    * same instance is safe (Spark's DeduplicateRelations re-IDs
    * attributes on self-joins; the whole suite passes against the cache
    * at both test scale factors). Keyed by session identity so test
    * sessions with different confs never share plans.
    */
  private val cache =
    new java.util.IdentityHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  /** Load one table. For `events`, adds `ts_ns: Long` and rewrites `ts`
    * as TIMESTAMP_NTZ truncated to microseconds.
    *
    * Eviction is EXPLICIT, not GC-driven: a cached DataFrame strongly
    * references its SparkSession (Dataset → QueryExecution → session),
    * so weak keying could never collect an entry (a WeakHashMap whose
    * value references its key pins it forever). Instead each access
    * drops every session whose SparkContext has stopped — the test
    * suites stop their context per suite, so stale sessions and their
    * plans become collectable at the next table load. Call
    * [[invalidate]] after rewriting the underlying parquet — cached
    * plans hold the file listing from load time.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val per = cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        cache.put(spark, m)
      }
      m
    }
    per.computeIfAbsent((dir, name), _ => load(spark, dir, name))
  }

  /** Drop every cached relation (all sessions) — required after the
    * underlying parquet files are rewritten, or the cached plans serve
    * stale file listings.
    */
  def invalidate(): Unit = cache.synchronized(cache.clear())

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", expr("cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a temp view so spark.sql queries (grouping
    * sets, SQL-surface parity) can run against the same data.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
