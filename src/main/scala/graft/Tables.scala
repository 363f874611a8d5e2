package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet. One quirk: `events.ts` has shipped in
  * TWO encodings across testdata generations — parquet INT64
  * TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as a
  * raw long via `spark.sql.legacy.parquet.nanosAsLong`) and plain
  * `timestamp[us]` (read as TIMESTAMP_NTZ). [[normalizeEvents]] branches
  * on the type the reader actually resolved and exposes the SAME
  * canonical shape either way: `ts` as TIMESTAMP_NTZ truncated to
  * microseconds (matching DuckDB's `ts::TIMESTAMP`, so oracle comparison
  * is exact) plus `ts_ns: Long` (nanos since epoch). Hard-coding either
  * encoding is how round 6/7 lost the entire events surface — always
  * branch on the footer schema, never assume.
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
  def invalidate(): Unit = cache.synchronized {
    cache.clear()
    // Re-arm the per-(dir,table) encoding log too: after a testdata
    // regeneration at the SAME path, the resolved-encoding line is the
    // diagnostic that matters most — it must print again.
    logged.clear()
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Harmless when ts is already timestamp-typed; required to read the
      // INT64 TIMESTAMP(NANOS) generation of the testdata at all.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = normalizeEvents(spark.read.parquet(s"$dir/events.parquet"))
      logged.computeIfAbsent((dir, name), _ => {
        System.err.println(s"[tables] events ts resolved as " +
          s"${df.schema("ts").dataType.simpleString}/ts_ns=" +
          s"${df.schema("ts_ns").dataType.simpleString} from $dir")
        java.lang.Boolean.TRUE
      })
      df
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  private val logged =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Boolean]()

  /** Normalize EITHER events encoding to the canonical shape: `ts`
    * TIMESTAMP_NTZ (micros precision) in its original column position,
    * `ts_ns: Long` (nanos since epoch) appended. Session TZ is pinned
    * UTC by Verify/Bench/specs, so the NTZ↔timestamp casts are lossless.
    * The micros branch derives `ts_ns = unix_micros * 1000` — every
    * direct `ts_ns` consumer uses `ts_ns div 1000` (micros), which both
    * branches preserve bit-for-bit.
    */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)"))
      case _ => // TIMESTAMP or TIMESTAMP_NTZ, micros-encoded
        raw.withColumn("ts", expr("cast(ts as timestamp_ntz)"))
          .withColumn("ts_ns", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }

  /** Register every table as a temp view so spark.sql queries (grouping
    * sets, SQL-surface parity) can run against the same data.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
