package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** RESULT CACHE keyed by the canonicalized logical plan — the
  * dashboard-tier feature: the same query (up to cosmetic differences —
  * aliases, exprIds, column order of independent subtrees) re-run
  * against unchanged data is answered from its materialized result
  * instead of re-executing. Correctness contract: entries are valid
  * until [[invalidate]] — the caller invalidates when underlying data
  * changes, exactly the `Tables.invalidate` contract the rest of the
  * engine already follows for its plan cache.
  *
  * The key hashes the OPTIMIZED canonicalized plan plus the result
  * schema: canonicalization normalizes exprIds/names, so two
  * independently-built but semantically identical frames hit one
  * entry; the optimized form also absorbs rewrites (a query served
  * from a materialized view caches under its rewritten plan). Entries
  * are parquet directories; `_SUCCESS` is the commit marker (a torn
  * write is re-materialized, never read — the GenFold convention).
  *
  * Scale stance: a cache hit costs a parquet read of the RESULT (for
  * dashboard aggregates, KBs); a miss adds one write of the result the
  * query was computing anyway. Nothing driver-side beyond path checks.
  */
object ResultCache {

  /** Stable cache key for a frame: md5 of the canonicalized optimized
    * plan string + catalog schema (canonical plan hashing is exactly
    * how Spark's own exchange/subquery reuse identifies equal subtrees).
    */
  def keyOf(df: DataFrame): String = {
    val canon = df.queryExecution.optimizedPlan.canonicalized.toString +
      "\n" + df.schema.catalogString
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def entryPath(cacheDir: String, df: DataFrame): String =
    s"$cacheDir/q_${keyOf(df)}"

  /** Serve `df` through the cache at `cacheDir`: read the committed
    * entry if present, else execute, materialize, and read back.
    * Returns (result, hit).
    */
  def through(df: DataFrame, cacheDir: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val path = entryPath(cacheDir, df)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val committed = fs.exists(new Path(path, "_SUCCESS"))
    if (!committed) df.write.mode("overwrite").parquet(path)
    // read under the frame's schema: parquet round-trips it, and pinning
    // the schema keeps nullability identical to the uncached result
    (spark.read.schema(df.schema).parquet(path), committed)
  }

  /** Drop every entry under `cacheDir`. */
  def invalidate(cacheDir: String): Unit = {
    val fs = KafkaLog.fs(cacheDir)
    fs.delete(new Path(cacheDir), true)
  }

  private def KafkaLog = graft.sources.kafkalog.KafkaLog
}
