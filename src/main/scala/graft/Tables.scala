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

  /** Load one table. For `events`, adds `ts_ns: Long` and rewrites `ts`
    * as TIMESTAMP_NTZ truncated to microseconds.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
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
