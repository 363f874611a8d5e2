package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout writers — the table-design half of the 100 TB story
  * (SURVEY.md build rule "repartition/bucketing for co-located joins").
  *
  * Bucketing pre-shuffles a table ONCE at write time: both sides of a
  * recurring equi-join written with the same bucket count and key join
  * with ZERO exchanges forever after (LayoutSpec asserts the plan). At
  * 100 TB this converts every fact-to-fact join from a full-network
  * shuffle into a per-bucket local merge; the write-side cost is paid
  * once and amortized over every downstream query.
  *
  * Partitioned writes give coarse-grained pruning instead: a filter on
  * the partition column skips whole directories at file-listing time
  * (PartitionFilters in the scan, zero I/O for skipped values) — right
  * for low-cardinality columns like date/type; bucketing is right for
  * high-cardinality join keys.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed parquet table. Bucket count
    * should match the downstream join fan-in (and the other table's).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Write `df` partitioned by directory on `partCols` (Hive layout). */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Cluster rows inside each output file on `sortCols` (without a global
    * sort): parquet row-group min/max stats then prune on those columns
    * at read time even when the value isn't a directory partition.
    */
  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String],
      files: Int = 8): Unit =
    df.repartition(files)
      .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
