package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators: refreshing derived tables from a
  * delta WITHOUT rescanning history. The reference pipeline's answer to
  * "the topic grew" is to re-read the whole topic and rebuild the snapshot
  * (`HadoopKafkaConsumer.java:55-101`); `ingest_incremental_merge` already
  * shows the latest-wins (argmax-mergeable) version of doing better. This
  * module adds the OTHER mergeable-state class: commutative-monoid
  * aggregates (count/sum, and anything derivable from them, like avg),
  * where a stored partial-aggregate table absorbs a delta with one small
  * merge instead of a full-history rescan.
  *
  * At 100 TB this is the difference between a nightly job that scans the
  * delta (GBs) and one that scans the corpus (TBs): the merge input is
  * |groups| + |delta|, both orders of magnitude below |history|, and the
  * merge itself is the same partial/final hash aggregate Spark already
  * uses inside every groupBy — re-expressed across job boundaries.
  */
object IncrOps {

  /** Partial-aggregate state per month: additive (count, cents) pairs.
    * Money is carried as integer CENTS so the merged result is bit-exact
    * regardless of summation order or engine.
    */
  def monthlyPartials(df: DataFrame): DataFrame =
    df.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

  /** Merge stored partials with delta partials: union + re-aggregate.
    * Union-then-agg rather than a full-outer join: it is one hash
    * aggregate, handles keys present on either side for free, and is the
    * exact combine step a partial/final aggregation performs inside one
    * query — here made durable across jobs.
    */
  def mergePartials(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy("month")
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("cents")).as("cents"))

  val all: Seq[GQuery] = Seq(

    GQuery(
      "agg_incremental_refresh",
      (s, dir) => {
        // INCREMENTAL AGGREGATE REFRESH: the maintained table is monthly
        // (n_orders, revenue) over orders. History is cut at 1997-01-01:
        // everything before is the "stored" partial-aggregate state (in
        // production: yesterday's refresh output, read back from its
        // table — aggregated here because the fixture has no yesterday),
        // everything at/after is the delta. The refreshed output merges
        // the two partial sets and must equal a full-history recompute —
        // which is exactly what the oracle computes, so the hash match
        // IS the refresh-correctness proof. Cut months (a month with
        // rows on both sides) exercise the actual merge, not just
        // concatenation.
        val orders = Tables.t(s, dir, "orders")
        val cut = lit("1997-01-01").cast("timestamp")
        val base = monthlyPartials(orders.where(col("o_orderdate") < cut))
        val delta = monthlyPartials(orders.where(col("o_orderdate") >= cut))
        mergePartials(base, delta)
          .select(
            date_format(col("month"), "yyyy-MM").as("month"),
            col("n_orders"),
            col("cents").as("revenue_cents"),
            // derived metric from the partials: average order value in
            // whole cents (floor division keeps both engines in int64)
            expr("cents div n_orders").as("avg_cents"))
          .orderBy("month")
      },
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             |       CAST(COUNT(*) AS BIGINT) AS n_orders,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_cents
             |FROM orders
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
