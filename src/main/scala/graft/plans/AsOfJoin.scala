package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * the same key whose time is <= the left row's time.
  *
  * Spark has no native as-of join; preference order from the build rules
  * is (a) compose existing ops — which suffices here with the
  * union-and-carry-forward idiom:
  *
  *  1. tag both sides and UNION them (no pairwise join at all);
  *  2. one window sort per key over the merged timeline;
  *  3. `last(right_payload, ignoreNulls)` carries the latest right row
  *     forward onto each left row.
  *
  * Cost: ONE shuffle on the key + an in-partition sort — O(N log N/p)
  * per partition, versus the naive range-join's O(N·M) per key. This is
  * the plan that survives 100 TB: no row-multiplication, skew bounded by
  * the hottest key's event count, and AQE can split straggler partitions.
  * (A custom SparkPlan would only re-implement what this composition
  * already gets from sort + window codegen.)
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side whose latest-at-time row is attached
    * @param leftKey   join key column name on `left`
    * @param rightKey  join key column name on `right`
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightPayload columns of `right` to carry (must not collide
    *                     with left column names)
    * @param rightTiebreak payload columns ordering right rows that share
    *                      (key, time): the LAST under this order wins.
    *                      This subsumes a latest-wins pre-dedup of the
    *                      right side — the dedup's whole shuffle+aggregate
    *                      disappears into the window sort the as-of
    *                      already pays for.
    */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: Seq[String] = Nil): DataFrame = {

    val lCols = left.columns.toSeq
    // merged timeline: left rows get null payload, right rows get null
    // left columns; `side` orders right (0) before left (1) at equal
    // times so a same-timestamp right row IS visible to the left row.
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        lCols.map(col) ++ rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)

    // Tiebreak columns are null on left rows, but left rows sort after
    // every right row at the same time anyway (side 1 > 0), so the
    // tiebreak only ever orders right rows against each other.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t") +: col("__side") +: rightTiebreak.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .select(Seq(col("__side")) ++ lCols.map(col) ++
        rightPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("__side") === 1) // keep probe rows only
      .drop("__side")
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * with the same key whose time is >= the left row's time (the "next
    * observation" direction — e.g. first event after an order ships).
    *
    * Mirror image of [[asof]]: same union-merged timeline, same single
    * shuffle, but left rows sort BEFORE right rows at equal times (so an
    * equal-time right row is visible forward) and `first(payload,
    * ignoreNulls)` over [current, unbounded following] carries the next
    * right row backward onto each left row. The FIRST right row under
    * `rightTiebreak` order wins among equal (key, time).
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: Seq[String] = Nil): DataFrame = {

    val lCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        lCols.map(col) ++ rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t") +: col("__side") +: rightTiebreak.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    lTagged.unionByName(rTagged)
      .select(Seq(col("__side")) ++ lCols.map(col) ++
        rightPayload.map(c => first(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("__side") === 0) // keep probe rows only
      .drop("__side")
  }
}
