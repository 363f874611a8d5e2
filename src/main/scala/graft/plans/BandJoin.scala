package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftinternal.GraftDataset

/** BAND JOIN as a custom whole-operator extension — the full Catalyst
  * extension matrix in one place: a custom LogicalPlan node, a
  * SparkStrategy planning it, and a physical SparkPlan executing it
  * (completing the ladder next to the custom Expressions, the Generator
  * UDTF, and the optimizer Rule elsewhere in this package).
  *
  * Semantics: inner-join each left row to THE interval of a small,
  * DISJOINT interval table containing its point: `lo <= point < hi`.
  * Spark's only built-in plan for that predicate is
  * BroadcastNestedLoopJoin — O(|left| · |bands|) predicate evaluations.
  * This operator sorts the collected band table once and BINARY-SEARCHES
  * each probe row — O(|left| · log |bands|): the difference between a
  * scan surviving 10 bands and 10,000 calendar/price/size buckets at
  * 100 TB. (Databricks ships a dedicated range-join optimization for
  * exactly this reason; this is the open-API form.)
  *
  * Scale design: the band table is collect-and-broadcast (it is a
  * dimension — thousands of rows at most); the probe side streams
  * through mapPartitions unshuffled, and the output projection stays
  * unsafe-row-based. Null or NaN points drop (inner-join semantics).
  */
object BandJoin {

  /** Logical node: carries resolved expressions from both children. */
  case class BandJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      point: Expression, lo: Expression, hi: Expression)
    extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ right.output
    override protected def withNewChildrenInternal(
        l: LogicalPlan, r: LogicalPlan): BandJoinNode = copy(left = l, right = r)
  }

  /** Planner strategy: one custom node → one custom physical operator. */
  object BandJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case BandJoinNode(l, r, point, lo, hi) =>
        BandJoinExec(planLater(l), planLater(r), point, lo, hi) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator: collect + sort the band side, binary-search each
    * probe row. Requires disjoint `[lo, hi)` intervals — the single
    * candidate found by "greatest lo <= point" is then the only possible
    * match, which is what makes the log-time probe correct.
    */
  case class BandJoinExec(
      left: SparkPlan, right: SparkPlan,
      point: Expression, lo: Expression, hi: Expression)
    extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ right.output

    override protected def withNewChildrenInternal(
        l: SparkPlan, r: SparkPlan): BandJoinExec = copy(left = l, right = r)

    private def num(e: Expression, row: InternalRow): Double =
      e.eval(row) match {
        case null => Double.NaN
        case n: java.lang.Number => n.doubleValue()
        case other => other.toString.toDouble
      }

    override protected def doExecute(): RDD[InternalRow] = {
      val loB = BindReferences.bindReference(lo, right.output)
      val hiB = BindReferences.bindReference(hi, right.output)
      // bands with null/NaN bounds can never match a point and would
      // spuriously fail the disjointness require (NaN comparisons are
      // false) — drop them before sorting
      val bands = right.executeCollect()
        .map(r => (num(loB, r), num(hiB, r), r.copy()))
        .filter(b => !b._1.isNaN && !b._2.isNaN)
        .sortBy(_._1)
      require(bands.sliding(2).forall {
        case Array((_, h1, _), (l2, _, _)) => h1 <= l2
        case _ => true
      }, "BandJoin requires disjoint, non-overlapping [lo, hi) intervals")
      val bc = sparkContext.broadcast(bands)
      val pointB = BindReferences.bindReference(point, left.output)
      val attrs = output
      left.execute().mapPartitions { iter =>
        val b = bc.value
        val los = b.map(_._1)
        val joiner = new JoinedRow
        val proj = UnsafeProjection.create(attrs, attrs)
        iter.flatMap { lrow =>
          // mirror `num`: DecimalType evaluates to Spark's Decimal, which
          // is NOT a java.lang.Number — go through toString for those
          val p = pointB.eval(lrow) match {
            case null => Double.NaN
            case n: java.lang.Number => n.doubleValue()
            case other => other.toString.toDouble
          }
          if (p.isNaN) Iterator.empty
          else {
            // greatest band with lo <= p
            var loI = 0; var hiI = los.length - 1; var ans = -1
            while (loI <= hiI) {
              val mid = (loI + hiI) >>> 1
              if (los(mid) <= p) { ans = mid; loI = mid + 1 } else hiI = mid - 1
            }
            if (ans >= 0 && p < b(ans)._2) {
              joiner(lrow, b(ans)._3)
              Iterator.single(proj(joiner))
            } else Iterator.empty
          }
        }
      }
    }
  }

  /** Library API: band-join `left` to the small disjoint-interval table
    * `bands` on `lo <= point < hi` (columns named on their respective
    * sides — resolved here against the analyzed plans, so the custom
    * node enters the planner fully bound). Installs the planner strategy
    * on the session (idempotent); GraftExtensions also injects it
    * cluster-wide.
    */
  def joinByBand(left: DataFrame, bands: DataFrame,
      pointCol: String, loCol: String, hiCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(BandJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BandJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = bands.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output}"))
    GraftDataset.ofRows(spark, BandJoinNode(lPlan, rPlan,
      attr(lPlan, pointCol), attr(rPlan, loCol), attr(rPlan, hiCol)))
  }
}
