package graft

import graft.operators.Ingest
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property gates (SURVEY §5.3): latest-wins dedup is
  * row-order-insensitive and idempotent, and `to_json ∘ from_json` is
  * the identity on the reference payload schema — each checked over
  * generated inputs, not fixtures. Versions are made globally unique by
  * construction: with ties, `max_by` legitimately picks an arbitrary
  * winner (same as the reference's HashMap, whose winner depends on
  * arrival order), so only the tie-free contract is law.
  */
object PropertySpec extends Properties("graft") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** (id, msg) pairs over a tiny key space (collisions guaranteed);
    * version = global index → unique, so latest-wins is a function.
    */
  private val records: Gen[List[(Long, String, Long)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 6L)
      msg <- Gen.alphaNumStr.map(_.take(8))
    } yield (id, msg))
      .map(_.take(40).zipWithIndex.map { case ((id, m), i) => (id, m, i.toLong) })

  private def dedup(rows: Seq[(Long, String, Long)]): Set[(Long, String, Long)] =
    Ingest.latestWins(rows.toDF("id", "msg", "version"),
        keys = Seq("id"), version = Seq("version"))
      .as[(Long, String, Long)].collect().toSet

  property("latestWins is row-order-insensitive") =
    forAll(records) { rows =>
      dedup(rows) == dedup(scala.util.Random.shuffle(rows))
    }

  property("latestWins is idempotent") =
    forAll(records) { rows =>
      val once = dedup(rows)
      dedup(once.toSeq) == once
    }

  property("latestWins keeps exactly the max-version row per key (vs reference fold)") =
    forAll(records) { rows =>
      val expect = rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }.toSet
      dedup(rows) == expect
    }

  property("to_json round-trips the payload schema through from_json") =
    forAll(records) { rows =>
      import org.apache.spark.sql.functions._
      val back = rows.toDF("id", "msg", "version")
        .select(to_json(struct(col("id"), col("msg"))).as("j"), col("version"))
        .select(from_json(col("j"), Ingest.msgSchema).as("p"), col("version"))
        .select(col("p.id"), col("p.msg"), col("version"))
        .as[(Long, String, Long)].collect().toSet
      back == rows.toSet
    }

  /** Keyed timed rows over tiny key/time spaces so equal-time ties and
    * missing-match cases are generated constantly.
    */
  private val timedRows: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] =
    for {
      left <- Gen.nonEmptyListOf(for {
        k <- Gen.chooseNum(0L, 4L); t <- Gen.chooseNum(0L, 12L)
      } yield (k, t)).map(_.take(25))
      right <- Gen.nonEmptyListOf(for {
        k <- Gen.chooseNum(0L, 4L); t <- Gen.chooseNum(0L, 12L)
      } yield (k, t)).map(_.take(25).zipWithIndex.map {
        case ((k, t), i) => (k, t, 100L + i) // unique payload id
      })
    } yield (left, right)

  property("asofForward attaches the min-(time, id) right row at-or-after, vs brute force") =
    forAll(timedRows) { case (left, right) =>
      import org.apache.spark.sql.functions.col
      val lDf = left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val rDf = right.toDF("rk", "rt", "rid")
      val got = graft.plans.AsOfJoin.asofForward(lDf, rDf,
          leftKey = "k", rightKey = "rk", leftTime = "t", rightTime = "rt",
          rightPayload = Seq("rid"), rightTiebreak = Seq("rid"))
        .select(col("lid"), col("rid"))
        .as[(Long, Option[Long])].collect().toMap
      val want = left.zipWithIndex.map { case ((k, t), i) =>
        val cands = right.filter(r => r._1 == k && r._2 >= t)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.minBy(r => (r._2, r._3))._3))
      }.toMap
      got == want
    }

  // Spark job per case — 10 cases hits plenty of collision/shuffle
  // variety with the 7-key space above
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)
}
