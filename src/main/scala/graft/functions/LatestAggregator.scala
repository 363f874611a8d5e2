package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2B "UDF/UDAF surface"): latest-wins as
  * an `Aggregator[IN, BUF, OUT]` — the user-facing way to package the
  * reference's dedup semantics (`HadoopKafkaConsumer.java:55-90`) as a
  * reusable aggregate function.
  *
  * Buffer is a single (version, payload) pair → partial aggregation
  * (map-side combine) and spill-safety come from Spark's aggregate
  * machinery; merge is associative+commutative so the result is
  * input-order independent (ties broken on payload for determinism).
  */
object LatestAggregator {

  case class VersionedValue(version: Long, value: String)

  /** arg_max(value, version) with deterministic (version, value) ordering. */
  val latestByVersion: Aggregator[VersionedValue, VersionedValue, String] =
    new Aggregator[VersionedValue, VersionedValue, String] {
      private val none = VersionedValue(Long.MinValue, null)
      override def zero: VersionedValue = none
      override def reduce(b: VersionedValue, a: VersionedValue): VersionedValue = merge(b, a)
      override def merge(a: VersionedValue, b: VersionedValue): VersionedValue = {
        if (a.value == null) b
        else if (b.value == null) a
        else if (Ordering[(Long, String)].gt((b.version, b.value), (a.version, a.value))) b
        else a
      }
      override def finish(r: VersionedValue): String = r.value
      override def bufferEncoder: Encoder[VersionedValue] = Encoders.product[VersionedValue]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
