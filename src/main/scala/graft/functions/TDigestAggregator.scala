package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable t-digest quantile sketch as a typed `Aggregator` — the
  * 100 TB path for percentiles: per-partition partial digests merge
  * associatively through Spark's aggregate machinery (map-side combine,
  * spill-safe), so the full value stream never sorts and never
  * concentrates. This is the merging-digest formulation (Dunning &
  * Ertl, "Computing extremely accurate quantiles using t-digests",
  * arXiv:1902.04023): centroids are size-bounded by the arcsine scale
  * function k(q) = δ/2π · asin(2q−1), which keeps clusters tiny at the
  * tails (rank error O(q(1−q)/δ)) and coarse in the middle.
  *
  * Like every centroid sketch, the exact centroid layout depends on
  * merge ORDER, so two runs with different partitionings produce
  * slightly different estimates — the guarantee is the rank-error
  * bound, not bit equality. Callers that need cross-engine
  * hash-stable output should emit the BOUND CHECK (estimate's true
  * rank within q ± ε), which is deterministic whenever the sketch is
  * within spec — the same agreement-query pattern as
  * dedup_minhash_fast. Exact-percentile siblings: MoreOps
  * `agg_percentile` (Spark percentile ≡ DuckDB quantile_cont).
  */
object TDigestAggregator {

  /** Digest state: merged centroids (mean-sorted) + an unmerged spill
    * buffer that amortizes compression to O(log) per insert. `used`
    * tracks the live prefix of the preallocated buffer so the hot
    * reduce path is an O(1) in-place write — Spark's
    * ObjectHashAggregate keeps the buffer as a live object between
    * rows and only serializes at partial-aggregate output (the dead
    * capacity tail costs 4 KB per partial there, never correctness:
    * compress/finish read the live prefix exclusively).
    */
  case class TDigest(
      var means: Array[Double], var weights: Array[Long],
      var buffer: Array[Double], var used: Int)

  private val Delta = 100.0
  private val BufferCap = 512

  private def kScale(q: Double): Double =
    Delta / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Merge-compress: combine centroid runs + raw buffer into a fresh
    * centroid list, greedily absorbing neighbors while the k-scale
    * span of the would-be cluster stays ≤ 1.
    */
  private[functions] def compress(d: TDigest): TDigest = {
    val pts = new scala.collection.mutable.ArrayBuffer[(Double, Long)](
      d.means.length + d.used)
    var i = 0
    while (i < d.means.length) { pts += ((d.means(i), d.weights(i))); i += 1 }
    i = 0
    while (i < d.used) { pts += ((d.buffer(i), 1L)); i += 1 }
    if (pts.isEmpty) return TDigest(Array.empty, Array.empty, Array.empty, 0)
    val sorted = pts.sortBy(p => (p._1, p._2))
    val total = sorted.iterator.map(_._2).sum.toDouble
    val outM = new scala.collection.mutable.ArrayBuffer[Double]()
    val outW = new scala.collection.mutable.ArrayBuffer[Long]()
    var curSum = sorted.head._1 * sorted.head._2
    var curW = sorted.head._2
    var wBefore = 0L // weight strictly before the current cluster
    var j = 1
    while (j < sorted.length) {
      val (m, w) = sorted(j)
      val q0 = wBefore / total
      val q2 = (wBefore + curW + w) / total
      if (kScale(q2) - kScale(q0) <= 1.0) {
        curSum += m * w; curW += w
      } else {
        outM += curSum / curW; outW += curW
        wBefore += curW
        curSum = m * w; curW = w
      }
      j += 1
    }
    outM += curSum / curW; outW += curW
    TDigest(outM.toArray, outW.toArray, Array.empty, 0)
  }

  /** Quantile estimate: centroids anchor at their midpoints; linear
    * interpolation between anchors, clamped to the extreme means.
    */
  def quantile(d0: TDigest, q: Double): Double = {
    val d = if (d0.used > 0) compress(d0) else d0
    val n = d.means.length
    if (n == 0) return Double.NaN
    if (n == 1) return d.means(0)
    val total = d.weights.sum.toDouble
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val mid = cum + d.weights(i) / 2.0
      if (target < mid) {
        if (i == 0) return d.means(0)
        val prevMid = cum - d.weights(i - 1) / 2.0
        val f = (target - prevMid) / (mid - prevMid)
        return d.means(i - 1) + f * (d.means(i) - d.means(i - 1))
      }
      cum += d.weights(i)
      i += 1
    }
    d.means(n - 1)
  }

  /** Aggregator producing the quantile estimates for `qs` in order. */
  def digest(qs: Seq[Double]): Aggregator[Double, TDigest, Seq[Double]] =
    new Aggregator[Double, TDigest, Seq[Double]] {
      override def zero: TDigest =
        TDigest(Array.empty, Array.empty, new Array[Double](BufferCap), 0)
      override def reduce(b: TDigest, x: Double): TDigest = {
        // In-place append; compress resets the buffer. The same live
        // object is returned, so the hot path allocates nothing.
        if (b.buffer.length < BufferCap) {
          // deserialized partial (trimmed buffer) — restore capacity
          val nb = new Array[Double](BufferCap)
          System.arraycopy(b.buffer, 0, nb, 0, b.used)
          b.buffer = nb
        }
        b.buffer(b.used) = x
        b.used += 1
        if (b.used >= BufferCap) {
          val c = compress(b)
          b.means = c.means; b.weights = c.weights
          b.used = 0
        }
        b
      }
      override def merge(a: TDigest, b: TDigest): TDigest =
        compress(TDigest(
          a.means ++ b.means, a.weights ++ b.weights,
          a.buffer.take(a.used) ++ b.buffer.take(b.used),
          a.used + b.used))
      override def finish(r: TDigest): Seq[Double] = {
        val c = compress(r)
        qs.map(q => quantile(c, q))
      }
      override def bufferEncoder: Encoder[TDigest] = Encoders.product[TDigest]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
}
