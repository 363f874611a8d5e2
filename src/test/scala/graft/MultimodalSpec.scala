package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema shape, determinism, batching, binary
  * projection discipline.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    Tables.t(spark, sf, "documents").limit(50), "doc_id", "text")

  test("synthetic media: kinds cycle deterministically, bytes non-null") {
    val rows = media.select("media_id", "kind").as[(Long, String)].collect()
    assert(rows.forall { case (id, k) =>
      k == Seq("image", "audio", "video")((id % 3).toInt) })
    assert(media.where(col("bytes").isNull).count() == 0)
  }

  test("decode stub: plausible dims, deterministic across invocations") {
    val a = Multimodal.withDecodedMeta(media).select("media_id", "meta.width", "meta.height")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val b = Multimodal.withDecodedMeta(media).select("media_id", "meta.width", "meta.height")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.forall { case (_, w, h) => w >= 1 && w <= 1920 && h >= 1 && h <= 1080 })
  }

  test("feature extraction: fixed dim, deterministic, one row per media item") {
    val f = Multimodal.extractFeaturesStub(media, dim = 8, batchSize = 7)
    val rows = f.select("media_id", "features").as[(Long, Seq[Double])].collect()
    assert(rows.length == media.count())
    assert(rows.forall(_._2.length == 8))
    assert(rows.forall(_._2.forall(v => v >= -1.0 && v < 1.0)))
    val again = Multimodal.extractFeaturesStub(media, dim = 8, batchSize = 3)
      .select("media_id", "features").as[(Long, Seq[Double])].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "batch size must not change results")
  }

  test("resize plan keeps aspect ratio and never upscales") {
    val planned = Multimodal.withResizePlan(Multimodal.withDecodedMeta(media), maxSide = 256)
      .select(col("meta.width"), col("meta.height"), col("resize_w"), col("resize_h"))
      .as[(Int, Int, Int, Int)].collect()
    assert(planned.forall { case (w, h, rw, rh) =>
      rw <= 256 && rh <= 256 && rw <= w.max(1) && rh <= h.max(1) })
  }

  test("frame sampling: n frames for video, single frame otherwise") {
    val sampled = Multimodal.frameSample(
      media.withColumn("n_frames", lit(100)), n = 4, totalFramesCol = col("n_frames"))
    val counts = sampled.groupBy("media_id", "kind").count()
      .as[(Long, String, Long)].collect()
    assert(counts.forall { case (_, k, c) => if (k == "video") c == 4 else c == 1 })
    val idxs = sampled.where(col("kind") === "video")
      .select("frame_idx").distinct().as[Int].collect().sorted
    assert(idxs.toSeq == Seq(0, 25, 50, 75))
  }
}
