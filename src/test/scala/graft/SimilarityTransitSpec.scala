package graft

import graft.functions.CosineSimilarity
import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, transform}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pins the r17 float32 SRP transit (see [[SimilarityOps.srpKeyedGrown]]
  * scaladoc): the bucket exchange carries `em` as array<float> — halving
  * the one locally spill-bound term of the third-decade cost model — and
  * this must be a PURE PHYSICAL change: bit-identical results vs the
  * float64 control leg (`-Dgraft.srp.transit=f64`), because the source
  * embeddings are fp32 parquet and double→float→double is the identity
  * on float-originated values.
  */
class SimilarityTransitSpec extends SparkSpec {

  private def emb(dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("em"))

  private def withTransit[A](mode: String)(body: => A): A = {
    val prev = sys.props.get("graft.srp.transit")
    sys.props("graft.srp.transit") = mode
    try body
    finally prev match {
      case Some(v) => sys.props("graft.srp.transit") = v
      case None => sys.props.remove("graft.srp.transit")
    }
  }

  test("kernel: cosine_sim on array<float> widens exactly (bit-identical to the double kernel)") {
    CosineSimilarity.register(spark)
    // float-originated values, including negatives, zeros, and a
    // zero-norm row (kernel contract: 0.0, not NaN)
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(50)
      .select(col("vec_id"),
        col("embedding").as("ef"),
        transform(col("embedding"), _.cast("double")).as("ed"))
    val both = rows.as("a").crossJoin(rows.as("b"))
      .select(
        CosineSimilarity.cosine_sim("a.ed", "b.ed").as("dd"),
        CosineSimilarity.cosine_sim("a.ef", "b.ef").as("ff"),
        CosineSimilarity.cosine_sim("a.ef", "b.ed").as("fd"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val dd = r.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(dd), "float/float kernel diverged")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(dd), "mixed float/double kernel diverged")
    }
  }

  test("keyed frame carries float32 em by default, float64 under the control knob") {
    val e = emb(sf).select(col("vec_id"), col("em"))
    val f32 = SimilarityOps.srpKeyedGrown(e, planes = 4, tables = 2, dims = 64)
    assert(f32.schema("em").dataType === ArrayType(FloatType),
      "default transit must be array<float> — the halved exchange payload")
    withTransit("f64") {
      val f64 = SimilarityOps.srpKeyedGrown(e, planes = 4, tables = 2, dims = 64)
      assert(f64.schema("em").dataType.asInstanceOf[ArrayType].elementType.typeName === "double")
    }
  }

  // Scores compare UNROUNDED, via doubleToLongBits — rounding to 4
  // decimals would tolerate exactly the sub-1e-4 drift this spec exists
  // to rule out (r17 advisor). The oracle-side rounding contract lives
  // in the registry queries, not here.
  test("srpPairsAboveGrown: float32 transit is bit-identical to the f64 control leg") {
    val e = emb(sf).select(col("vec_id"), col("em"))
    def run(): Seq[String] =
      SimilarityOps.srpPairsAboveGrown(e, dims = 64, thresh = 0.4)
        .select(col("va"), col("vb"), col("score"))
        .collect()
        .map(r => s"${r.get(0)}|${r.get(1)}|" +
          java.lang.Double.doubleToLongBits(r.getDouble(2)))
        .sorted.toSeq
    val f32 = run()
    val f64 = withTransit("f64")(run())
    assert(f32.nonEmpty, "parity over an empty result set proves nothing")
    assert(f32 === f64)
  }

  test("annTopKPortableGrown: float32 transit is bit-identical to the f64 control leg") {
    val d = emb(sf)
    def run(): Seq[String] =
      SimilarityOps.annTopKPortableGrown(d, k = 5, dims = 64)
        .select(col("qid"), col("vec_id"), col("score"), col("rn"))
        .collect()
        .map(r => s"${r.get(0)}|${r.get(1)}|" +
          s"${java.lang.Double.doubleToLongBits(r.getDouble(2))}|${r.get(3)}")
        .sorted.toSeq
    val f32 = run()
    val f64 = withTransit("f64")(run())
    assert(f32.nonEmpty)
    assert(f32 === f64)
  }
}
