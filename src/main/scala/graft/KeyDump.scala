package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic: time the SRP keying Generate stage at pinned
  * widths over the SAME input, independent of corpus size, and dump
  * generated-code sizes per codegen stage.
  */
object KeyDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("KEYDUMP_HML", "65535"))
      .config("spark.sql.codegen.factoryMode",
        sys.env.getOrElse("KEYDUMP_FACTORY", "FALLBACK"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/tmp/sf16x/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as em")
      .where(col("vec_id") < 20000)
    e.count()
    for ((p, t) <- Seq((12, 16), (13, 18), (14, 20))) {
      val keyed = graft.operators.SimilarityOps.srpKeyedGrown(e, p, t, dims = 64)
        .select(count(col("bk")))
      val codes = org.apache.spark.sql.execution.debug
        .codegenStringSeq(keyed.queryExecution.executedPlan)
      val t0 = System.nanoTime()
      try {
        keyed.collect()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[keydump] planes=$p tables=$t wall=$secs%.2f s " +
          s"stages=${codes.size} codeChars=${codes.map(_._2.length).mkString(",")}")
        if (sys.env.contains("KEYDUMP_CODE"))
          codes.foreach { case (sub, code, bcs) =>
            val name = s"/tmp/keydump_p${p}_t${t}_${code.length}.java"
            java.nio.file.Files.write(java.nio.file.Paths.get(name), code.getBytes)
            println(s"[keydump] wrote $name bytecodeStats=$bcs")
          }
      } catch { case ex: Throwable =>
        println(s"[keydump] planes=$p tables=$t FAILED: " +
          ex.toString.take(300))
      }
    }
    spark.stop()
  }
}
