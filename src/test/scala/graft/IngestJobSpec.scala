package graft

import org.apache.spark.sql.functions._

/** End-to-end job driver: CLI parse + full pipeline to a snapshot dir. */
class IngestJobSpec extends SparkSpec {
  import spark.implicits._

  test("arg parsing: defaults, flags, errors") {
    val a = IngestJob.parseArgs(Array(
      "--input", "/in", "--output", "/out", "--scoped", "--limit", "5"))
    assert(a == IngestJob.Args("/in", "kafka-parquet", "/out", scoped = true, limit = 5))
    intercept[IllegalArgumentException](IngestJob.parseArgs(Array("--bogus", "x")))
    intercept[IllegalArgumentException](IngestJob.parseArgs(Array("--input", "/in")))
  }

  test("kafka-parquet job: parse, dedup latest, overwrite JSON snapshot") {
    val in = java.nio.file.Files.createTempDirectory("job_in").toString
    val out = java.nio.file.Files.createTempDirectory("job_out").toString
    Seq(
      (0, 1L, """{"id":7,"msg":"old"}"""),
      (0, 9L, """{"id":7,"msg":"new"}"""),
      (1, 2L, """{"id":8,"msg":"x"}"""),
      (1, 3L, "broken")
    ).toDF("partition", "offset", "value")
      .withColumn("value", col("value").cast("binary"))
      .write.mode("overwrite").parquet(in)

    val n = IngestJob.run(spark,
      IngestJob.Args(input = in, format = "kafka-parquet", output = out))
    assert(n == 2)
    val lines = spark.read.text(out).as[String].collect().sorted
    assert(lines.toSeq == Seq("""{"id":7,"msg":"new"}""", """{"id":8,"msg":"x"}"""))

    // rerun with different data → overwrite, not append (reference
    // delete-then-write, HadoopKafkaConsumer.java:139-147)
    val in2 = java.nio.file.Files.createTempDirectory("job_in2").toString
    Seq((0, 1L, """{"id":1,"msg":"only"}""")).toDF("partition", "offset", "value")
      .withColumn("value", col("value").cast("binary"))
      .write.mode("overwrite").parquet(in2)
    IngestJob.run(spark, IngestJob.Args(input = in2, output = out))
    assert(spark.read.text(out).as[String].collect().toSeq ==
      Seq("""{"id":1,"msg":"only"}"""))
  }

  test("jsonl format + limit cap") {
    val in = java.nio.file.Files.createTempDirectory("job_jl").toString
    val out = java.nio.file.Files.createTempDirectory("job_jlout").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "d.jsonl"),
      Seq.tabulate(10)(i => s"""{"id":$i,"msg":"m$i"}""").mkString("\n"))
    val n = IngestJob.run(spark,
      IngestJob.Args(input = in, format = "jsonl", output = out, limit = 4))
    assert(n == 4) // limit caps scanned records (reference kafka.limit)
    // a limit beyond Int.MaxValue must be rejected, not overflow toInt
    // into a silent negative cap
    intercept[IllegalArgumentException](IngestJob.run(spark,
      IngestJob.Args(input = in, format = "jsonl", output = out,
        limit = Int.MaxValue + 1L)))
  }
}
