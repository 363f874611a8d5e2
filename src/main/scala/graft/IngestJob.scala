package graft

import graft.operators.Ingest
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runnable job driver — the Spark form of the reference CLI
  * (`HadoopKafkaConsumer.java:105-203`: options `-o/-t/-g/-b/-p`,
  * delete-output-then-run, `ToolRunner`).
  *
  * A user of the reference job switches to:
  * {{{
  *   spark-submit --class graft.IngestJob engine.jar \
  *     --input <dir-of-kafka-shaped-parquet | json-lines dir> \
  *     --format kafka-parquet|jsonl \
  *     --output <snapshot dir> \
  *     [--scoped]            // reference per-(partition,id) dedup scope
  *     [--limit N]           // reference kafka.limit record cap
  * }}}
  * (With a Kafka cluster and the external connector jar, swap the input
  * for `Sources.kafkaBatch(spark, brokers, topic)` — same pipeline.)
  *
  * Semantics per SURVEY §2A: lenient fixed-schema JSON parse, latest-wins
  * dedup by offset, JSON-lines overwrite snapshot.
  */
object IngestJob {

  case class Args(
      input: String = "", format: String = "kafka-parquet", output: String = "",
      scoped: Boolean = false, limit: Long = -1L)

  def parseArgs(argv: Array[String]): Args = {
    def loop(rest: List[String], a: Args): Args = rest match {
      case "--input" :: v :: t => loop(t, a.copy(input = v))
      case "--format" :: v :: t => loop(t, a.copy(format = v))
      case "--output" :: v :: t => loop(t, a.copy(output = v))
      case "--scoped" :: t => loop(t, a.copy(scoped = true))
      case "--limit" :: v :: t => loop(t, a.copy(limit = v.toLong))
      case Nil => a
      case x :: _ => throw new IllegalArgumentException(s"unknown option: $x")
    }
    val a = loop(argv.toList, Args())
    require(a.input.nonEmpty && a.output.nonEmpty, "--input and --output are required")
    a
  }

  /** The job body, session-injected for tests. */
  def run(spark: SparkSession, a: Args): Long = {
    val raw: DataFrame = a.format match {
      case "kafka-parquet" => spark.read.parquet(a.input)
      case "jsonl" =>
        // JSON lines with no envelope: synthesize partition 0, offset =
        // input order is NOT available from a plain file → use a stable
        // surrogate (hash) so reruns are deterministic.
        spark.read.text(a.input)
          .select(lit(0).as("partition"), xxhash64(col("value")).as("offset"), col("value"))
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
    // reference kafka.limit: cap records scanned (KafkaInputFormat.java:188).
    // Dataset.limit takes an Int; a larger --limit would overflow toInt
    // silently (negative cap) — reject it explicitly instead.
    require(a.limit <= Int.MaxValue,
      s"--limit ${a.limit} exceeds the supported cap of ${Int.MaxValue}")
    val capped = if (a.limit > 0) raw.limit(a.limit.toInt) else raw
    val snapshot = Sources.kafkaShapedToSnapshot(capped, scoped = a.scoped)
    Ingest.writeSnapshotJson(snapshot, a.output)
    snapshot.count()
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000") // see Bench.scala
      .getOrCreate()
    try {
      val n = run(spark, a)
      println(s"[ingest] wrote $n records to ${a.output}")
    } finally spark.stop()
  }
}
