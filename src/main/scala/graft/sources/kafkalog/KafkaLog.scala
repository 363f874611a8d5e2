package graft.sources.kafkalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import java.nio.charset.StandardCharsets

/** The `kafkalog` log format: an on-disk, replayable stand-in for a Kafka
  * topic, so the REAL Spark streaming-source machinery (offset tracking,
  * admission control, checkpoint recovery) can be driven by engine code in
  * an offline environment. The live-broker path
  * (`/root/reference/src/main/java/hadoop/kafka/newconsumer/KafkaContext.java:57-59`
  * seek-to-beginning, `KafkaInputFormat.java:111-201` per-partition record
  * reader with the `kafka.limit` cap) needs a connector jar this
  * environment doesn't ship; this format reproduces the CONTRACT that code
  * consumes — per-partition ordered `(offset, value)` records with
  * bounded-per-trigger admission — on plain files.
  *
  * Layout mirrors a Kafka partition's segmented log:
  *
  * {{{
  *   <dir>/p=<partition>/<segment files, lexicographically ordered>
  * }}}
  *
  * Each segment is a text file of `<offset>TAB<base64(value utf-8)>`
  * lines; offsets are strictly increasing within a partition (across its
  * segments in file-name order). Gaps are legal, exactly as in a
  * compacted Kafka topic — admission arithmetic is in OFFSET units, like
  * Kafka's `maxOffsetsPerTrigger`. Base64 keeps any payload byte pattern
  * (newlines, tabs) one-record-per-line.
  *
  * Scale stance: the reader never materializes a partition — each Spark
  * task streams one partition's segment files and early-exits past its
  * offset range (offsets are sorted, so a range read touches one
  * contiguous span). End-offset discovery tail-reads the last few KB of
  * the last segment per partition rather than scanning the log. Hadoop
  * `FileSystem` is used throughout, so the same code reads local disk in
  * tests and HDFS-compatible stores on a cluster.
  */
object KafkaLog {

  /** The source's fixed schema — the kafka-shaped frame every downstream
    * ingest operator accepts (what the real Kafka source yields after
    * `value.cast("string")`).
    */
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  val SHORT_NAME = "kafkalog"

  /** Write a batch frame with `(partition, offset, value)` columns as a
    * kafkalog directory — the test/differential fixture writer (in
    * production the log IS the upstream system's output; nothing in the
    * engine's read path depends on this writer). One segment per
    * partition, sorted by offset. The distinct-partition collect is the
    * PARTITION LIST (bounded like a topic's partition count), never the
    * data.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val norm = df.select(
      col("partition").cast("int").as("partition"),
      col("offset").cast("long").as("offset"),
      col("value").cast("string").as("value"))
    import spark.implicits._
    val parts = norm.select("partition").distinct().as[Int].collect().sorted
    parts.foreach { p =>
      norm.where(col("partition") === p)
        .select(col("offset"),
          concat_ws("\t", col("offset"),
            // Spark's base64 chunks with CRLF past 76 chars (MIME
            // style); strip the wraps — chunked base64 minus newlines
            // is valid unchunked base64 — or long values would split
            // across lines and corrupt the log
            translate(base64(encode(coalesce(col("value"), lit("")), "UTF-8")),
              "\r\n", "")).as("line"))
        .repartition(1).sortWithinPartitions("offset")
        .select("line")
        .write.mode("overwrite").text(s"$dir/p=$p")
    }
  }

  // ---- log-reading primitives (driver: discovery; executor: scan) ----

  private val PartDir = "p=(\\d+)".r

  def fs(path: String): FileSystem =
    new Path(path).getFileSystem(new Configuration())

  /** List `(partition, ordered segment paths)` for a log dir. */
  def listPartitions(dir: String): Seq[(Int, Seq[String])] = {
    val f = fs(dir)
    val base = new Path(dir)
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName match {
          case PartDir(p) =>
            val segs = f.listStatus(st.getPath).toSeq
              .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
                !s.getPath.getName.startsWith("."))
              .map(_.getPath.toString).sorted
            if (segs.nonEmpty) Some(p.toInt -> segs) else None
          case _ => None
        }
      }
      .sortBy(_._1)
  }

  /** First offset in a partition (head of its first segment). */
  def headOffset(segments: Seq[String]): Long = {
    val f = fs(segments.head)
    val in = f.open(new Path(segments.head))
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      val line = reader.readLine()
      if (line == null) 0L else parseOffset(line, segments.head)
    } finally in.close()
  }

  /** One past the last offset in a partition. Tail-reads the final
    * segment backward in 64 KiB steps — O(tail), not O(log), which is
    * what keeps per-trigger end-offset discovery cheap when segments are
    * gigabytes.
    */
  def endOffset(segments: Seq[String]): Long = {
    val path = new Path(segments.last)
    val f = fs(segments.last)
    val len = f.getFileStatus(path).getLen
    if (len == 0) return if (segments.size > 1) endOffset(segments.dropRight(1)) else 0L
    val in = f.open(path)
    try {
      var window = math.min(len, 65536L)
      while (true) {
        val start = len - window
        in.seek(start)
        val buf = new Array[Byte](window.toInt)
        in.readFully(buf)
        val text = new String(buf, StandardCharsets.UTF_8)
        // last non-empty line fully contained in the window
        val lines = text.split("\n", -1).filter(_.nonEmpty)
        val complete = if (start == 0) lines else lines.drop(1)
        if (complete.nonEmpty)
          return parseOffset(complete.last, segments.last) + 1L
        if (start == 0) return 0L
        window = math.min(len, window * 2)
      }
      0L // unreachable
    } finally in.close()
  }

  def parseOffset(line: String, file: String): Long = {
    val tab = line.indexOf('\t')
    if (tab <= 0)
      throw new IllegalStateException(s"kafkalog: corrupt line in $file: '${line.take(40)}'")
    line.substring(0, tab).toLong
  }

  def decodeValue(line: String): String = {
    val tab = line.indexOf('\t')
    new String(java.util.Base64.getDecoder.decode(line.substring(tab + 1)),
      StandardCharsets.UTF_8)
  }
}
