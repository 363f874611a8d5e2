package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // Optional 3rd+ args: restrict the dump to the named queries (local
    // iteration; the driver always passes exactly two args → full run).
    val only: Set[String] = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit", "8000") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // One schema line per table: when the driver regenerates testdata
    // with a different encoding (it has — events.ts, twice), this log is
    // the first diagnostic to read.
    Tables.names.foreach { n =>
      try System.err.println(s"[verify] schema $n: " +
        Tables.t(spark, sfDir, n).schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(","))
      catch { case e: Throwable =>
        System.err.println(s"[verify] schema $n: UNREADABLE ${e.getMessage}")
      }
    }
    // COVERAGE GATE (round 8): a query that throws must still leave an
    // artifact on disk — a 1-row parquet whose `__error` column names the
    // failure — so the driver's compare reports an explicit FAIL row
    // instead of silently dropping the query from the report. Round 7
    // shipped "176/176 pass" while 69 broken queries had simply fallen
    // out of the report; this makes that failure mode impossible.
    val failed = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val ran = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    ran.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.toString)
        failed += name -> msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq((name, msg.take(500))).toDF("__query", "__error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name error-artifact write failed: $e2")
        }
      }
    }
    // Registry self-check: every query attempted must have produced an
    // output directory. A mismatch here means a silent drop — fail loudly.
    val dumped = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet
    val missing = ran.keySet.diff(dumped)
    System.err.println(s"[verify] attempted=${ran.size} dumped=${dumped.size} " +
      s"errored=${failed.size} missing=${missing.size}" +
      (if (missing.nonEmpty) s" MISSING=${missing.toSeq.sorted.mkString(",")}" else ""))
    if (failed.nonEmpty)
      System.err.println(s"[verify] errored queries: " +
        failed.map(_._1).sorted.mkString(","))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Manifest: the AUTHORITATIVE list of attempted queries, written as a
    // flat file (not a dir, so dir-globbing compares skip it). The local
    // gate (tools/check.py) compares against this instead of trusting the
    // set of output dirs it happens to find — a query whose __error
    // artifact write ALSO failed would otherwise still vanish silently.
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      ran.keySet.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
    // The coverage gate's teeth: a silent drop (attempted but no artifact
    // on disk, not even the __error row) must fail the PROCESS, not just
    // print to stderr — automation that only checks the exit code would
    // otherwise read a dropped query as success. Errored-but-artifacted
    // queries deliberately do NOT flip the exit code: their __error rows
    // surface as per-query FAILs in the driver's compare, which is the
    // designed reporting path.
    if (missing.nonEmpty) sys.exit(3)
  }
}
