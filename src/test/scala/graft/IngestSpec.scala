package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Reference-parity edge-case corpus (FIXTURES.md §A) + property tests
  * (SURVEY.md §5.3, seeded-random inputs) for the lenient parse and
  * latest-wins dedup.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: (Int, Long, String)*) =
    rows.toSeq.toDF("partition", "offset", "value")

  private def parsed(rows: (Int, Long, String)*) =
    Ingest.parseLenient(src(rows: _*), "value", Ingest.msgSchema,
      Map("id" -> lit(0L), "msg" -> lit("")))

  test("latest wins: higher offset overwrites (HadoopKafkaConsumer.java:71-74)") {
    val out = Ingest.latestWins(
      parsed((0, 1, """{"id":7,"msg":"a"}"""), (0, 5, """{"id":7,"msg":"b"}""")),
      keys = Seq("id"), version = Seq("offset"))
    assert(out.select("msg").as[String].collect().toSeq == Seq("b"))
  }

  test("out-of-order arrival: offset compare, not arrival order") {
    val out = Ingest.latestWins(
      parsed((0, 5, """{"id":7,"msg":"b"}"""), (0, 1, """{"id":7,"msg":"a"}""")),
      keys = Seq("id"), version = Seq("offset"))
    assert(out.select("msg").as[String].collect().toSeq == Seq("b"))
  }

  test("distinct ids pass through (:79-82)") {
    val out = Ingest.latestWins(
      parsed((0, 1, """{"id":1,"msg":"x"}"""), (0, 2, """{"id":2,"msg":"y"}""")),
      keys = Seq("id"), version = Seq("offset"))
    assert(out.count() == 2)
  }

  test("malformed JSON skipped, job continues (:87-89)") {
    val out = parsed((0, 1, "not-json"), (0, 2, """{"id":3,"msg":"ok"}"""))
    assert(out.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("null/absent fields default to id=0, msg='' (MyKafkaMessage.java:9-12)") {
    val out = parsed((0, 1, "{}")).select("id", "msg").collect()
    assert(out.toSeq == Seq(Row(0L, "")))
  }

  test("cross-partition same id: scoped keeps both, global keeps max offset (KafkaContext.java:103)") {
    val in = parsed((0, 1, """{"id":7,"msg":"p0"}"""), (1, 9, """{"id":7,"msg":"p1"}"""))
    val scoped = Ingest.latestWins(in, keys = Seq("partition", "id"), version = Seq("offset"))
    val global = Ingest.latestWins(in, keys = Seq("id"), version = Seq("offset"))
    assert(scoped.count() == 2)
    assert(global.select("msg").as[String].collect().toSeq == Seq("p1"))
  }

  test("empty input: empty output, success (KafkaContext.java:146-150)") {
    val out = Ingest.latestWins(
      parsed(), keys = Seq("id"), version = Seq("offset"))
    assert(out.count() == 0)
  }

  test("snapshot sink overwrites pre-existing output (HadoopKafkaConsumer.java:139-147)") {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    Ingest.writeSnapshotJson(Seq((1L, "old")).toDF("id", "msg"), dir)
    Ingest.writeSnapshotJson(Seq((2L, "new")).toDF("id", "msg"), dir)
    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.toSeq == Seq("""{"id":2,"msg":"new"}"""))
  }

  test("DLQ split: conserves every row, quarantines raw payloads, agrees with the lenient drop") {
    val rows = src(
      (0, 1L, """{"id":1,"msg":"a"}"""),
      (0, 2L, """{"id":2"""),            // truncated → corrupt
      (0, 3L, "not json at all"),        // → corrupt
      (0, 4L, """{"msg":"only"}"""),     // valid, missing id → ok
      (0, 5L, """{"id":5,"msg":"e"}"""))
    val split = Ingest.parseWithDlq(rows, "value", Ingest.msgSchema)
    assert(split.count() == 5, "DLQ split must conserve every input row")
    val corrupt = split.where(col("disposition") === "corrupt")
      .select("value").as[String].collect().toSet
    assert(corrupt == Set("""{"id":2""", "not json at all"),
      "exactly the malformed payloads, raw bytes intact")
    // the ok slice is exactly what parseLenient keeps (minus defaults)
    val okIds = split.where(col("disposition") === "ok")
      .select("offset").as[Long].collect().toSet
    val lenientIds = Ingest.parseLenient(rows, "value", Ingest.msgSchema,
      defaults = Map.empty).select("offset").as[Long].collect().toSet
    assert(okIds == lenientIds && okIds == Set(1L, 4L, 5L),
      "ok slice must equal the lenient parser's keep set")
    // parsed fields ride along; missing fields are null (not corrupt)
    val row4 = split.where(col("offset") === 4L).select("id", "msg").collect()(0)
    assert(row4.isNullAt(0) && row4.getString(1) == "only")
  }

  test("property: latest-wins is input-order-insensitive and idempotent") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val rows = List.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(6).toLong, rnd.alphanumeric.take(4).mkString, rnd.nextInt(100).toLong))
      // tie-break on (offset, msg) → deterministic even with dup offsets
      val df = rows.toDF("id", "msg", "offset")
      val shuffled = rnd.shuffle(rows).toDF("id", "msg", "offset")
      val a = Ingest.latestWins(df, Seq("id"), Seq("offset", "msg"))
        .orderBy("id").collect().toSeq
      val b = Ingest.latestWins(shuffled, Seq("id"), Seq("offset", "msg"))
        .orderBy("id").collect().toSeq
      assert(a == b)
      // idempotence: dedup of the dedup is a fixpoint
      val c = Ingest.latestWins(
        Ingest.latestWins(df, Seq("id"), Seq("offset", "msg")),
        Seq("id"), Seq("offset", "msg")).orderBy("id").collect().toSeq
      assert(c == a)
      // per-key result = max by (offset, msg) — reference semantics
      val expect = rows.groupBy(_._1).view.mapValues(_.maxBy(r => (r._3, r._2))).toMap
      assert(a.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap ==
        expect.map { case (k, (_, m, o)) => k -> (m, o) })
    }
  }

  test("property: from_json/to_json round-trip on the reference schema") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, ""), (Long.MaxValue, "x"), (Long.MinValue, "yz")) ++
      Seq.fill(10)((rnd.nextLong(), rnd.alphanumeric.take(12).mkString))
    for ((id, msg) <- cases) {
      val df = Seq((id, msg)).toDF("id", "msg")
        .select(to_json(struct(col("id"), col("msg"))).as("j"))
        .select(from_json(col("j"), Ingest.msgSchema).as("p"))
        .select("p.id", "p.msg")
      assert(df.collect().head == Row(id, msg))
    }
  }

  test("Dataset.observe reports ingest metrics from the same pass (no second scan)") {
    // Production-observability surface: row counts and null counts ride
    // the existing action as accumulator metrics — the pattern that
    // monitors a 100 TB ingest without re-scanning it.
    val obs = org.apache.spark.sql.Observation("ingest_metrics")
    val src = Tables.t(spark, sf, "events")
      .select(col("user_id").as("id"), col("event_type").as("msg"),
        col("event_id").as("version"))
    val observed = src.observe(obs,
      count(lit(1)).as("n_in"),
      sum(when(col("msg").isNull, 1L).otherwise(0L)).as("n_null_msg"))
    val nOut = Ingest.latestWins(observed, Seq("id"), Seq("version")).count()
    val m = obs.get
    assert(m("n_in") == src.count(), "observed input rows must match table count")
    assert(m("n_null_msg") == 0L)
    assert(nOut <= m("n_in").asInstanceOf[Long])
  }
}
