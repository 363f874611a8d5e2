package graft.operators

import graft.{GQuery, Tables}
import graft.sources.kafkalog.KafkaLog
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.KeyedRecord
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Differential queries driven through the `kafkalog` DataSource V2
  * source ([[graft.sources.kafkalog.KafkaLogSourceProvider]]) — the
  * offline stand-in for the reference's Kafka record reader
  * (`KafkaInputFormat.java:111-201`, `KafkaContext.java:124-156`).
  *
  * These re-run EXISTING streaming differentials (same oracle SQL as
  * `streaming_latest_upsert` / `streaming_tws_upsert`) with the input
  * entering through Spark's real source machinery — per-trigger offset
  * tracking, `maxOffsetsPerTrigger` admission (sized so every scale
  * factor replays in ≥4 micro-batches), checkpointed offsets — instead
  * of a file-stream or MemoryStream. A matching batch-leg query covers
  * the reference's per-partition-scoped dedup
  * (`KafkaContext.java:103`) over the same log.
  *
  * The log fixture derives from the `events` table: partition
  * `event_id % 4` (NOT a function of the dedup key, so scoped and
  * global dedup genuinely differ), offset `event_id div 4` — DENSE and
  * strictly increasing within each partition, so the offset-unit
  * admission cap admits the intended row count per trigger (a gapped
  * per-partition offset sequence quarters every batch and was measured
  * 2-3× slower end-to-end purely from extra micro-batch overhead; the
  * gapped/compacted shape is still exercised by `StateScaleSpec`).
  * The global event order is reconstructed as `offset * 4 + partition`
  * (= event_id) where a cross-partition total version order matters.
  * Value is the reference's JSON message shape `{"id","msg"}`. Built
  * once per (testdata dir) per JVM.
  */
object KafkaLogOps {

  /** Memoized fixture build: kafkalog dir + record count per testdata
    * dir. The count sizes the admission cap; the build is a distributed
    * write (see [[KafkaLog.write]]), re-done once per JVM per dir.
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** The events table in kafkalog frame shape (see object doc for the
    * partition/offset derivation).
    */
  private def eventsAsLogFrame(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events").select(
      (col("event_id") % 4).cast("int").as("partition"),
      expr("event_id div 4").as("offset"),
      to_json(struct(col("user_id").as("id"), col("event_type").as("msg")))
        .as("value"))

  def eventsLog(s: SparkSession, dir: String): (String, Long) =
    built.computeIfAbsent(dir, _ => {
      val out = s"/tmp/graft_kafkalog/${new java.io.File(dir).getName}/events"
      KafkaLog.fs(out).delete(new Path(out), true)
      KafkaLog.write(eventsAsLogFrame(s, dir), out)
      (out, Tables.t(s, dir, "events").count())
    })

  /** Third fixture: a separate copy of the events log, COMPACTED in
    * place by [[graft.sources.kafkalog.KafkaLogCompaction]] (key = the
    * payload's `$.id`, i.e. the user). Separate because compaction
    * mutates the log and the other fixtures replay full history.
    */
  private val builtCompacted = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Seq[graft.sources.kafkalog.KafkaLogCompaction.PartitionCompaction])]()

  def compactedEventsLog(s: SparkSession, dir: String)
      : (String, Seq[graft.sources.kafkalog.KafkaLogCompaction.PartitionCompaction]) =
    builtCompacted.computeIfAbsent(dir, _ => {
      val out = s"/tmp/graft_kafkalog/${new java.io.File(dir).getName}/events_compacted"
      KafkaLog.fs(out).delete(new Path(out), true)
      KafkaLog.write(eventsAsLogFrame(s, dir), out)
      val report = graft.sources.kafkalog.KafkaLogCompaction.compact(s, out)
      (out, report)
    })

  /** Fourth fixture: an events log partitioned BY KEY (`user_id % 4`,
    * the compacted-topic layout contract — Kafka's partitioner sends a
    * key to exactly one partition, which is what makes per-partition
    * tombstoning globally meaningful), compacted with 'error' records
    * as tombstones. Offsets are the raw event_ids: globally unique and
    * per-partition increasing, exercising sparse-offset segments.
    */
  private val builtTombstoned =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def tombstonedEventsLog(s: SparkSession, dir: String): String =
    builtTombstoned.computeIfAbsent(dir, _ => {
      val out = s"/tmp/graft_kafkalog/${new java.io.File(dir).getName}/events_tombstoned"
      KafkaLog.fs(out).delete(new Path(out), true)
      KafkaLog.write(Tables.t(s, dir, "events").select(
        (col("user_id") % 4).cast("int").as("partition"),
        col("event_id").as("offset"),
        to_json(struct(col("user_id").as("id"), col("event_type").as("msg")))
          .as("value")), out)
      graft.sources.kafkalog.KafkaLogCompaction.compact(s, out,
        tombstone = Some(get_json_object(col("value"), "$.msg") === "error"))
      out
    })

  /** Fifth fixture: the key-partitioned events log UNCOMPACTED, with
    * 'error' events carried as Kafka-style null-value tombstones (the
    * JSON writer omits null fields, so a tombstone payload is
    * `{"id":N,"ver":V}`) — the input for the STREAMING tombstone
    * upsert. Offsets are DENSE per partition (row_number in event_id
    * order) so the offset-unit admission cap admits the intended rows
    * per trigger — the round-9 lesson: raw event_ids as offsets left
    * stride-4 gaps, the n/4 cap admitted ¼ the intended rows, and the
    * differential paid ~16 micro-batches of pure per-batch overhead
    * instead of 4 (measured 9.4 s warm → 3.6 s after densifying). The
    * true event_id rides INSIDE the payload as `ver`, preserving the
    * exact global version order the oracle's arg_max implies; the
    * gapped (compacted-topic) offset shape keeps its deliberate
    * coverage in the fourth fixture and StateScaleSpec.
    */
  private val builtKeyed =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  def keyedEventsLog(s: SparkSession, dir: String): (String, Long) =
    builtKeyed.computeIfAbsent(dir, _ => {
      val out = s"/tmp/graft_kafkalog/${new java.io.File(dir).getName}/events_keyed"
      KafkaLog.fs(out).delete(new Path(out), true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("partition").orderBy("event_id")
      KafkaLog.write(Tables.t(s, dir, "events")
        .select((col("user_id") % 4).cast("int").as("partition"),
          col("event_id"), col("user_id"), col("event_type"))
        .select(col("partition"),
          (row_number().over(w).cast("long") - 1).as("offset"),
          to_json(struct(col("user_id").as("id"),
            when(col("event_type") === "error", lit(null).cast("string"))
              .otherwise(col("event_type")).as("msg"),
            col("event_id").as("ver")))
            .as("value")), out)
      (out, Tables.t(s, dir, "events").count())
    })

  /** readStream through the source with a cap forcing ≥4 micro-batches
    * at any scale factor — the admission-control path is part of every
    * run of these differentials, not just of the spec.
    */
  private def stream(s: SparkSession, dir: String): DataFrame = {
    val (path, n) = eventsLog(s, dir)
    s.readStream.format("kafkalog")
      .option("maxOffsetsPerTrigger", math.max(1L, n / 4))
      .load(path)
  }

  /** The reference's lenient parse over the source frame, with the
    * GLOBAL version order reconstructed from the round-robin layout
    * (`offset * 4 + partition` = event_id) — dense per-partition offsets
    * alone would tie across partitions and break the cross-partition
    * latest-wins tiebreak the oracle's arg_max(_, event_id) implies.
    */
  private def parsedGlobal(s: SparkSession, dir: String) = {
    import s.implicits._
    Ingest.parseLenient(
      stream(s, dir).select(col("partition"), col("offset"), col("value")),
      jsonCol = "value", schema = Ingest.msgSchema,
      defaults = Map("id" -> lit(0L), "msg" -> lit("")))
      .select(col("id"), col("msg"),
        (col("offset") * 4 + col("partition")).cast("long").as("version"))
      .as[KeyedRecord]
  }

  private def drainToSink(s: SparkSession, src: org.apache.spark.sql.Dataset[KeyedRecord],
      sink: String, tws: Boolean): DataFrame = {
    s.catalog.dropTempView(sink)
    StreamingIngest.withStateShards(s, 8) {
      val updates =
        if (tws) StreamingIngest.latestWinsUpdatesTws(src)
        else StreamingIngest.latestWinsUpdates(src)
      val q = updates.writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
    }
    Ingest.latestWins(s.table(sink), keys = Seq("id"), version = Seq("version"))
      .select(col("id"), col("msg"), col("version"))
      .orderBy("id")
  }

  /** Second fixture: the events stream with EVENT TIME in the payload
    * (`us` = epoch micros), for the watermarked-window differential.
    */
  private val builtTimed =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  private val timedSchema = StructType(Seq(
    StructField("us", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def eventsTimedLog(s: SparkSession, dir: String): (String, Long) =
    builtTimed.computeIfAbsent(dir, _ => {
      val out = s"/tmp/graft_kafkalog/${new java.io.File(dir).getName}/events_timed"
      KafkaLog.fs(out).delete(new Path(out), true)
      val ev = Tables.t(s, dir, "events")
      KafkaLog.write(ev.select(
        (col("event_id") % 4).cast("int").as("partition"),
        expr("event_id div 4").as("offset"),
        to_json(struct(expr("ts_ns div 1000").as("us"), col("event_type"),
          col("value"))).as("value")), out)
      (out, ev.count())
    })

  /** On-disk snapshot row shape: the reference's `{"id","msg"}` payload
    * plus `version`, which the incremental fold needs (the reference
    * avoids persisting a version only by re-reading the whole topic
    * every run, `KafkaContext.java:57-59`).
    */
  val snapSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("msg", StringType),
    StructField("version", LongType)))

  /** Drain a streaming `(id, msg, version)` frame into a JSON-lines
    * snapshot directory, folding each micro-batch's delta into the
    * previous on-disk snapshot — the snapshot dir IS the state.
    *
    * Crash-safety: the fold never overwrites the generation it reads.
    * Each batch writes a NEW `gen-<batchId>` dir (Spark's committer
    * drops `_SUCCESS` on completion), and readers resolve the highest
    * generation WITH a `_SUCCESS` marker — a crash mid-write leaves an
    * uncommitted gen that readers skip, so some complete snapshot is
    * visible at every instant. This strictly improves on the
    * reference's delete-then-rewrite (`HadoopKafkaConsumer.java:92-101`),
    * whose crash window loses the snapshot and forces its whole-topic
    * re-read; here the checkpoint replays only the torn batch, which
    * rewrites its gen idempotently (latest-wins is max-by, and batch
    * ids are stable across restarts). Older gens are deleted only
    * after the new one commits. Per-batch cost is |keys| + |delta|.
    */
  def foldSnapshot(src: DataFrame, out: String, ckpt: String): Unit =
    graft.streaming.GenFold.fold(src, out, ckpt, snapSchema) { (prev, batch) =>
      Ingest.latestWins(
        prev.unionByName(batch.select("id", "msg", "version")),
        keys = Seq("id"), version = Seq("version"))
    }

  /** The latest COMMITTED snapshot generation (empty frame before the
    * first commit — or when every present gen is torn).
    */
  def readSnapshot(s: SparkSession, out: String): DataFrame =
    graft.streaming.GenFold.read(s, out, snapSchema)

  private val upsertOracle =
    """SELECT user_id AS id, arg_max(event_type, event_id) AS msg,
      |       max(event_id) AS version
      |FROM events GROUP BY user_id ORDER BY id""".stripMargin

  val all: Seq[GQuery] = Seq(

    GQuery(
      "streaming_kafkalog_duplex",
      (s, dir) => {
        // FULL-DUPLEX differential: the stream enters through the
        // kafkalog SOURCE, the latest-wins upsert emits per-key updates,
        // and the updates leave through the kafkalog SINK as a new
        // topic (producer-style offset assignment, epoch-keyed
        // exactly-once segment commits — KafkaLogSink). The OUTPUT
        // topic is then read back and folded latest-wins; the oracle is
        // the same batch arg_max as streaming_kafkalog_upsert, so any
        // sink-side loss, duplication, or reorder that latest-wins
        // cannot absorb fails the hash compare. This is the
        // stream→transform→stream shape a production deployment runs
        // between two topics, executed offline on Spark's real source
        // AND sink machinery.
        import s.implicits._
        val out = s"/tmp/graft_kafkalog/${new java.io.File(dir).getName}/duplex_out"
        val f = KafkaLog.fs(out)
        f.delete(new Path(out), true)
        f.delete(new Path(out + ".ck"), true)
        StreamingIngest.withStateShards(s, 8) {
          val q = StreamingIngest.latestWinsUpdates(parsedGlobal(s, dir))
            .select((col("id") % 4).cast("int").as("partition"),
              col("version").as("offset"),
              to_json(struct(col("id"), col("msg"), col("version"))).as("value"))
            .writeStream.format("kafkalog")
            // fMGWS emits per-key UPDATES; to a log sink every update is
            // simply appended as a new record (Kafka-producer semantics)
            .outputMode("update")
            .option("path", out)
            .option("checkpointLocation", out + ".ck")
            .start()
          try q.processAllAvailable() finally q.stop()
        }
        Ingest.latestWins(
            s.read.format("kafkalog").load(out)
              .select(from_json(col("value"), snapSchema).as("r"))
              .select(col("r.id"), col("r.msg"), col("r.version")),
            keys = Seq("id"), version = Seq("version"))
          .select(col("id"), col("msg"), col("version"))
          .orderBy("id")
      },
      Some(upsertOracle)),

    GQuery(
      "streaming_kafkalog_upsert",
      (s, dir) => {
        // The streaming_latest_upsert differential with ingest through
        // the kafkalog SOURCE: Spark plans each micro-batch from the
        // source's own latestOffset(start, limit) admission decisions
        // and offset serde, then the flatMapGroupsWithState upsert runs
        // unchanged. Same oracle, so any drift introduced by the source
        // machinery (lost/duplicated offset spans, broken per-partition
        // order) fails the hash compare.
        drainToSink(s, parsedGlobal(s, dir), "kafkalog_upsert_sink", tws = false)
      },
      Some(upsertOracle)),

    GQuery(
      "streaming_kafkalog_tws_upsert",
      (s, dir) => {
        // Same replay through the transformWithState + RocksDB form —
        // the modern state API certified against the identical batch
        // oracle with the real source in front of it.
        import s.implicits._
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          drainToSink(s, parsedGlobal(s, dir), "kafkalog_tws_upsert_sink", tws = true)
            .localCheckpoint()
        } finally {
          prev match {
            case Some(v) => s.conf.set(providerKey, v)
            case None => s.conf.unset(providerKey)
          }
        }
      },
      Some(upsertOracle)),

    GQuery(
      "streaming_kafkalog_windowed",
      (s, dir) => {
        // EVENT-TIME through the source: the watermarked tumbling-window
        // differential (same oracle as streaming_windowed_counts /
        // time_tumbling) with the bulk entering through kafkalog under
        // an admission cap — windows now close against a watermark that
        // advances across source-driven micro-batches. Tail windows are
        // forced closed by the established sentinel-union protocol (a
        // tiny MemoryStream unioned with the source stream; union of
        // two streaming sources, each tracking its own offsets — the
        // sentinel rows are the only driver-side data).
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val (path, n) = eventsTimedLog(s, dir)
        val maxUs = Tables.t(s, dir, "events")
          .agg(max(expr("ts_ns div 1000"))).head().getLong(0)
        val bulk = s.readStream.format("kafkalog")
          .option("maxOffsetsPerTrigger", math.max(1L, n / 4))
          .load(path)
          .select(from_json(col("value"), timedSchema).as("j"))
          .select(timestamp_micros(col("j.us")).as("ts"),
            col("j.event_type").as("event_type"), col("j.value").as("value"))
        val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
        val src = bulk.union(ms.toDF().toDF("ts", "event_type", "value"))
        s.catalog.dropTempView("klw_sink")
        StreamingIngest.withStateShards(s, 8) {
          val q = StreamingIngest.windowedCounts(src,
              eventTimeCol = "ts", delay = "10 minutes", window0 = "1 hour")
            .writeStream.format("memory").queryName("klw_sink")
            .outputMode("append").start()
          try {
            q.processAllAvailable() // the kafkalog bulk, in >=4 batches
            (1 to 2).foreach { i =>
              ms.addData((new java.sql.Timestamp(maxUs / 1000 + i * 7200000L),
                "___wm", 0.0))
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        s.table("klw_sink")
          .where(col("event_type") =!= "___wm")
          .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"), round(col("sv"), 2).as("sv"))
          .orderBy("ws", "event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
             |       event_type, count(*) AS n, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)),

    GQuery(
      "streaming_kafkalog_snapshot",
      (s, dir) => {
        // The reference's COMPLETE job as one streaming pipeline: Kafka
        // (kafkalog source, admission-controlled) → lenient JSON parse →
        // latest-wins → JSON-lines snapshot directory on HDFS
        // (`HadoopKafkaConsumer.java:92-101` delete-then-write). The
        // snapshot dir IS the state, exactly as in the reference — no
        // in-memory store: each micro-batch folds its delta into the
        // previous on-disk snapshot (read → union → latest-wins →
        // localCheckpoint to cut lineage → overwrite), so per-batch cost
        // is |keys| + |delta|, the scalable form of the reference's
        // re-read-from-offset-0-per-run. The persisted rows carry
        // `version` alongside the reference's {"id","msg"} payload —
        // the reference needs no version on disk only because it
        // re-reads the whole topic every run.
        import java.nio.file.Files
        val out = Files.createTempDirectory("klsnap_out").toString
        val ckpt = Files.createTempDirectory("klsnap_ckpt").toString
        KafkaLogOps.foldSnapshot(parsedGlobal(s, dir).toDF, out, ckpt)
        KafkaLogOps.readSnapshot(s, out)
          .select(col("id"), to_json(struct(col("id"), col("msg"))).as("json"))
          .orderBy("id")
      },
      Some("""SELECT user_id AS id,
             |       '{"id":' || user_id || ',"msg":"' || arg_max(event_type, event_id) || '"}' AS json
             |FROM events GROUP BY user_id ORDER BY id""".stripMargin)),

    GQuery(
      "kafkalog_batch_range",
      (s, dir) => {
        // Bounded batch read — the Kafka source's startingOffsets /
        // endingOffsets JSON plus the reference's `kafka.limit`
        // per-partition record cap (`KafkaInputFormat.java:131,188`)
        // enforced in the kafkalog record reader. The offset window
        // [25,150) and cap 100 both bind at every shipped scale factor
        // (smallest log has 250 offsets/partition), and the dense layout
        // makes the oracle exact: offset o of partition p is event_id
        // 4o+p, and the cap keeps the FIRST 100 offsets of the window
        // (row_number over offset order).
        val (path, _) = eventsLog(s, dir)
        s.read.format("kafkalog")
          .option("startingOffsets", """{"0":25,"1":25,"2":25,"3":25}""")
          .option("endingOffsets", """{"0":150,"1":150,"2":150,"3":150}""")
          .option("limit", 100)
          .load(path)
          .select(col("partition"), col("offset"),
            get_json_object(col("value"), "$.id").cast("long").as("id"),
            get_json_object(col("value"), "$.msg").as("msg"))
          .orderBy("partition", "offset")
      },
      Some("""SELECT partition, "offset", id, msg FROM (
             |  SELECT (event_id % 4)::INT AS partition, (event_id // 4) AS "offset",
             |         user_id AS id, event_type AS msg,
             |         row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id // 4) AS rn
             |  FROM events WHERE (event_id // 4) >= 25 AND (event_id // 4) < 150
             |) WHERE rn <= 100 ORDER BY partition, "offset"""".stripMargin)),

    GQuery(
      "kafkalog_batch_scan",
      (s, dir) => {
        // Batch leg of the same source feeding the reference's EXACT
        // per-partition-scoped dedup (`KafkaContext.java:103`): because
        // the log partitions by event_id, one user's records land in
        // several partitions and the scoped snapshot keeps one row per
        // (partition, user) — a different answer from the global dedup,
        // which is the point of covering both.
        val (path, _) = eventsLog(s, dir)
        val frame = s.read.format("kafkalog").load(path)
        graft.sources.Sources.kafkaShapedToSnapshot(frame, scoped = true)
          .select(col("partition"), col("id"), col("msg"))
          .orderBy("partition", "id")
      },
      Some("""SELECT (event_id % 4)::INT AS partition, user_id AS id,
             |       arg_max(event_type, event_id) AS msg
             |FROM events GROUP BY 1, 2 ORDER BY partition, id""".stripMargin)),

    GQuery(
      "kafkalog_compact_stats",
      (s, dir) => {
        // LOG COMPACTION (Kafka's cleaner as a Spark maintenance job,
        // KafkaLogCompaction): the per-partition report — records before
        // vs after keeping only the highest-offset record per
        // (partition, key) — is fully oracle-able, because the survivor
        // count per partition is exactly the distinct-key count. Any
        // record the cleaner wrongly retains or drops changes a count
        // and fails the hash compare.
        import s.implicits._
        val (_, report) = compactedEventsLog(s, dir)
        report.map(r => (r.partition.toLong, r.before, r.after))
          .toDF("partition", "n_before", "n_after")
          .orderBy("partition")
      },
      Some("""SELECT event_id % 4 AS partition, count(*) AS n_before,
             |       count(DISTINCT user_id) AS n_after
             |FROM events GROUP BY 1 ORDER BY partition""".stripMargin)),

    GQuery(
      "kafkalog_compacted_scan",
      (s, dir) => {
        // Replay AFTER compaction: the global latest-wins fold over the
        // compacted log must equal the fold over full history (the
        // compaction-correctness invariant — per-partition argmax
        // survives the cleaner, and the global argmax is the max of the
        // per-partition ones). Offsets are preserved across compaction,
        // so the version reconstruction offset*4+partition (= event_id)
        // still yields the original global order. Same oracle as the
        // full-history upsert differentials, sharpened by n_records:
        // each key's surviving record count per partition is exactly 1,
        // so the per-user record count in the compacted log equals the
        // number of DISTINCT partitions the user's events landed in —
        // wrongly retained duplicates fail the count even when
        // latest-wins would absorb them.
        val (path, _) = compactedEventsLog(s, dir)
        val parsed = s.read.format("kafkalog").load(path)
          .select(
            get_json_object(col("value"), "$.id").cast("long").as("id"),
            get_json_object(col("value"), "$.msg").as("msg"),
            (col("offset") * 4 + col("partition")).cast("long").as("version"))
        val counts = parsed.groupBy("id").agg(count(lit(1)).as("n_records"))
        Ingest.latestWins(parsed, keys = Seq("id"), version = Seq("version"))
          .select(col("id"), col("msg"), col("version"))
          .join(counts, "id")
          .orderBy("id")
      },
      Some("""SELECT user_id AS id, arg_max(event_type, event_id) AS msg,
             |       max(event_id) AS version,
             |       count(DISTINCT event_id % 4) AS n_records
             |FROM events GROUP BY user_id ORDER BY id""".stripMargin)),

    GQuery(
      "kafkalog_tombstone_scan",
      (s, dir) => {
        // TOMBSTONE COMPACTION end-to-end: the key-partitioned log is
        // compacted with 'error' payloads as deletes; replaying the
        // compacted log must show exactly the users whose LATEST record
        // is not a tombstone, each with that latest state. Because the
        // layout is key-partitioned (the compacted-topic contract),
        // per-partition tombstoning IS the global semantics — the
        // oracle is the full-history argmax with a HAVING over the
        // winner. A cleaner that drops an overtaken tombstone's key, or
        // keeps a tombstoned one, changes the row set and fails.
        val path = tombstonedEventsLog(s, dir)
        val parsed = s.read.format("kafkalog").load(path)
          .select(
            get_json_object(col("value"), "$.id").cast("long").as("id"),
            get_json_object(col("value"), "$.msg").as("msg"),
            col("offset").cast("long").as("version"))
        Ingest.latestWins(parsed, keys = Seq("id"), version = Seq("version"))
          .select(col("id"), col("msg"), col("version"))
          .orderBy("id")
      },
      Some("""SELECT user_id AS id, arg_max(event_type, event_id) AS msg,
             |       CAST(max(event_id) AS BIGINT) AS version
             |FROM events GROUP BY user_id
             |HAVING arg_max(event_type, event_id) <> 'error'
             |ORDER BY id""".stripMargin)),

    GQuery(
      "streaming_versioned_sink",
      (s, dir) => {
        // STREAM → VERSIONED TABLE, exactly-once: each micro-batch
        // lands as one replay-stamped commit
        // (VersionedTable.appendStream, txn:<query>:<batch> in the
        // manifest), and after the drain the differential INJECTS the
        // crash case — re-submitting the last batch id with different
        // rows — which must be skipped. The final table then equals
        // full history exactly: a duplicated batch inflates a count, a
        // skipped-but-should-commit batch deflates one, and either
        // fails the hash. This is the lakehouse sink contract
        // (foreachBatch + transactional writer identity) driven by the
        // real source's admission loop (≥4 micro-batches).
        import graft.sources.VersionedTable
        val (path, n) = eventsLog(s, dir)
        val root = s"/tmp/graft_vtab/${new java.io.File(dir).getName}/events_stream"
        val f = new Path(root).getFileSystem(new org.apache.hadoop.conf.Configuration())
        f.delete(new Path(root), true)
        val src = s.readStream.format("kafkalog")
          .option("maxOffsetsPerTrigger", math.max(1L, n / 4))
          .load(path)
          .select(
            get_json_object(col("value"), "$.id").cast("long").as("id"),
            get_json_object(col("value"), "$.msg").as("msg"))
        @volatile var lastBatch = -1L
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
            VersionedTable.appendStream(batch.toDF(), root, "vsink", bid)
            lastBatch = math.max(lastBatch, bid)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        val replayed = VersionedTable.appendStream(
          s.range(5).select(col("id"), lit("dup").as("msg")), root, "vsink", lastBatch)
        VersionedTable.read(s, root)
          .groupBy("msg")
          .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("n_users"))
          .withColumn("replay_skipped", lit(replayed.isEmpty))
          .orderBy("msg")
      },
      Some("""SELECT event_type AS msg, CAST(count(*) AS BIGINT) AS n,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |       true AS replay_skipped
             |FROM events GROUP BY 1 ORDER BY msg""".stripMargin)),

    GQuery(
      "streaming_scd2_enrich",
      (s, dir) => {
        // STREAM-STATIC POINT-IN-TIME ENRICHMENT: each streamed record
        // joins the SCD2 dimension version VALID AT ITS OWN version
        // (equi on the key + validity-range residual) — the streaming
        // twin of join_point_in_time, and the lookup every streaming
        // feature pipeline needs to avoid future leakage (enriching
        // with today's dim row would leak state the model couldn't
        // have known). The static side is broadcast into every
        // micro-batch: at 100 TB of DIM the answer is a key-partitioned
        // dim with a stream-stream interval join or a state-store
        // lookup; at the normal dims-are-small scale, broadcast is the
        // plan you want. The oracle replays the same interval join in
        // batch over full history — a record matched to a past or
        // future version (off-by-one on either validity bound) fails
        // the hash.
        import s.implicits._
        val scd2 = graft.SparkEntry.queries("ingest_scd2")(s, dir)
          .select(col("user_id").as("d_user"), col("event_type").as("state"),
            col("eff_from"), col("eff_to"))
        val enriched = parsedGlobal(s, dir).toDF()
          .join(broadcast(scd2),
            col("id") === col("d_user") &&
              col("version") >= col("eff_from") &&
              (col("eff_to").isNull || col("version") < col("eff_to")))
          .select(col("version").as("event_id"), col("id").as("user_id"),
            col("state"))
        val sink = "scd2_enrich_sink"
        s.catalog.dropTempView(sink)
        val q = enriched.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(sink).orderBy("event_id").localCheckpoint()
      },
      Some("""WITH o AS (SELECT user_id, ts, event_id, event_type,
             |                  lag(event_type) OVER (PARTITION BY user_id
             |                     ORDER BY ts, event_id) AS prev
             |           FROM events),
             |     c AS (SELECT user_id, ts, event_id, event_type FROM o
             |           WHERE prev IS NULL OR prev <> event_type),
             |     scd AS (SELECT user_id, event_type AS state,
             |                    event_id AS eff_from,
             |                    lead(event_id) OVER (PARTITION BY user_id
             |                       ORDER BY ts, event_id) AS eff_to
             |             FROM c)
             |SELECT e.event_id, e.user_id, s.state
             |FROM events e JOIN scd s ON e.user_id = s.user_id
             |  AND e.event_id >= s.eff_from
             |  AND (s.eff_to IS NULL OR e.event_id < s.eff_to)
             |ORDER BY e.event_id""".stripMargin)),

    GQuery(
      "streaming_kafkalog_tombstone_upsert",
      (s, dir) => {
        // STREAMING tombstone upsert (transformWithState + RocksDB):
        // the uncompacted key-partitioned log replays through the
        // tombstone-aware latest-wins processor under an admission cap
        // (≥4 micro-batches), so deletes arrive INTERLEAVED with
        // upserts across batches. State holds only the live value or
        // the tiny delete marker per key; the final snapshot (fold of
        // the update log, tombstone rows applied as deletes) must equal
        // the full-history argmax with tombstoned winners absent — the
        // same oracle the batch compaction differential uses, now
        // certified through the streaming state machine.
        import s.implicits._
        val (path, n) = keyedEventsLog(s, dir)
        val src = s.readStream.format("kafkalog")
          .option("maxOffsetsPerTrigger", math.max(1L, n / 4))
          .load(path)
          .select(
            get_json_object(col("value"), "$.id").cast("long").as("id"),
            get_json_object(col("value"), "$.msg").as("msg"),
            get_json_object(col("value"), "$.ver").cast("long").as("version"))
          .as[StreamingIngest.KeyedRecord]
        val sink = "kafkalog_tombstone_upsert_sink"
        s.catalog.dropTempView(sink)
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          StreamingIngest.withStateShards(s, 8) {
            val q = StreamingIngest.latestWinsUpdatesTombstonesTws(src)
              .writeStream.format("memory").queryName(sink)
              .outputMode("update").start()
            try q.processAllAvailable() finally q.stop()
          }
        } finally {
          prev match {
            case Some(v) => s.conf.set(providerKey, v)
            case None => s.conf.unset(providerKey)
          }
        }
        Ingest.latestWins(s.table(sink), keys = Seq("id"), version = Seq("version"))
          .where(col("msg").isNotNull) // final tombstone = deleted key
          .select(col("id"), col("msg"), col("version"))
          .orderBy("id")
          .localCheckpoint()
      },
      Some("""SELECT user_id AS id, arg_max(event_type, event_id) AS msg,
             |       CAST(max(event_id) AS BIGINT) AS version
             |FROM events GROUP BY user_id
             |HAVING arg_max(event_type, event_id) <> 'error'
             |ORDER BY id""".stripMargin)))
}
