package graft.sources.kafkalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

import java.nio.charset.StandardCharsets

/** The WRITE half of the `kafkalog` format: a micro-batch streaming sink
  * with Kafka-producer semantics — the sink, not the caller, assigns
  * offsets — and exactly-once delivery via epoch-keyed idempotent segment
  * commits. With the read half this makes the format full duplex, so
  * stream→transform→stream pipelines (the shape a real deployment runs
  * between Kafka topics) execute offline against Spark's real sink
  * machinery: epoch tracking, task commit messages, driver commit/abort,
  * and replay after restart.
  *
  * Protocol per epoch E:
  *  1. each task buffers its rows, groups by log partition, sorts by the
  *     incoming `offset` column (an intra-epoch ORDERING hint only — real
  *     offsets are assigned by the log, like a broker), computes the
  *     partition's current end offset from the VISIBLE segments, and
  *     writes a hidden temp segment `p=<p>/.e<E>_t<task>.tmp` with
  *     contiguous assigned offsets;
  *  2. the driver's `commit(E)` makes temps visible as `p=<p>/e<E>`
  *     (12-digit padded, so segment name order = epoch order = offset
  *     order). The rename is the atomicity point. If the target already
  *     exists — epoch E replayed after a restart that had already
  *     committed — the temp is discarded: EXACTLY-ONCE by idempotence,
  *     the same mechanism Spark's own file sinks use (an epoch-keyed
  *     transaction log), not a distributed transaction.
  *
  * The write declares `RequiresDistributionAndOrdering` (clustered by
  * `partition`, ordered by `partition, offset`), so Spark itself routes
  * all rows of a log partition to one task — offset assignment needs no
  * coordination. If a planner ever ignores the requirement, the driver
  * falls back to a commit-time merge: temps for the same partition are
  * concatenated in task order with offsets REASSIGNED contiguously —
  * correct, driver-IO-proportional to that epoch only, and loud in the
  * logs. Readers never see temps: the scan's segment listing skips
  * dot-prefixed names.
  *
  * Reference provenance: the reference's pipeline END is an HDFS text
  * snapshot it rebuilds from scratch each run
  * (`HadoopKafkaConsumer.java:92-101`); this sink is the incremental,
  * replay-safe form of "the job's output is a log another job consumes".
  */
object KafkaLogSink {

  private[kafkalog] def segName(epochId: Long): String = f"e$epochId%012d"

  private[kafkalog] case class SegmentCommit(partition: Int, tempPath: String,
      base: Long, rows: Long) extends WriterCommitMessage

  /** Validate the incoming schema and return (partitionIdx, offsetIdx,
    * valueIdx, partitionIsLong).
    */
  private[kafkalog] def resolveSchema(schema: StructType): (Int, Int, Int, Boolean) = {
    def idx(n: String) = schema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
    val (p, o, v) = (idx("partition"), idx("offset"), idx("value"))
    require(p >= 0 && o >= 0 && v >= 0,
      s"kafkalog sink needs (partition, offset, value) columns, got ${schema.simpleString}")
    val pLong = schema.fields(p).dataType match {
      case IntegerType => false
      case LongType => true
      case other => throw new IllegalArgumentException(
        s"kafkalog sink: partition must be int or bigint, got $other")
    }
    (p, o, v, pLong)
  }

  /** The builder accepts Update-mode streams via the same marker the
    * built-in Kafka sink uses: to a LOG, an update is just an appended
    * record (producer semantics), so Update-as-Append is exactly right.
    */
  class KafkaLogWriteBuilder(dir: String, info: LogicalWriteInfo) extends WriteBuilder
      with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
    override def build(): Write = new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.column("partition")))
      override def requiredOrdering(): Array[SortOrder] = Array(
        Expressions.sort(Expressions.column("partition"), SortDirection.ASCENDING),
        Expressions.sort(Expressions.column("offset"), SortDirection.ASCENDING))
      override def toStreaming: StreamingWrite =
        new KafkaLogStreamingWrite(dir, info.schema())
      // batch APPEND (`df.write.format("kafkalog")` / SQL `INSERT INTO`
      // on a kafkalog catalog table): same task protocol, the committed
      // segment takes the next index in each partition's `e` namespace
      // so segment-name order remains offset order
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new KafkaLogBatchWrite(dir, info.schema(), info.queryId())
    }
  }

  class KafkaLogStreamingWrite(dir: String, schema: StructType)
      extends StreamingWrite {
    resolveSchema(schema) // fail at plan time, not first epoch

    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new KafkaLogWriterFactory(dir, schema)

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      flattenMsgs(messages).groupBy(_.partition).toSeq.sortBy(_._1).foreach {
        case (p, msgs) => publish(dir, p, msgs, segName(epochId))
      }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val f = KafkaLog.fs(dir)
      flattenMsgs(messages).foreach(m => f.delete(new Path(m.tempPath), false))
    }
  }

  class KafkaLogWriterFactory(dir: String, schema: StructType)
      extends StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      new KafkaLogDataWriter(dir, schema, taskId, s"e$epochId")
  }

  class KafkaLogBatchWriterFactory(dir: String, schema: StructType,
      queryId: String) extends org.apache.spark.sql.connector.write.DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new KafkaLogDataWriter(dir, schema, taskId, s"q$queryId")
  }

  /** Buffers the task's rows per log partition, then writes one hidden
    * temp segment per partition with assigned offsets. Buffering is
    * in-memory: a micro-batch epoch's per-task slice is admission-bounded
    * (the source's `maxOffsetsPerTrigger` is the knob that keeps it so).
    */
  class KafkaLogDataWriter(dir: String, schema: StructType, taskId: Long,
      tag: String) extends DataWriter[InternalRow] {
    private val (pIdx, oIdx, vIdx, pLong) = resolveSchema(schema)
    private val buf =
      scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[(Long, String)]]

    override def write(row: InternalRow): Unit = {
      val p = if (pLong) row.getLong(pIdx).toInt else row.getInt(pIdx)
      val o = if (row.isNullAt(oIdx)) Long.MaxValue else row.getLong(oIdx)
      val v = if (row.isNullAt(vIdx)) "" else row.getUTF8String(vIdx).toString
      buf.getOrElseUpdate(p, scala.collection.mutable.ArrayBuffer.empty) += ((o, v))
    }

    override def commit(): WriterCommitMessage = {
      val f = KafkaLog.fs(dir)
      val commits = buf.toSeq.sortBy(_._1).map { case (p, rows) =>
        val segs = KafkaLog.listPartitions(dir)
          .find(_._1 == p).map(_._2).getOrElse(Seq.empty)
        val base = if (segs.isEmpty) 0L else KafkaLog.endOffset(segs)
        val temp = new Path(s"$dir/p=$p/.${tag}_t$taskId.tmp")
        f.mkdirs(temp.getParent)
        val out = f.create(temp, true)
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8))
        try {
          // stable sort on the incoming offset hint: ties keep task order
          rows.sortInPlaceBy(_._1)
          var i = 0L
          rows.foreach { case (_, v) =>
            val b64 = java.util.Base64.getEncoder
              .encodeToString(v.getBytes(StandardCharsets.UTF_8))
            w.write(s"${base + i}\t$b64"); w.newLine()
            i += 1
          }
          w.flush()
        } finally out.close()
        SegmentCommit(p, temp.toString, base, rows.size.toLong)
      }
      // one task normally owns whole partitions (clustered distribution),
      // so a single message per partition suffices; multiple partitions
      // in one task → multiple messages folded into one carrier
      commits match {
        case Seq(one) => one
        case many => MultiCommit(many)
      }
    }

    override def abort(): Unit = {
      val f = KafkaLog.fs(dir)
      buf.keys.foreach { p =>
        f.delete(new Path(s"$dir/p=$p/.${tag}_t$taskId.tmp"), false)
      }
    }

    override def close(): Unit = buf.clear()
  }

  private[kafkalog] case class MultiCommit(parts: Seq[SegmentCommit])
      extends WriterCommitMessage

  private[kafkalog] def flattenMsgs(messages: Array[WriterCommitMessage]): Seq[SegmentCommit] =
    messages.toSeq.flatMap {
      case m: SegmentCommit => Seq(m)
      case MultiCommit(parts) => parts
      case _ => Seq.empty
    }

  /** Make one partition's temp segments visible under `targetName`.
    * Target exists → replayed epoch, temps dropped (idempotence). One
    * temp → atomic rename (fast path). Several temps → driver-side merge
    * in task order with offsets reassigned contiguously (the fallback
    * when clustered distribution was not applied). Always guards the
    * segment-name invariant: the new name must sort AFTER every visible
    * segment, since name order IS offset order to the reader — appending
    * into a dir with foreign-named segments (e.g. a fixture-written log)
    * fails loudly here instead of corrupting reads.
    */
  private[kafkalog] def publish(dir: String, p: Int,
      msgs: Seq[SegmentCommit], targetName: String): Unit = {
    val f = KafkaLog.fs(dir)
    val target = new Path(s"$dir/p=$p/$targetName")
    if (f.exists(target)) {
      msgs.foreach(m => f.delete(new Path(m.tempPath), false))
      return
    }
    val existing = KafkaLog.listPartitions(dir)
      .find(_._1 == p).map(_._2).getOrElse(Seq.empty)
      .map(s => new Path(s).getName)
    existing.filter(_ >= targetName).foreach { n =>
      msgs.foreach(m => f.delete(new Path(m.tempPath), false))
      throw new IllegalStateException(
        s"kafkalog sink: segment '$n' in p=$p would sort at/after new " +
          s"segment '$targetName' — name order must equal offset order; " +
          "append only to sink-managed logs")
    }
    if (msgs.length == 1) {
      require(f.rename(new Path(msgs.head.tempPath), target),
        s"kafkalog sink: could not publish $target")
    } else {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"kafkalog sink: ${msgs.length} writers for partition $p — merging " +
          "at commit (clustered distribution was not applied)")
      var next = if (existing.isEmpty) 0L
        else KafkaLog.endOffset(KafkaLog.listPartitions(dir)
          .find(_._1 == p).map(_._2).getOrElse(Seq.empty))
      val out = f.create(target, false)
      try {
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8))
        msgs.sortBy(_.tempPath).foreach { m =>
          val in = f.open(new Path(m.tempPath))
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
          try {
            var line = r.readLine()
            while (line != null) {
              val tab = line.indexOf('\t')
              w.write(s"$next${line.substring(tab)}"); w.newLine()
              next += 1
              line = r.readLine()
            }
          } finally r.close()
        }
        w.flush()
      } finally out.close()
      msgs.foreach(m => f.delete(new Path(m.tempPath), false))
    }
  }

  /** Batch append: the same task protocol as the streaming sink; at
    * commit each partition's segment takes the next index in its `e`
    * namespace (computed from the visible segments), so batch and
    * streaming appends interleave without breaking the name-order =
    * offset-order invariant. No epoch log exists for batch jobs, so a
    * job-level retry re-appends — batch INSERT is at-least-once, exactly
    * like INSERT into any append-only table; the streaming path is the
    * exactly-once one.
    */
  class KafkaLogBatchWrite(dir: String, schema: StructType, queryId: String)
      extends org.apache.spark.sql.connector.write.BatchWrite {
    resolveSchema(schema)

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.DataWriterFactory =
      new KafkaLogBatchWriterFactory(dir, schema, queryId)

    override def commit(messages: Array[WriterCommitMessage]): Unit =
      flattenMsgs(messages).groupBy(_.partition).toSeq.sortBy(_._1).foreach {
        case (p, msgs) =>
          val existing = KafkaLog.listPartitions(dir)
            .find(_._1 == p).map(_._2).getOrElse(Seq.empty)
            .map(s => new Path(s).getName)
          val EName = "e(\\d{12})".r
          val nextIdx = existing.collect { case EName(n) => n.toLong + 1 }
            .foldLeft(0L)(math.max)
          publish(dir, p, msgs, segName(nextIdx))
      }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val f = KafkaLog.fs(dir)
      flattenMsgs(messages).foreach(m => f.delete(new Path(m.tempPath), false))
    }
  }
}
