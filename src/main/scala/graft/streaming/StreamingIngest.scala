package graft.streaming

import graft.operators.Ingest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Structured Streaming form of the reference job (SURVEY.md §7 step 3,
  * BASELINE.json north star: "Structured Streaming Kafka source + HDFS
  * sink").
  *
  * The reference re-reads the whole topic per run and overwrites the HDFS
  * snapshot (`KafkaContext.java:57-59`, `HadoopKafkaConsumer.java:139-148`).
  * Streaming makes that incremental: the same latest-wins semantics as a
  * continuously-maintained state, with three tiers:
  *
  *  1. `dedupWithinWatermark` — drop duplicate keys inside the watermark
  *     horizon (bounded state, the cheap tier);
  *  2. `latestWinsUpdates` — true latest-wins upsert via
  *     `flatMapGroupsWithState`: emits a key only when a strictly newer
  *     version arrives (exact reference semantics, made incremental);
  *  3. `snapshotSink` — `foreachBatch` + overwrite: the honest streaming
  *     equivalent of the reference's delete-then-write snapshot.
  *
  * Kafka-shaped input: any streaming DataFrame with
  * `(partition INT, offset LONG, value STRING)` columns — exactly what
  * `spark.readStream.format("kafka")` yields after
  * `value.cast("string")`; tests drive it with a MemoryStream so no
  * broker is needed.
  */
object StreamingIngest {

  /** Run `body` (which starts and drains a streaming query) with
    * `spark.sql.shuffle.partitions` capped at `n`, restoring the prior
    * value after. Streaming state sharding is fixed at the FIRST batch
    * by this conf (it persists in the checkpoint), so it is a deliberate
    * sizing decision, not something to inherit from the batch session:
    * each state partition pays a store open/commit per micro-batch, and
    * a job whose live-key cardinality is thousands gains nothing from
    * hundreds of shards. On a production cluster you'd size it to
    * key-cardinality / executor count; the differential queries here cap
    * it so local[32] doesn't pay 32 store commits per 1-row sentinel
    * batch. Restores BEFORE the returned batch DataFrame executes, so
    * only the stream is affected.
    *
    * Not reentrant across threads: the cap is a read-modify-write of the
    * SESSION-shared conf, so two concurrent `withStateShards` on one
    * session could restore the wrong value. Calls are serialized on the
    * session; queries from OTHER threads reading the conf mid-body still
    * see the capped value (Verify/Bench/specs run the registry
    * single-threaded, so this never bites in practice).
    */
  def withStateShards[T](s: SparkSession, n: Int)(body: => T): T = s.synchronized {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    // A non-numeric conf (possible via user override) must degrade to
    // no-op, not throw before the query even starts.
    val capped = prev.toIntOption.map(p => math.min(p, n))
    capped.foreach(c => s.conf.set(key, c.toString))
    try body finally if (capped.isDefined) s.conf.set(key, prev)
  }

  /** One keyed record in flight: payload + version (the Kafka offset in
    * the reference, `KafkaMessageWithOffset.java:11-13`).
    */
  case class KeyedRecord(id: Long, msg: String, version: Long)

  /** Parse the Kafka-shaped frame into KeyedRecords with reference-lenient
    * semantics (malformed JSON dropped, missing fields defaulted —
    * `MyKafkaMessage.java:9-12`). Works on batch or streaming frames.
    */
  def parseKafkaShaped(df: DataFrame): DataFrame =
    Ingest.parseLenient(
      df.select(col("partition"), col("offset"), col("value")),
      jsonCol = "value",
      schema = Ingest.msgSchema,
      defaults = Map("id" -> lit(0L), "msg" -> lit("")))
      .select(col("id"), col("msg"), col("offset").as("version"))

  /** Tier 1: streaming dedup with bounded state — keeps the first row per
    * key within the watermark horizon, state expired afterwards. Needs an
    * event-time column `eventTime` on the frame.
    */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String, delay: String, keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Tier 2: exact latest-wins upsert stream. Emits `(id, msg, version)`
    * whenever a strictly newer version arrives for a key; state holds one
    * record per live key (the 100 TB design point: state is O(live keys),
    * not O(events), and Spark's HDFS/RocksDB state store shards it by the
    * grouping key across executors).
    */
  def latestWinsUpdates(ds: Dataset[KeyedRecord]): Dataset[KeyedRecord] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.id)
      .flatMapGroupsWithState[KeyedRecord, KeyedRecord](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, recs: Iterator[KeyedRecord], state: GroupState[KeyedRecord]) =>
          // max_by(version) within the batch, tie-broken on msg for determinism
          val incoming = recs.maxByOption(r => (r.version, r.msg))
          val best = (incoming.toSeq ++ state.getOption.toSeq)
            .maxByOption(r => (r.version, r.msg))
          best match {
            case Some(b) if !state.getOption.exists(_.version >= b.version) =>
              state.update(b)
              Iterator.single(b)
            case _ => Iterator.empty
          }
      }
  }

  /** One (band-bucket, document) event of the streaming near-dup
    * filter: the LSH band key, the doc id, and the 32-hash portable
    * MinHash signature.
    */
  case class BandedDoc(bk: String, doc_id: Long, mh: Seq[Long])

  /** Per-bucket state of the streaming near-dup filter: every doc seen
    * in this band bucket (parallel id/signature seqs — flat encoders).
    */
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  case class DupHit(doc_id: Long, dup_of: Long, agree: Double)

  /** STREAMING near-duplicate detection — the online form of
    * MinHash-LSH dedup for incremental corpus ingestion: state is the
    * per-band-bucket membership, and each arriving document is checked
    * only against its own buckets' members (never the corpus). A doc
    * is flagged when a smaller-id bucket-mate agrees on >= `minAgree`
    * of the 32 signature positions; the flag names the SMALLEST such
    * id. Events are id-sorted within each group invocation and state
    * retains all members, so the result is arrival-order-independent
    * WITHIN a batch and invariant under any id-monotonic batch cut —
    * the ingestion contract (doc ids are assigned monotonically at
    * ingestion, so later batches only carry larger ids). Under that
    * contract a batch SQL oracle replays the stream exactly; a
    * smaller-id partner arriving in a LATER batch would not retro-flag
    * the already-emitted doc (append sinks can't retract).
    *
    * Scale: state per bucket is O(bucket occupancy) signatures (32
    * longs each, never the documents); at 100 TB you bound it with a
    * state TTL (forget buckets idle past the dedup horizon) or switch
    * the store to RocksDB — both are configuration, not redesign.
    */
  def nearDupHits(ds: Dataset[BandedDoc], minAgree: Double): Dataset[DupHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.bk)
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, recs: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Vector.empty, Vector.empty))
          var ids = st.ids.toVector
          var sigs = st.sigs.toVector
          val out = Vector.newBuilder[DupHit]
          for (e <- recs.toSeq.sortBy(_.doc_id)) {
            var bestId = -1L
            var bestAgree = 0.0
            var i = 0
            while (i < ids.length) {
              if (ids(i) < e.doc_id && (bestId < 0 || ids(i) < bestId)) {
                val s = sigs(i)
                var k = 0
                var eq = 0
                while (k < 32) { if (s(k) == e.mh(k)) eq += 1; k += 1 }
                val a = eq / 32.0
                if (a >= minAgree) { bestId = ids(i); bestAgree = a }
              }
              i += 1
            }
            if (bestId >= 0) out += DupHit(e.doc_id, bestId, bestAgree)
            ids = ids :+ e.doc_id
            sigs = sigs :+ e.mh
          }
          state.update(BucketState(ids, sigs))
          out.result().iterator
      }
  }

  /** One stored member of a near-dup band bucket (flat encoder — the
    * element type of the TTL-able ListState below).
    */
  case class BucketMember(doc_id: Long, mh: Seq[Long])

  /** [[nearDupHits]] as a Spark 4 [[StatefulProcessor]] with per-member
    * state TTL — the bounded-retention form SCALE.md promises for
    * 100 TB: each bucket member ages out `ttl` after it was written, so
    * an idle bucket's state drains to zero instead of growing with
    * corpus lifetime. Matching semantics are IDENTICAL to the fMGWS
    * form (same sorted scan, same smallest-qualifying-id flag) when no
    * member has expired; with a TTL, a doc whose only near-partner
    * aged out is NOT flagged — that is the dedup-horizon contract
    * (`NearDupTtlSpec` proves both properties).
    */
  class NearDupProcessor(minAgree: Double, ttl: TTLConfig)
      extends StatefulProcessor[String, BandedDoc, DupHit] {
    @transient private var members: ListState[BucketMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[BucketMember](
        "members", org.apache.spark.sql.Encoders.product[BucketMember], ttl)

    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
        tv: TimerValues): Iterator[DupHit] = {
      var ids = Vector.empty[Long]
      var sigs = Vector.empty[Seq[Long]]
      members.get().foreach { m => ids = ids :+ m.doc_id; sigs = sigs :+ m.mh }
      val out = Vector.newBuilder[DupHit]
      val fresh = Vector.newBuilder[BucketMember]
      for (e <- rows.toSeq.sortBy(_.doc_id)) {
        var bestId = -1L
        var bestAgree = 0.0
        var i = 0
        while (i < ids.length) {
          if (ids(i) < e.doc_id && (bestId < 0 || ids(i) < bestId)) {
            val s = sigs(i)
            var k = 0
            var eq = 0
            while (k < 32) { if (s(k) == e.mh(k)) eq += 1; k += 1 }
            val a = eq / 32.0
            if (a >= minAgree) { bestId = ids(i); bestAgree = a }
          }
          i += 1
        }
        if (bestId >= 0) out += DupHit(e.doc_id, bestId, bestAgree)
        ids = ids :+ e.doc_id
        sigs = sigs :+ e.mh
        fresh += BucketMember(e.doc_id, e.mh)
      }
      // append-only state write: existing members keep their original
      // TTL clock (a put() would refresh every member's expiry on each
      // touched batch, silently unbounding the horizon for hot buckets)
      members.appendList(fresh.result().toArray)
      out.result().iterator
    }
  }

  /** [[nearDupHits]] through `transformWithState`. `ttl = TTLConfig.NONE`
    * reproduces the fMGWS form exactly; a finite TTL bounds state to the
    * dedup horizon (members written more than `ttl` ago stop matching).
    * TTL requires processing-time mode; without one the processor runs
    * in TimeMode.None.
    */
  def nearDupHitsTws(ds: Dataset[BandedDoc], minAgree: Double,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[DupHit] = {
    import ds.sparkSession.implicits._
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_.bk)
      .transformWithState(new NearDupProcessor(minAgree, ttl), mode, OutputMode.Append)
  }

  /** Latest-wins as a Spark 4 [[StatefulProcessor]] — the
    * `transformWithState` successor API to flatMapGroupsWithState:
    * explicit named state variables (typed ValueState here; List/Map
    * state and per-key timers exist for richer operators), TTL support,
    * and a RocksDB-backed store. Semantics are IDENTICAL to
    * [[latestWinsUpdates]] — `StreamingSpec` differentially replays the
    * same corpus through both and asserts equal update logs.
    */
  class LatestWinsProcessor
      extends StatefulProcessor[Long, KeyedRecord, KeyedRecord] {
    @transient private var latest: ValueState[KeyedRecord] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[KeyedRecord](
        "latest", org.apache.spark.sql.Encoders.product[KeyedRecord], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedRecord],
        tv: TimerValues): Iterator[KeyedRecord] = {
      val prev = if (latest.exists()) Some(latest.get()) else None
      val incoming = rows.maxByOption(r => (r.version, r.msg))
      val best = (incoming.toSeq ++ prev.toSeq).maxByOption(r => (r.version, r.msg))
      best match {
        case Some(b) if !prev.exists(_.version >= b.version) =>
          latest.update(b)
          Iterator.single(b)
        case _ => Iterator.empty
      }
    }
  }

  /** Tier 2, modern form: [[latestWinsUpdates]] via `transformWithState`.
    * Requires the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...RocksDBStateStoreProvider`); state remains O(live keys), now
    * with optional TTL aging for bounded-retention snapshots.
    */
  def latestWinsUpdatesTws(ds: Dataset[KeyedRecord]): Dataset[KeyedRecord] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.id)
      .transformWithState(new LatestWinsProcessor, TimeMode.None(), OutputMode.Update)
  }

  /** Latest-wins with KAFKA TOMBSTONE semantics in the state store: a
    * record whose `msg` is NULL deletes its key. The live value and the
    * delete marker live in SEPARATE state variables so the marker can
    * carry its own TTL — the exact shape of Kafka's
    * `delete.retention.ms`: the tombstone must stay remembered long
    * enough to suppress LATE out-of-order upserts with older versions
    * (without it, a straggler would resurrect the deleted key), yet
    * must eventually leave the store so state is O(live keys), not
    * O(ever-deleted keys). A tombstoned key holds only the tiny marker
    * (the live value is cleared immediately); with a retention TTL the
    * marker expires too. Emits every state CHANGE — upsert rows and
    * tombstone rows — so a downstream snapshot can apply deletes.
    */
  class LatestWinsTombstoneProcessor(retention: TTLConfig)
      extends StatefulProcessor[Long, KeyedRecord, KeyedRecord] {
    @transient private var latest: ValueState[KeyedRecord] = _
    @transient private var tomb: ValueState[KeyedRecord] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      latest = getHandle.getValueState[KeyedRecord](
        "latest", org.apache.spark.sql.Encoders.product[KeyedRecord], TTLConfig.NONE)
      tomb = getHandle.getValueState[KeyedRecord](
        "tomb", org.apache.spark.sql.Encoders.product[KeyedRecord], retention)
    }

    override def handleInputRows(key: Long, rows: Iterator[KeyedRecord],
        tv: TimerValues): Iterator[KeyedRecord] = {
      val prevVer = Seq(
        (if (latest.exists()) Some(latest.get()) else None),
        (if (tomb.exists()) Some(tomb.get()) else None))
        .flatten.map(_.version).maxOption
      // null-safe tiebreak: a tombstone (null msg) on a tied version
      // sorts below any real payload instead of NPE-ing the comparator
      rows.maxByOption(r => (r.version, Option(r.msg).getOrElse(""))) match {
        case Some(b) if !prevVer.exists(_ >= b.version) =>
          if (b.msg == null) { latest.clear(); tomb.update(b) }
          else { latest.update(b); tomb.clear() }
          Iterator.single(b)
        case _ => Iterator.empty
      }
    }
  }

  /** [[latestWinsUpdatesTws]] with tombstone deletes. `retention` is the
    * delete-marker TTL (Kafka `delete.retention.ms`); the default NONE
    * keeps markers forever (strongest late-data correctness) and runs
    * in TimeMode.None — pass a TTL to bound marker state, which flips
    * the query to processing-time mode.
    */
  def latestWinsUpdatesTombstonesTws(ds: Dataset[KeyedRecord],
      retention: TTLConfig = TTLConfig.NONE): Dataset[KeyedRecord] = {
    import ds.sparkSession.implicits._
    val mode = if (retention == TTLConfig.NONE) TimeMode.None()
               else TimeMode.ProcessingTime()
    ds.groupByKey(_.id)
      .transformWithState(new LatestWinsTombstoneProcessor(retention), mode,
        OutputMode.Update)
  }

  /** Latest-wins with BOOTSTRAPPED state — the pipeline-migration form:
    * a new streaming job takes over from an existing batch snapshot
    * without replaying history. `handleInitialState` seeds each key's
    * ValueState from the snapshot row before the first batch; the
    * update semantics are [[LatestWinsProcessor]]'s unchanged, so a
    * stale delta record older than the snapshot is correctly
    * suppressed. `InitStateSpec` proves snapshot + delta ≡ full-history
    * replay.
    */
  class LatestWinsWithInitProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, KeyedRecord, KeyedRecord, KeyedRecord] {
    @transient private var latest: ValueState[KeyedRecord] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[KeyedRecord](
        "latest", org.apache.spark.sql.Encoders.product[KeyedRecord], TTLConfig.NONE)

    override def handleInitialState(key: Long, snap: KeyedRecord,
        tv: TimerValues): Unit =
      latest.update(snap)

    override def handleInputRows(key: Long, rows: Iterator[KeyedRecord],
        tv: TimerValues): Iterator[KeyedRecord] = {
      val prev = if (latest.exists()) Some(latest.get()) else None
      val incoming = rows.maxByOption(r => (r.version, r.msg))
      val best = (incoming.toSeq ++ prev.toSeq).maxByOption(r => (r.version, r.msg))
      best match {
        case Some(b) if !prev.exists(_.version >= b.version) =>
          latest.update(b)
          Iterator.single(b)
        case _ => Iterator.empty
      }
    }
  }

  /** [[latestWinsUpdatesTws]] resuming FROM a batch snapshot: only the
    * delta streams; keys the delta never touches stay at their snapshot
    * value in the store.
    */
  def latestWinsResumed(delta: Dataset[KeyedRecord],
      snapshot: Dataset[KeyedRecord]): Dataset[KeyedRecord] = {
    import delta.sparkSession.implicits._
    delta.groupByKey(_.id)
      .transformWithState(new LatestWinsWithInitProcessor,
        TimeMode.None(), OutputMode.Update,
        snapshot.groupByKey(_.id))
  }

  /** One event keyed to a (user, time-bucket) rate-limit cell. */
  case class BucketEvent(user_id: Long, bucket: Long, ts_us: Long, event_id: Long)

  /** EARLIEST-wins upsert — the mirror of [[latestWinsUpdates]] used for
    * streaming RATE LIMITING: state holds the minimum (ts, event_id) per
    * (user, bucket) cell and a cell emits only when a strictly earlier
    * event arrives, so the reduced update log equals the batch
    * first-per-bucket answer REGARDLESS of arrival order (late or
    * shuffled arrivals self-correct — deterministic where a streaming
    * dropDuplicates would keep whichever row won the intra-batch race).
    * State is O(live cells); bucket keys are time-derived, so a
    * production run ages them out with a timeout on the bucket clock.
    */
  def earliestWinsUpdates(ds: Dataset[BucketEvent]): Dataset[BucketEvent] = {
    import ds.sparkSession.implicits._
    val ord = Ordering[(Long, Long)]
    ds.groupByKey(r => (r.user_id, r.bucket))
      .flatMapGroupsWithState[BucketEvent, BucketEvent](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Long, Long), recs: Iterator[BucketEvent], state: GroupState[BucketEvent]) =>
          val incoming = recs.minByOption(r => (r.ts_us, r.event_id))
          val best = (incoming.toSeq ++ state.getOption.toSeq)
            .minByOption(r => (r.ts_us, r.event_id))
          best match {
            case Some(b) if !state.getOption.exists(s =>
                ord.lteq((s.ts_us, s.event_id), (b.ts_us, b.event_id))) =>
              state.update(b)
              Iterator.single(b)
            case _ => Iterator.empty
          }
      }
  }

  /** Sessionization as a Spark 4 [[StatefulProcessor]] with EVENT-TIME
    * TIMERS — the transformWithState twin of [[sessionize]]: sessions
    * close either when a same-user event arrives past the gap (emitted
    * from handleInputRows) or when the watermark passes last + gap (the
    * registered timer fires into handleExpiredTimer). Timer bookkeeping
    * is explicit — each batch moves the per-key close timer to the new
    * session end — where fMGWS hid it in setTimeoutTimestamp. State is
    * one SessState per live session; `StreamingSpec` differentially
    * replays the same corpus through both forms.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState](
        "sess", org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[SessEvent],
        tv: TimerValues): Iterator[SessOut] = {
      val evs = rows.toArray.sortBy(_.ts.getTime)
      var closed = List.empty[SessOut]
      var cur = if (st.exists()) Some(st.get()) else None
      evs.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s0) if t - s0.last <= gapMs =>
            cur = Some(SessState(s0.start, math.max(s0.last, t), s0.n + 1, s0.sv + e.value))
          case Some(s0) =>
            closed ::= SessOut(uid, new java.sql.Timestamp(s0.start), s0.n, s0.sv)
            cur = Some(SessState(t, t, 1L, e.value))
          case None =>
            cur = Some(SessState(t, t, 1L, e.value))
        }
      }
      cur.foreach { s0 =>
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        st.update(s0)
        getHandle.registerTimer(s0.last + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessOut] = {
      if (st.exists()) {
        val s0 = st.get()
        if (info.getExpiryTimeInMs() >= s0.last + gapMs) {
          st.clear()
          Iterator.single(SessOut(uid, new java.sql.Timestamp(s0.start), s0.n, s0.sv))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** [[sessionize]] on the transformWithState API (RocksDB store,
    * event-time timers).
    */
  def sessionizeTws(ds: Dataset[SessEvent], gapMs: Long): Dataset[SessOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append)
  }

  /** One event entering the streaming funnel. */
  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** One completed funnel conversion. */
  case class FunnelHit(user_id: Long, t_first: java.sql.Timestamp,
      t_convert: java.sql.Timestamp)

  /** Streaming FUNNEL state machine on [[StatefulProcessor]] MapState —
    * the incremental twin of the batch windowed funnel: per user, the
    * map holds the earliest qualifying timestamp per stage; an event
    * advances stage i only if it lands within `stepMs` of stage i−1's
    * time, and completing the final stage emits exactly one conversion.
    * State is |stages| longs per live user (bounded, TTL-able), not an
    * event buffer. Equals the batch conditional-min chain whenever each
    * user's events arrive in event-time order (the replay the test
    * drives); a production flow adds a lateness buffer in front.
    */
  class FunnelProcessor(stages: Seq[String], stepMs: Long)
      extends StatefulProcessor[Long, FunnelEvent, FunnelHit] {
    @transient private var st: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("stages",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    // state carries epoch-MICROS: Timestamp.getTime is millis and would
    // silently truncate the micro-precision event times (caught by the
    // batch differential)
    private def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    private def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }

    override def handleInputRows(uid: Long, rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[FunnelHit] = {
      val evs = rows.toArray.sortBy(e => micros(e.ts))
      var hits = List.empty[FunnelHit]
      evs.foreach { e =>
        val i = stages.indexOf(e.event_type)
        if (i >= 0 && !st.containsKey(stages(i))) {
          val t = micros(e.ts)
          val ok =
            if (i == 0) true
            else st.containsKey(stages(i - 1)) && {
              val p = st.getValue(stages(i - 1))
              t > p && t <= p + stepMs * 1000L
            }
          if (ok) {
            st.updateValue(stages(i), t)
            if (i == stages.length - 1)
              hits ::= FunnelHit(uid,
                fromMicros(st.getValue(stages.head)), fromMicros(t))
          }
        }
      }
      hits.reverseIterator
    }
  }

  /** Streaming funnel over the standard view→click→purchase stages. */
  def funnelUpdates(ds: Dataset[FunnelEvent], stages: Seq[String],
      stepMs: Long): Dataset[FunnelHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(stages, stepMs),
        TimeMode.None(), OutputMode.Append)
  }

  /** One unconverted view: the CEP-negation alert. */
  case class AbsAlert(user_id: Long, view_us: Long)

  /** Streaming CEP NEGATION ("view NOT followed by purchase within the
    * horizon") on [[StatefulProcessor]] with EVENT-TIME TIMERS — the
    * pattern class a join can never express incrementally, because the
    * alert condition is the ABSENCE of a future row and only the
    * watermark can prove a future row will not come. Per user, state is
    * the pending (unconverted) view times; a purchase retracts every
    * pending view it converts (strictly-before, within horizon), and a
    * view registers a timer just past its deadline — when the watermark
    * passes it, any still-pending view at or before the deadline is
    * emitted as an alert and dropped. State is O(pending views), not
    * O(history); timestamps ride in MICROS (the conversion test must
    * match the batch oracle's full precision; timers are millisecond-
    * rounded UP so a timer can never fire before its own deadline).
    */
  class AbsenceProcessor(horizonUs: Long)
      extends StatefulProcessor[Long, FunnelEvent, AbsAlert] {
    @transient private var pending: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[Long]("pending",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    private def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    override def handleInputRows(uid: Long, rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[AbsAlert] = {
      var p = pending.get().toVector
      var changed = false
      rows.toArray.sortBy(e => micros(e.ts)).foreach { e =>
        val t = micros(e.ts)
        e.event_type match {
          case "view" =>
            p = p :+ t
            changed = true
            // ceil to ms so watermark(deadline) has truly passed at fire
            getHandle.registerTimer((t + horizonUs) / 1000L + 1L)
          case "purchase" =>
            val keep = p.filterNot(v => v < t && t <= v + horizonUs)
            if (keep.length != p.length) { p = keep; changed = true }
          case _ => () // other event types (and sentinels) are inert
        }
      }
      if (changed) {
        pending.clear()
        if (p.nonEmpty) pending.appendList(p.toArray)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[AbsAlert] = {
      val cutUs = info.getExpiryTimeInMs() * 1000L
      val p = pending.get().toVector
      val (fire, keep) = p.partition(v => v + horizonUs < cutUs)
      if (fire.nonEmpty) {
        pending.clear()
        if (keep.nonEmpty) pending.appendList(keep.toArray)
      }
      fire.sorted.iterator.map(v => AbsAlert(uid, v))
    }
  }

  /** [[AbsenceProcessor]] through `transformWithState` (event-time
    * timers, watermark-driven).
    */
  def absenceAlerts(ds: Dataset[FunnelEvent], horizonUs: Long): Dataset[AbsAlert] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new AbsenceProcessor(horizonUs),
        TimeMode.EventTime(), OutputMode.Append)
  }

  /** One match of the streaming sequence pattern. */
  case class SeqMatch(user_id: Long, match_start: java.sql.Timestamp)

  /** Streaming MATCH_RECOGNIZE-shape detection on [[StatefulProcessor]]
    * ListState: the per-user state is the last k−1 (type, time) events
    * — a BOUNDED buffer trimmed on every append, never the history —
    * and a consecutive view→click→purchase triple emits the match at
    * the view's timestamp. The incremental twin of the batch lead()
    * pattern query; `SeqStreamSpec` replays the full events table and
    * compares match sets exactly.
    */
  class SequenceProcessor(pattern: Seq[String])
      extends StatefulProcessor[Long, FunnelEvent, SeqMatch] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[(String, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[(String, Long)]("tail",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

    private def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    private def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }

    override def handleInputRows(uid: Long, rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[SeqMatch] = {
      val evs = rows.toArray.sortBy(e => micros(e.ts))
      var tail: Vector[(String, Long)] =
        if (buf.exists()) buf.get().toVector else Vector.empty
      var out = List.empty[SeqMatch]
      evs.foreach { e =>
        tail = (tail :+ (e.event_type, micros(e.ts))).takeRight(pattern.length)
        if (tail.length == pattern.length &&
            tail.map(_._1) == pattern)
          out ::= SeqMatch(uid, fromMicros(tail.head._2))
      }
      // ListState.put rejects empty arrays — for a 1-element pattern the
      // retained tail is empty, so clear instead
      val keep = tail.takeRight(pattern.length - 1)
      if (keep.isEmpty) buf.clear() else buf.put(keep.toArray)
      out.reverseIterator
    }
  }

  /** Streaming consecutive-pattern matches for `pattern`. */
  def sequenceMatches(ds: Dataset[FunnelEvent], pattern: Seq[String]): Dataset[SeqMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new SequenceProcessor(pattern),
        TimeMode.None(), OutputMode.Append)
  }

  /** Tier 3: snapshot sink — every micro-batch rewrites the output dir
    * with the deduped latest state of THAT batch plus what `latestWins`
    * already folded (callers feed this from `latestWinsUpdates` for a
    * full-state snapshot, or from a raw stream for per-batch snapshots).
    * JSON-lines overwrite, like the reference sink.
    */
  def snapshotSink(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ingest.writeSnapshotJson(
          Ingest.latestWins(batch, keys = Seq("id"), version = Seq("version")),
          path)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** One event entering streaming sessionization. */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Live per-user session state (epoch millis bounds). */
  case class SessState(start: Long, last: Long, n: Long, sv: Double)

  /** One closed session. */
  case class SessOut(user_id: Long, session_start: java.sql.Timestamp,
      n: Long, sv: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState with
    * EVENT-TIME TIMEOUT — the general form of `session_window` for when
    * the per-session aggregate isn't expressible as a built-in (here it
    * is, deliberately, so the batch gaps-and-islands oracle can check the
    * incremental execution). Sessions close two ways: a same-user event
    * arrives past the gap (emitted immediately), or the watermark passes
    * last-event + gap (timeout fires). State is O(live sessions), sharded
    * by user across executors — the 100 TB design point; nothing buffers
    * per-event.
    *
    * Session rule matches the batch oracle: an event extends the session
    * iff ts - last <= gap (strictly-greater gaps start a new session).
    */
  def sessionize(ds: Dataset[SessEvent], gapMs: Long): Dataset[SessOut] = {
    import ds.sparkSession.implicits._
    def close(uid: Long, s: SessState): SessOut =
      SessOut(uid, new java.sql.Timestamp(s.start), s.n, s.sv)
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = close(uid, state.get)
            state.remove()
            Iterator.single(out)
          } else {
            // within-batch events may span several sessions: walk in
            // event-time order, closing as gaps appear
            val evs = it.toArray.sortBy(_.ts.getTime)
            var closed = List.empty[SessOut]
            var st = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              st match {
                case Some(s) if t - s.last <= gapMs =>
                  st = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.sv + e.value))
                case Some(s) =>
                  closed ::= close(uid, s)
                  st = Some(SessState(t, t, 1L, e.value))
                case None =>
                  st = Some(SessState(t, t, 1L, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Event-time tumbling-window aggregation with watermark + late-data
    * drop — the streaming generalization of the reference's batch "whole
    * topic at once" model.
    */
  def windowedCounts(events: DataFrame, eventTimeCol: String, delay: String, window0: String): DataFrame =
    events.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), window0), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))
}
