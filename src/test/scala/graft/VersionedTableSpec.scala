package graft

import graft.sources.VersionedTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The versioned-table commit core: append/overwrite chains, time
  * travel, snapshot isolation of resolved readers, the crash points of
  * the commit protocol (orphan data files, tmp manifests), the publish
  * race, and vacuum's retained-snapshot guarantee.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"vtab_$name").toString + "/t"

  private def nums(from: Int, to: Int) = (from to to).toDF("n")

  test("append chain: each version sees the union so far; time travel sees the past") {
    val dir = tmp("chain")
    val v1 = VersionedTable.append(nums(1, 10), dir)
    val v2 = VersionedTable.append(nums(11, 20), dir)
    val v3 = VersionedTable.append(nums(21, 30), dir)
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))
    assert(VersionedTable.read(spark, dir).count() == 30)
    assert(VersionedTable.read(spark, dir, Some(2)).agg(sum("n")).as[Long].head() ==
      (1 to 20).sum.toLong)
    assert(VersionedTable.read(spark, dir, Some(1)).count() == 10)
  }

  test("overwrite starts a new file set; the pre-overwrite version stays readable") {
    val dir = tmp("ovw")
    VersionedTable.append(nums(1, 10), dir)
    val v2 = VersionedTable.overwrite(nums(100, 104), dir)
    assert(v2 == 2L)
    assert(VersionedTable.read(spark, dir).count() == 5)
    assert(VersionedTable.read(spark, dir, Some(1)).count() == 10)
  }

  test("snapshot isolation: a resolved reader is immune to later commits") {
    val dir = tmp("iso")
    VersionedTable.append(nums(1, 10), dir)
    val snapshot = VersionedTable.read(spark, dir) // resolves v1's file list
    VersionedTable.append(nums(11, 200), dir)
    VersionedTable.overwrite(nums(0, 0), dir)
    assert(snapshot.count() == 10, "reader must keep seeing its resolved snapshot")
  }

  test("crash garbage is invisible: orphan data files and tmp manifests don't read") {
    val dir = tmp("crash")
    VersionedTable.append(nums(1, 10), dir)
    // crash between stage and publish: a data file no manifest names
    nums(900, 999).write.mode("overwrite").parquet(s"$dir/.stage_dead")
    val f = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    val orphanSrc = f.listStatus(new Path(s"$dir/.stage_dead")).toSeq
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    f.rename(orphanSrc, new Path(s"$dir/data/deadbeef-${orphanSrc.getName}"))
    // crash between manifest stage and rename: a .tmp manifest
    val out = f.create(new Path(s"$dir/_manifests/.v00000000000000000002.tmp"), true)
    out.write("data/nonexistent.parquet".getBytes("UTF-8")); out.close()
    assert(VersionedTable.read(spark, dir).count() == 10,
      "orphans must be invisible to readers")
    assert(VersionedTable.versions(dir) == Seq(1L),
      "a tmp manifest is not a committed version")
    val (_, deleted) = VersionedTable.vacuum(dir, retainVersions = 10)
    assert(deleted == 1, "vacuum must collect exactly the orphan data file")
    assert(VersionedTable.read(spark, dir).count() == 10)
  }

  test("publish race: concurrent appends both land, on distinct versions, none lost") {
    val dir = tmp("race")
    VersionedTable.append(nums(1, 10), dir)
    val t1 = new Thread(() => VersionedTable.append(nums(11, 20), dir))
    val t2 = new Thread(() => VersionedTable.append(nums(21, 30), dir))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(VersionedTable.versions(dir) == Seq(1L, 2L, 3L))
    assert(VersionedTable.read(spark, dir).agg(sum("n")).as[Long].head() ==
      (1 to 30).sum.toLong, "a lost update would drop one writer's rows")
  }

  test("legacy sentinel-less manifests are complete versions, never rewritten") {
    // a table committed by the pre-sentinel protocol: fully-written
    // manifests with NO trailing 'commit:' line. versions() must treat
    // the (aged) sentinel-less tip as a complete legacy version — not
    // an in-flight claim to hide and, after the grace window, REWRITE
    // in place (which would silently discard the committed file list).
    val dir = tmp("legacy")
    VersionedTable.append(nums(1, 10), dir)
    VersionedTable.append(nums(11, 30), dir)
    val f = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    val mdir = new Path(s"$dir/_manifests")
    val stripped = f.listStatus(mdir).toSeq.map(_.getPath).map { p =>
      val in = f.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.nonEmpty && !l.startsWith("commit:")).toList
      finally in.close()
      val out = f.create(p, true)
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
      // age past the grace window so the mtime fence reads it as legacy
      new java.io.File(p.toUri.getPath)
        .setLastModified(System.currentTimeMillis() - 60000L)
      (p.getName, lines)
    }.toMap
    assert(VersionedTable.versions(dir) == Seq(1L, 2L),
      "an aged sentinel-less tip is a complete legacy version")
    assert(VersionedTable.read(spark, dir).count() == 30)
    assert(VersionedTable.read(spark, dir, Some(1)).count() == 10)
    val v3 = VersionedTable.append(nums(31, 40), dir)
    assert(v3 == 3L, "the next commit must build ON the legacy tip, not claim it")
    assert(VersionedTable.read(spark, dir).agg(sum("n")).as[Long].head() ==
      (1 to 40).sum.toLong, "legacy rows must survive the migration commit")
    stripped.foreach { case (name, lines) =>
      val in = f.open(new Path(mdir, name))
      val now = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
      assert(now == lines, s"legacy manifest $name must never be rewritten")
    }
  }

  test("crashed empty claim: one racer takes over, the rest rebase, none lost") {
    sys.props("graft.versioned.grace.ms") = "300"
    try {
      val dir = tmp("tkover")
      VersionedTable.append(nums(1, 10), dir)
      // a writer that crashed right after its exclusive create: an
      // EMPTY claim on v2 that will never complete on its own
      val claimed = new java.io.File(
        new Path(s"$dir/_manifests/v${"%020d".format(2)}").toUri.getPath)
      assert(claimed.createNewFile())
      val ranges = Seq((11, 20), (21, 30), (31, 40))
      val threads = ranges.map { case (a, b) =>
        new Thread(() => VersionedTable.append(nums(a, b), dir))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(VersionedTable.versions(dir) == Seq(1L, 2L, 3L, 4L),
        "exactly one appender must recover the crashed claim as v2")
      assert(VersionedTable.read(spark, dir).agg(sum("n")).as[Long].head() ==
        (1 to 40).sum.toLong, "no appender's rows may be lost to the takeover")
      val f = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
      assert(!f.exists(new Path(s"$dir/_manifests/v${"%020d".format(2)}.takeover")),
        "the takeover marker must be cleaned up after a successful recovery")
    } finally sys.props.remove("graft.versioned.grace.ms")
  }

  test("an abandoned takeover marker ages out instead of wedging the version") {
    sys.props("graft.versioned.grace.ms") = "300"
    try {
      val dir = tmp("stale")
      VersionedTable.append(nums(1, 10), dir)
      val mdir = s"$dir/_manifests"
      // crashed writer (empty claim) AND crashed recoverer (stale marker)
      val claim = new java.io.File(new Path(s"$mdir/v${"%020d".format(2)}").toUri.getPath)
      val marker = new java.io.File(
        new Path(s"$mdir/v${"%020d".format(2)}.takeover").toUri.getPath)
      assert(claim.createNewFile() && marker.createNewFile())
      marker.setLastModified(System.currentTimeMillis() - 60000L)
      val v2 = VersionedTable.append(nums(11, 20), dir)
      assert(v2 == 2L, "the aged marker must be reclaimed, not wedge v2 forever")
      assert(VersionedTable.read(spark, dir).count() == 20)
    } finally sys.props.remove("graft.versioned.grace.ms")
  }

  test("vacuum reclaims crashed fill tmps and orphaned checksum sidecars") {
    val dir = tmp("fillvac")
    VersionedTable.append(nums(1, 10), dir)
    VersionedTable.append(nums(11, 20), dir)
    // every successful LOCAL commit orphans its fill tmp's checksum
    // sidecar (ChecksumFileSystem writes `.X.crc` beside the Hadoop-
    // created tmp; the NIO rename moves only the base) — the r14
    // advisor's unbounded-accumulation finding. The sidecars are
    // HIDDEN from the checksummed listStatus view, so the test lists
    // the directory raw, like vacuum now does.
    def rawList() = new java.io.File(s"$dir/_manifests").list().toSeq
    val crcsBefore = rawList()
      .filter(n => n.contains(".fill-") && n.endsWith(".crc"))
    assert(crcsBefore.nonEmpty,
      "local commits leave orphaned fill .crc sidecars (precondition)")
    // a writer that crashed between its tmp write and the rename leaves
    // a VISIBLE fill file: aged past grace → reclaimed; fresh → kept
    // (it may be microseconds from its rename)
    val aged = new java.io.File(s"$dir/_manifests/v00000000000000000003.fill-dead")
    val fresh = new java.io.File(s"$dir/_manifests/v00000000000000000003.fill-live")
    assert(aged.createNewFile() && fresh.createNewFile())
    aged.setLastModified(System.currentTimeMillis() - 60000L)
    sys.props("graft.versioned.grace.ms") = "30000"
    try VersionedTable.vacuum(dir, retainVersions = 10)
    finally sys.props.remove("graft.versioned.grace.ms")
    val left = rawList()
    assert(!left.exists(n => n.endsWith(".crc") && n.contains(".fill-")),
      s"orphaned fill sidecars must be reclaimed: ${left.mkString(",")}")
    assert(!left.contains(aged.getName), "an aged crashed fill must be reclaimed")
    assert(left.contains(fresh.getName), "a fresh fill may be mid-rename — keep it")
    assert(VersionedTable.versions(dir) == Seq(1L, 2L))
    assert(VersionedTable.read(spark, dir).count() == 20)
  }

  test("vacuum drops old versions' exclusive files but never a retained snapshot's") {
    val dir = tmp("vac")
    VersionedTable.append(nums(1, 10), dir)       // v1
    VersionedTable.overwrite(nums(11, 20), dir)   // v2: v1's files now exclusive to v1
    VersionedTable.append(nums(21, 30), dir)      // v3 shares v2's files
    val (droppedM, deletedF) = VersionedTable.vacuum(dir, retainVersions = 2)
    assert(droppedM == 1 && deletedF >= 1,
      s"v1 and its exclusive files must go (dropped=$droppedM deleted=$deletedF)")
    assert(VersionedTable.versions(dir) == Seq(2L, 3L))
    assert(VersionedTable.read(spark, dir, Some(2)).count() == 10,
      "retained v2 must survive vacuum intact")
    assert(VersionedTable.read(spark, dir, Some(3)).count() == 20)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, dir, Some(1))
    }
  }

  test("manifest stats skip files outside the range without changing results") {
    val dir = tmp("stats")
    // range-partitioned commit → tight per-file [min,max] spans
    val df = (1 to 1000).toDF("n").withColumn("k", format_string("%06d", col("n")))
      .repartitionByRange(8, col("k"))
    VersionedTable.appendWithStats(df, dir, "k")
    val (pruned, planned, total) =
      VersionedTable.readPruned(spark, dir, None, "k", "000100", "000199")
    assert(total == 8 && planned < total,
      s"skipping must bite on range-clustered files (planned=$planned/$total)")
    assert(pruned.count() == 100)
    assert(pruned.agg(sum("n")).as[Long].head() == (100 to 199).sum.toLong)
    // the residual filter keeps correctness even when a file straddles
    val (all, _, _) = VersionedTable.readPruned(spark, dir, None, "k", "000001", "001000")
    assert(all.count() == 1000)
  }

  test("stats-less and stats entries coexist; stats-less files are never skipped") {
    val dir = tmp("mixed")
    VersionedTable.append((1 to 50).toDF("n")
      .withColumn("k", format_string("%06d", col("n"))), dir) // no stats
    VersionedTable.appendWithStats((51 to 100).toDF("n")
      .withColumn("k", format_string("%06d", col("n")))
      .repartitionByRange(2, col("k")), dir, "k")
    val (res, planned, total) =
      VersionedTable.readPruned(spark, dir, None, "k", "000010", "000060")
    assert(res.count() == 51, "rows from both the stats-less and stats files")
    assert(planned < total, "at least one out-of-range stats file must skip")
  }

  test("merge: updates replace, inserts add, deletes remove — atomically, time-travelably") {
    val dir = tmp("merge")
    VersionedTable.append(
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "payload"), dir)
    val delta = Seq(
      (3L, "v3-new", false), // update
      (11L, "v11", false),   // insert
      (7L, "", true))        // delete
      .toDF("k", "payload", "del")
    val v2 = VersionedTable.merge(spark, dir, delta, Seq("k"), "del")
    assert(v2 == 2L)
    val state = VersionedTable.read(spark, dir).as[(Long, String)].collect().toMap
    assert(state.size == 10 && state(3L) == "v3-new" && state(11L) == "v11" &&
      !state.contains(7L), s"merge state wrong: $state")
    assert(VersionedTable.read(spark, dir, Some(1)).count() == 10,
      "pre-merge snapshot must survive")
  }

  test("changeFeed classifies merge effects; carried rows never surface") {
    val dir = tmp("cdf")
    VersionedTable.append(
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "payload"), dir)
    val delta = Seq(
      (3L, "v3-new", false), (11L, "v11", false), (7L, "", true))
      .toDF("k", "payload", "del")
    VersionedTable.merge(spark, dir, delta, Seq("k"), "del")
    val feed = VersionedTable.changeFeed(spark, dir, Seq("k"), 1, 2)
      .as[(Long, String, String)].collect().toSet
    assert(feed == Set(
      (3L, "update_preimage", "v3"), (3L, "update_postimage", "v3-new"),
      (11L, "insert", "v11"), (7L, "delete", "v7")),
      s"feed wrong: $feed")
  }

  test("changeFeed across an OPTIMIZE commit is empty: layout is not data change") {
    val dir = tmp("cdf_opt")
    (0 until 3).foreach(i => VersionedTable.append(
      (1 to 30).filter(_ % 3 == i).map(j => (j.toLong, s"v$j"))
        .toDF("k", "payload").repartition(4), dir))
    VersionedTable.optimizeBinPack(spark, dir, targetBytes = 1L << 20)
    assert(VersionedTable.changeFeed(spark, dir, Seq("k"), 3, 4).isEmpty,
      "a pure rewrite must produce no change rows")
  }

  test("changeFeed scans only manifest-diff files, not the whole table") {
    val dir = tmp("cdf_bound")
    // files land clustered by key range, so a replace of ONE file is a
    // genuine partial rewrite; the feed's input must be bounded by it
    VersionedTable.append(
      (1 to 40).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
        .repartitionByRange(4, col("k")), dir)
    val (_, files) = VersionedTable.currentSnapshot(dir)
    val victim = files.head
    val rewritten = spark.read.parquet(s"$dir/$victim")
      .withColumn("payload",
        when(col("k") === col("k"), concat(col("payload"), lit("!"))))
    VersionedTable.replaceFiles(rewritten.coalesce(1), dir, Seq(victim))
    val feed = VersionedTable.changeFeed(spark, dir, Seq("k"), 1, 2)
    val scanned = feed.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.take(1)).mkString("\n")
    files.tail.foreach(f => assert(!scanned.contains(new Path(f).getName),
      s"carried file $f must not be scanned:\n$scanned"))
    val n = spark.read.parquet(s"$dir/$victim").count()
    assert(feed.count() == 2 * n, "every victim-file row is an update pair")
  }

  test("mergePruned rewrites only key-overlapping files; carried lines keep stats") {
    val dir = tmp("mp")
    val base = (1 to 400).map(i => (f"$i%06d", s"v$i")).toDF("k", "payload")
    VersionedTable.appendWithStats(base.repartitionByRange(8, col("k")), dir, "k")
    // delta confined to the low end of the domain + one true insert
    val delta = Seq(
      ("000003", "v3-new", false), ("000007", "", true), ("900001", "ins", false))
      .toDF("k", "payload", "del")
    val (v2, rewritten, total) =
      VersionedTable.mergePruned(spark, dir, delta, "k", "del")
    assert(v2 == 2L && total == 8 && rewritten < total,
      s"expected a partial rewrite, got $rewritten/$total")
    val state = VersionedTable.read(spark, dir).as[(String, String)]
      .collect().toMap
    assert(state.size == 400 && state("000003") == "v3-new" &&
      !state.contains("000007") && state("900001") == "ins")
    // every manifest line at v2 still carries k-stats → the NEXT pruned
    // merge can skip again (a stats-less rewrite would degrade to full)
    val statless = VersionedTable.history(dir) // force chain readable
    assert(statless.nonEmpty)
    val (_, rw2, tot2) = VersionedTable.mergePruned(spark, dir,
      Seq(("000005", "v5-new", false)).toDF("k", "payload", "del"), "k", "del")
    assert(rw2 == 1 && tot2 > 1,
      s"second merge must stay pruned: rewrote $rw2/$tot2")
  }

  test("mergePruned with no overlapping file appends pure inserts, rewrites nothing") {
    val dir = tmp("mp_ins")
    VersionedTable.appendWithStats(
      (1 to 50).map(i => (f"$i%06d", s"v$i")).toDF("k", "payload")
        .repartitionByRange(4, col("k")), dir, "k")
    val (v2, rewritten, total) = VersionedTable.mergePruned(spark, dir,
      Seq(("900001", "a", false), ("900002", "b", false))
        .toDF("k", "payload", "del"), "k", "del")
    assert(v2 == 2L && rewritten == 0 && total == 4)
    assert(VersionedTable.read(spark, dir).count() == 52)
    assert(VersionedTable.read(spark, dir, Some(1)).count() == 50)
  }

  test("streaming commits are replay-idempotent per (queryId, batchId)") {
    val dir = tmp("txn")
    val b0 = (1 to 10).toDF("n")
    assert(VersionedTable.appendStream(b0, dir, "q1", 0L).contains(1L))
    // crash-before-checkpoint replay: same query, same batch → skipped
    assert(VersionedTable.appendStream(b0, dir, "q1", 0L).isEmpty)
    assert(VersionedTable.read(spark, dir).count() == 10, "no double rows")
    // the next batch and a different query both commit
    assert(VersionedTable.appendStream((11 to 20).toDF("n"), dir, "q1", 1L).contains(2L))
    assert(VersionedTable.appendStream((21 to 25).toDF("n"), dir, "q2", 0L).contains(3L))
    assert(VersionedTable.read(spark, dir).count() == 25)
    // batch appends interleave fine and don't disturb replay detection
    VersionedTable.append((26 to 30).toDF("n"), dir)
    assert(VersionedTable.appendStream(b0, dir, "q1", 0L).isEmpty,
      "replay stamp must survive an interleaved batch commit")
    assert(VersionedTable.read(spark, dir).count() == 30)
  }

  test("vacuum keeps files referenced through STATS manifest entries") {
    val dir = tmp("vacstats")
    VersionedTable.appendWithStats((1 to 100).toDF("n")
      .withColumn("k", format_string("%06d", col("n")))
      .repartitionByRange(4, col("k")), dir, "k")
    VersionedTable.append((101 to 110).toDF("n")
      .withColumn("k", format_string("%06d", col("n"))), dir)
    val (_, deleted) = VersionedTable.vacuum(dir, retainVersions = 2)
    assert(deleted == 0, "no retained file may be vacuumed (stats entries included)")
    assert(VersionedTable.read(spark, dir).count() == 110)
    assert(VersionedTable.read(spark, dir, Some(1)).count() == 100)
  }

  test("history reports one row per retained version with its file count") {
    val dir = tmp("hist")
    VersionedTable.append(nums(1, 10), dir)
    VersionedTable.append(nums(11, 20), dir)
    val h = VersionedTable.history(dir)
    assert(h.map(_._1) == Seq(1L, 2L))
    assert(h(1)._2 > h(0)._2, "append must grow the file list")
  }

  // ---- replace commits: optimistic-concurrency conflict detection ----

  test("disjoint replaces from the same snapshot both commit, either order") {
    val dir = tmp("occ_disjoint")
    VersionedTable.append(nums(1, 10).repartition(2), dir)
    VersionedTable.append(nums(11, 20).repartition(2), dir)
    val (_, all) = VersionedTable.currentSnapshot(dir)
    val (a, b) = all.splitAt(all.size / 2)
    def slice(fs: Seq[String]) = spark.read.parquet(fs.map(p => s"$dir/$p"): _*)
    // both derive their outputs from the SAME snapshot before either commits
    val dfA = slice(a).coalesce(1)
    val dfB = slice(b).coalesce(1)
    val vX = VersionedTable.replaceFiles(dfA, dir, a)
    val vY = VersionedTable.replaceFiles(dfB, dir, b) // rebases over vX
    assert(vY == vX + 1, "disjoint read sets must serialize, not conflict")
    assert(VersionedTable.read(spark, dir).agg(sum("n")).as[Long].head() ==
      (1 to 20).sum.toLong, "either-order outcome must equal serial replay")
  }

  test("overlapping replace aborts with CommitConflictException; retry from fresh snapshot lands") {
    val dir = tmp("occ_conflict")
    VersionedTable.append(nums(1, 20).repartition(2), dir)
    val (_, files) = VersionedTable.currentSnapshot(dir)
    def slice(fs: Seq[String]) = spark.read.parquet(fs.map(p => s"$dir/$p"): _*)
    val stale = slice(Seq(files.head)).coalesce(1) // derived from the old snapshot
    VersionedTable.replaceFiles(slice(files).coalesce(1), dir, files) // v2 rewrites all
    val e = intercept[VersionedTable.CommitConflictException] {
      VersionedTable.replaceFiles(stale, dir, Seq(files.head))
    }
    assert(e.getMessage.contains("write-write conflict"))
    // retry the transaction against the CURRENT snapshot — must land
    val (_, tip) = VersionedTable.currentSnapshot(dir)
    val v3 = VersionedTable.replaceFiles(slice(tip).coalesce(1), dir, tip)
    assert(v3 == 3L)
    assert(VersionedTable.read(spark, dir).agg(sum("n")).as[Long].head() ==
      (1 to 20).sum.toLong, "no row may be lost or resurrected across the schedule")
  }

  test("injected race on the same victim file: exactly one replace wins, the loser conflicts") {
    val dir = tmp("occ_race")
    VersionedTable.append(nums(1, 100).repartition(1), dir)
    val (_, files) = VersionedTable.currentSnapshot(dir)
    val victim = Seq(files.head)
    def slice() = spark.read.parquet(s"$dir/${files.head}").coalesce(1)
    import java.util.concurrent.atomic.AtomicInteger
    val wins = new AtomicInteger(0)
    val conflicts = new AtomicInteger(0)
    val threads = (0 until 2).map(_ => new Thread(() =>
      try { VersionedTable.replaceFiles(slice(), dir, victim); wins.incrementAndGet() }
      catch { case _: VersionedTable.CommitConflictException => conflicts.incrementAndGet() }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1, "exactly one of two overlapping writers may commit")
    assert(conflicts.get() == 1, "the other must abort, not silently rebase")
    assert(VersionedTable.read(spark, dir).agg(sum("n")).as[Long].head() ==
      (1 to 100).sum.toLong, "the winning rewrite must preserve every row once")
    // the aborted writer's staged files are orphans until vacuum reclaims them
    val (_, deleted) = VersionedTable.vacuum(dir, retainVersions = 1)
    assert(deleted >= 1, "vacuum must reclaim the aborted transaction's staged files")
  }
}
