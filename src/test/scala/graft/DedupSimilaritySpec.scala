package graft

import graft.operators.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Sketch-operator quality gates (SURVEY.md §5.2): LSH recall vs exact
  * truth, SimHash band soundness, ANN recall vs brute force, HLL error.
  */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.t(spark, sf, "documents")
  private lazy val emb = Tables.t(spark, sf, "embeddings")
    .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("em"))

  test("minhash LSH recall >= 0.9 vs exact Jaccard pairs at 0.3") {
    val exact = DedupOps.jaccardPairs(docs, 3, 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(docs, 3, 32, 8, 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs at J>=0.3")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; found ${lsh.size} of ${exact.size}")
    // verified pairs carry exact jaccard → no false positives above threshold
    assert(lsh.subsetOf(
      DedupOps.jaccardPairs(docs, 3, 0.3 - 1e-9).select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet))
  }

  test("word_gram_hashes kernel is distinctness-equivalent to the string shingle pipeline") {
    graft.functions.WordGramHashes.register(spark)
    val edge = Seq(
      (1L, "a b c d a b c d"),           // repeated grams collapse
      (2L, "  a   b  "),                 // multi-space runs, < n tokens
      (3L, ""),                          // empty text
      (4L, "x y z"),                     // exactly n tokens → 1 gram
      (5L, null.asInstanceOf[String])    // null text
    ).toDF("doc_id", "text")
    for (df <- Seq(docs, edge)) {
      val kernel = df.select(col("doc_id"),
        size(graft.functions.WordGramHashes.word_gram_hashes("text", 3)).as("n"))
      val strings = df.select(col("doc_id"),
        size(DedupOps.shingles(col("text"), 3)).as("n"))
      assert(kernel.except(strings).isEmpty && strings.except(kernel).isEmpty,
        "distinct gram counts must match the string pipeline per doc")
    }
    // hashes are distinct per row (the sort-dedup worked)
    val dup = docs.select(graft.functions.WordGramHashes.word_gram_hashes("text", 3).as("h"))
      .where(size(col("h")) =!= size(array_distinct(col("h")))).count()
    assert(dup == 0L)
  }

  test("simhash: identical docs collide; near-identical docs within small hamming") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy cat again and again today"),
      (4L, "completely different words entirely unrelated content nothing shared here at all zero")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(d, maxHamming = 63)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0L, "identical docs must have hamming 0")
    assert(pairs((1L, 3L)) <= 16L, "one-word-change doc should be close")
    assert(pairs.get((1L, 4L)).forall(_ > pairs((1L, 3L))),
      "unrelated doc must be farther than near-dup (when bucketed at all)")
  }

  test("ANN SRP-LSH recall >= 0.5 vs brute-force top-5 (and exact scores)") {
    val bf = SimilarityOps.bruteForceTopK(emb.where(col("vec_id") < 20), emb, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ann = SimilarityOps.annTopK(emb, 5, planes = 4, tables = 8, dims = 64)
      .where(col("qid") < 20)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = ann.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"ANN recall too low: $recall")
  }

  test("binary-quantization Hamming ANN recall >= 0.5 vs brute-force top-5") {
    val bf = SimilarityOps.bruteForceTopK(emb.where(col("vec_id") < 20), emb, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val bq = SimilarityOps.binaryHammingTopK(
        emb.where(col("vec_id") < 20), emb, k = 5, shortlist = 32)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = bq.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"binary-quantization recall too low: $recall")
  }

  test("IVF ANN recall >= 0.5 vs brute-force top-5, deterministic across runs") {
    val bf = SimilarityOps.bruteForceTopK(emb.where(col("vec_id") < 20), emb, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def run() = SimilarityOps.ivfTopK(emb, k = 5, cells = 16, nprobe = 4, iters = 2)
      .where(col("qid") < 20)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = run()
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    assert(run() == ivf, "IVF must be deterministic (fixed seeds, fixed tie-breaks)")
    // centroid update must never materialize a whole cell's member
    // vectors in one row (collect_list of a vector column = single-row
    // OOM at scale); the posexplode→(cell,dim)-sum form only collects
    // 64 scalar structs per centroid
    val plan = SimilarityOps.centroidUpdate(
      emb.withColumn("cell", col("vec_id") % 4)
        .withColumn("qm", SimilarityOps.quantize(col("em"))))
      .queryExecution.analyzed.toString
    assert(!plan.contains("collect_list(em") && !plan.contains("collect_list(qm"),
      "IVF centroid update must not collect whole member vectors per cell")
    assert(plan.contains("posexplode"), "update should shuffle scalar (cell, dim) rows")
  }

  test("PQ-ADC shortlist+rerank recall >= 0.7 vs brute-force top-5, deterministic") {
    val bf = SimilarityOps.bruteForceTopK(emb.where(col("vec_id") < 20), emb, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def run() = SimilarityOps.pqAdcTopK(emb, k = 5, shortlist = 100,
        subspaces = 8, subDim = 8, nCentroids = 32)
      .where(col("qid") < 20)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val pq = run()
    val recall = pq.intersect(bf).size.toDouble / bf.size
    // measured 0.91 at sf0.001 / 0.95 at sf0.01 on the qid<20 slice —
    // i.i.d. unit vectors are PQ's worst case, so the bound is loose
    assert(recall >= 0.7, s"PQ-ADC rerank recall too low: $recall")
    assert(run() == pq, "PQ-ADC must be deterministic (fixed seeds, fixed tie-breaks)")
    // the ADC scan must never join real vectors: only the skinny
    // (qid, vec_id) shortlist re-acquires them for the rerank
    val plan = SimilarityOps.pqAdcTopK(emb, 5, 100, 8, 8, 32)
      .queryExecution.analyzed.toString
    assert(plan.contains("element_at"), "scan should score via the LUT, not vectors")
  }

  test("IVF-PQ composed index recall >= 0.6 vs brute-force top-5, deterministic") {
    val bf = SimilarityOps.bruteForceTopK(emb.where(col("vec_id") < 20), emb, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def run() = SimilarityOps.ivfPqTopK(emb, k = 5, shortlist = 50, cells = 16,
        nprobe = 4, iters = 2, subspaces = 8, subDim = 8, nCentroids = 32)
      .where(col("qid") < 20)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val res = run()
    // measured 0.77 at sf0.001 / 0.80 at sf0.01 on the qid<20 slice —
    // bounded above by the IVF cell restriction, not the PQ shortlist
    val recall = res.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF-PQ recall too low: $recall")
    assert(run() == res, "IVF-PQ must be deterministic (fixed seeds, fixed tie-breaks)")
  }

  test("SRP pair queries: bucketed equi-join plan, recall >= 0.9 vs all-pairs truth") {
    // the registered pair queries must NOT plan the N² nested-loop join —
    // the SRP bucket key makes them hash/sort-merge equi-joins
    for (q <- Seq("sim_pairs_threshold", "dedup_embedding_cosine", "sim_ann_lsh")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q must candidate via the SRP bucket equi-join, got:\n$plan")
    }
    // the portable ANN variant (sim_ann_lsh) must also recall the true
    // brute-force neighbors, not just hash-match its own oracle
    val bf = SimilarityOps.bruteForceTopK(emb.where(col("vec_id") < 20), emb, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val annP = SimilarityOps.annTopKPortable(emb, 5, planes = 3, tables = 16, dims = 64)
      .where(col("qid") < 20)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val annRecall = annP.intersect(bf).size.toDouble / bf.size
    assert(annRecall >= 0.7, s"portable ANN recall too low: $annRecall")
    // recall of the bucketed candidates vs the exact all-pairs truth
    val cands = SimilarityOps.srpCandidatePairs(emb, planes = 3, tables = 16, dims = 64)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    for (thresh <- Seq(0.4, 0.45)) {
      val truth = SimilarityOps.exactPairsAbove(emb, thresh)
        .select("va", "vb").as[(Long, Long)].collect().toSet
      assert(truth.nonEmpty, s"fixture should contain pairs at cosine >= $thresh")
      val recall = cands.intersect(truth).size.toDouble / truth.size
      assert(recall >= 0.9, s"SRP recall $recall at $thresh: ${cands.intersect(truth).size}/${truth.size}")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.t(spark, sf, "lineitem")
    val exact = li.select(countDistinct("l_partkey")).as[Long].head()
    val approx = li.select(approx_count_distinct("l_partkey")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("ngrams produces size-n windows in order") {
    val d = Seq("a b c d").toDF("text")
    val tri = d.select(TextOps.ngrams(TextOps.tokens(col("text")), 3).as("g"))
      .as[Seq[String]].head()
    assert(tri == Seq("a b c", "b c d"))
    for (sr <- Seq("a b", "a", "", "   ")) {
      val short = Seq(sr).toDF("text")
        .select(TextOps.ngrams(TextOps.tokens(col("text")), 3).as("g"))
        .as[Seq[String]].head()
      assert(short.isEmpty, s"expected empty ngrams for '$sr'")
    }
  }
}
