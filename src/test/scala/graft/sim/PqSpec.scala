package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** PQ/ADC verification. The load-bearing test is exact recovery: with at
  * most `codebookSize` distinct subvectors per subspace (all integer-valued,
  * so k-means centroids and dots are exact in FP), ADC must equal the exact
  * inner product and the PQ top-k must match brute force bit-for-bit. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 distinct integer-valued subvectors per 2-dim subspace
  private val alphabet = Seq(
    Array(1f, 0f), Array(0f, 2f), Array(2f, 2f), Array(-1f, 1f))
  private def vec(i: Int): Array[Float] =
    (0 until 4).flatMap(j => alphabet((i + j) % 4)).toArray

  test("PQ with codebook ⊇ distinct subvectors ≡ exact inner-product top-k") {
    val corpus = (0 until 48).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 105).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

    val pq = Pq.pqTopK(corpus, queries, k = 5, m = 4, codebookSize = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq

    val exactScored = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq

    assert(pq.sorted === exact.sorted)
  }

  test("filtered PQ ANN: predicate lands on the code frame before the " +
      "ADC scan — equals filtered exact top-k in the exact-recovery regime") {
    val corpus = (0 until 48).map(i => (i.toLong, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "tag")
    val queries = (100 until 105).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val idx = Pq.buildIndex(corpus, m = 4, codebookSize = 4,
      keepCols = Seq("tag"))
    // the attribute rides the thin code rows
    assert(idx.codes.columns.contains("tag"))
    val got = Pq.probeTopK(idx, queries, k = 5,
        filter = Some(col("tag") === 1))
      .as[(Long, Long, Double, Int)].collect().toSeq
    got.foreach { case (_, c, _, _) =>
      assert(c % 3 === 1, s"candidate $c violates tag = 1") }
    val exactScored = corpus.filter(col("tag") === 1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.sorted === exact.sorted)
  }

  test("PQ on clustered data: k rows per query, valid ranks, no self-match, recall ≥ 0.6") {
    // 8 well-separated integer anchors in 16-dim; corpus points jitter by a
    // small deterministic offset, queries sit near anchors
    val rnd = new scala.util.Random(7)
    val anchors = (0 until 8).map(a =>
      Array.tabulate(16)(d => if (d % 8 == a % 8) 10f * (1 + a / 8 + 1) else 0f))
    def jittered(a: Int): Array[Float] =
      anchors(a).map(x => x + (rnd.nextInt(11) - 5) * 0.1f)
    val corpus = (0 until 120).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")
    val queries = (1000 until 1003).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")

    val pq = Pq.pqTopK(corpus, queries, k = 5, m = 4, codebookSize = 8)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val byQuery = pq.groupBy(_._1)
    assert(byQuery.keySet === Set(1000L, 1001L, 1002L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._4).sorted === Seq(1, 2, 3, 4, 5))
      assert(rows.forall(r => r._1 != r._2))
    }

    // cluster-level recall — the granularity PQ actually promises: every
    // retrieved neighbor belongs to the query's anchor cluster (ADC
    // quantizes away within-cluster jitter, so within-cluster ORDER is not
    // a PQ contract; cross-cluster separation is)
    byQuery.foreach { case (q, rows) =>
      assert(rows.forall(r => r._2 % 8 === q % 8),
        s"query $q retrieved out-of-cluster neighbors: $rows")
    }
  }

  test("PQ stays exact when a subspace yields FEWER centers than codebookSize") {
    // Subspace 0 has only 2 distinct subvectors while codebookSize = 4 —
    // k-means may return fewer than k centers there. A constant
    // j*codebookSize LUT stride would misalign every later subspace;
    // offsets from actual center counts must keep ADC ≡ exact.
    def defVec(i: Int): Array[Float] =
      (0 until 4).flatMap(j =>
        if (j == 0) alphabet(i % 2) else alphabet((i + j) % 4)).toArray
    val corpus = (0 until 48).map(i => (i.toLong, defVec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 104).map(i => (i.toLong, defVec(i))).toDF("vec_id", "embedding")

    val pq = Pq.pqTopK(corpus, queries, k = 5, m = 4, codebookSize = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq

    val exactScored = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq

    assert(pq.sorted === exact.sorted)
  }

  test("stored PQ index (parquet round-trip) probes bit-identically to the in-memory build") {
    // Trained (k-means) codebooks on the clustered fixture — the regime
    // where a geometry-rederivation bug (wrong sub width, misaligned flat
    // offsets) would actually corrupt scores. The registry's sim_pq_probe
    // pins the stored path against the brute-force oracle in the
    // exact-recovery regime; this pins stored ≡ in-memory on REAL trained
    // codebooks, deficient-center offsets included.
    val rnd = new scala.util.Random(11)
    val anchors = (0 until 8).map(a =>
      Array.tabulate(16)(d => if (d % 8 == a % 8) 10f * (1 + a / 8 + 1) else 0f))
    def jittered(a: Int): Array[Float] =
      anchors(a).map(x => x + (rnd.nextInt(11) - 5) * 0.1f)
    val corpus = (0 until 120).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")
    val queries = (1000 until 1003).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")

    val idx = Pq.buildIndex(corpus, m = 4, codebookSize = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    idx.codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    idx.codes.write.mode("overwrite").parquet(s"$dir/codes")
    val stored = PqIndex(
      spark.read.parquet(s"$dir/codebooks"), spark.read.parquet(s"$dir/codes"))

    val inMem = Pq.probeTopK(idx, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val roundTrip = Pq.probeTopK(stored, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(roundTrip === inMem)
    assert(inMem.nonEmpty)
  }

  test("probeTopK plan: codes stream map-side — LUTs broadcast, no code shuffle before the heap") {
    // The serving contract: the encoded corpus joins the per-query LUTs via
    // BROADCAST (never a shuffle of the codes), and the only exchange is the
    // bounded-heap top-k aggregation.
    val corpus = (0 until 48).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val idx = Pq.buildIndex(corpus, m = 4, codebookSize = 4)
    val plan = Pq.probeTopK(idx, corpus.filter(col("vec_id") < 3), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"LUT side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"codes must not shuffle for the LUT join:\n$plan")
  }

  test("probeTopK fails fast on an empty or non-contiguous codebook frame") {
    val corpus = (0 until 8).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val idx = Pq.buildIndex(corpus, m = 4, codebookSize = 4)
    intercept[IllegalArgumentException] {
      Pq.probeTopK(PqIndex(idx.codebooks.limit(0), idx.codes), corpus, k = 1)
    }
    // dropping one codebook row leaves a hole in the flat LUT index space
    intercept[IllegalArgumentException] {
      Pq.probeTopK(PqIndex(idx.codebooks.filter(col("__flat") =!= 2), idx.codes),
        corpus, k = 1)
    }
  }

  test("portable PQ with codebook ⊇ distinct subvectors ≡ exact inner-product top-k") {
    // stride = 1 samples ids 0..3 — the full period of vec(i), so every
    // subspace's codebook contains every distinct subvector and ADC must
    // recover the exact inner product (the pqTopK exact-recovery property,
    // replayed through the deterministic sampled-codebook trainer).
    val corpus = (0 until 48).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 105).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

    val pq = Pq.pqTopKPortable(corpus, queries, k = 5, m = 4, codebookSize = 4,
      stride = 1).as[(Long, Long, Double, Int)].collect().toSeq

    val exactScored = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq

    assert(pq.sorted === exact.sorted)
  }

  test("portable PQ fails fast when the stride can't fill the codebook") {
    val corpus = (0 until 8).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.pqTopKPortable(corpus, corpus, k = 1, m = 4, codebookSize = 16, stride = 29)
    }
    assert(e.getMessage.contains("stride"))
    intercept[IllegalArgumentException] {
      Pq.pqTopKPortable(corpus, corpus, k = 1, m = 4, codebookSize = 4, stride = 0)
    }
  }

  test("pqTopK validates m / codebook / dim compatibility") {
    val corpus = (0 until 4).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.pqTopK(corpus, corpus, k = 1, m = 3) // 8 % 3 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.pqTopK(corpus, corpus, k = 1, trainFraction = 0.0)
    }
  }

  // --- two-stage ADC shortlist → exact cosine re-rank -----------------

  private def clusteredFixture(seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    val anchors = (0 until 8).map(a =>
      Array.tabulate(16)(d => if (d % 8 == a % 8) 10f * (1 + a / 8 + 1) else 0f))
    def jittered(a: Int): Array[Float] =
      anchors(a).map(x => x + (rnd.nextInt(11) - 5) * 0.1f)
    val corpus = (0 until 120).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")
    val queries = (1000 until 1003).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")
    (corpus, queries)
  }

  test("rerank with shortlist = |corpus| ≡ exact brute-force cosine top-k") {
    val (corpus, queries) = clusteredFixture()
    val idx = Pq.buildIndex(corpus, m = 4, codebookSize = 8)
    val rr = Pq.probeRerankTopK(idx, corpus, queries, k = 5, shortlist = 120)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(rr.sorted === bf.sorted)
  }

  test("rerank recall ≥ plain-ADC recall at the same index; shortlist < k throws") {
    val (corpus, queries) = clusteredFixture()
    val idx = Pq.buildIndex(corpus, m = 4, codebookSize = 8)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(ann, exact, k = 5)
        .select("mean_recall").as[Double].head()
    val adc = recall(Pq.probeTopK(idx, queries, k = 5))
    val rr = recall(Pq.probeRerankTopK(idx, corpus, queries, k = 5, shortlist = 20))
    assert(rr >= adc, s"rerank recall $rr < plain ADC recall $adc")
    assert(rr >= 0.6)
    intercept[IllegalArgumentException] {
      Pq.probeRerankTopK(idx, corpus, queries, k = 5, shortlist = 4)
    }
  }

  test("flat-PQ lifecycle: frozen append ≡ rebuild, O(removed) deletion, " +
      "live-set retrain, distortion audit exact, trigger wiring") {
    val corpus = (0 until 48).map(i => (i.toLong, vec(i), i % 3))
      .toDF("vec_id", "embedding", "tag")
    val full = Pq.buildIndex(corpus, m = 4, codebookSize = 4,
      keepCols = Seq("tag"))
    def rows(i: PqIndex): Set[String] =
      i.codes.select("cand_id", "__c0", "__c1", "__c2", "__c3", "tag")
        .collect().map(_.toString).toSet
    // frozen-codebook append reproduces MLlib's own transform codes
    // (attributes ride the delta)
    val merged = Pq.appendToIndex(
      PqIndex(full.codebooks, full.codes.filter(col("cand_id") % 5 =!= 3)),
      corpus.filter(col("vec_id") % 5 === 3))
    assert(rows(merged) === rows(full))
    // O(removed) deletion is exactly a code-row filter
    val removed = Pq.removeFromIndex(full, corpus.filter(col("vec_id") % 7 === 2))
    assert(rows(removed) ===
      rows(PqIndex(full.codebooks,
        full.codes.filter(col("cand_id") % 7 =!= 2))))
    // distortion audit: exact recovery ⇒ SSE exactly 0 per subspace…
    val d0 = Pq.distortionStats(full, corpus)
      .as[(Int, Long, Double)].collect().toSet
    assert(d0 === (0 until 4).map(j => (j, 48L, 0.0)).toSet)
    // …and a +0.25-per-dim shifted slice ingested through the frozen
    // path contributes EXACTLY 2 dims × (1/4)² = 1/8 per subspace per
    // vector (dyadic, hand-computable — the nonzero exactness pin)
    val shifted = corpus.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.25f)).as("embedding"),
      col("tag"))
    val drifted = Pq.appendToIndex(full, shifted)
    val both = corpus.unionByName(shifted)
    val d1 = Pq.distortionStats(drifted, both)
      .as[(Int, Long, Double)].collect().toSet
    assert(d1 === (0 until 4).map(j => (j, 96L, 6.0)).toSet) // 48·0.125
    assert(Pq.meanDistortion(drifted, both) === 0.25) // 4·6.0/96
    // trigger wiring: above threshold retrains on the live corpus. The
    // retrain grows codebook capacity to 8 ≥ the live corpus's 8
    // distinct patterns per subspace (the standard remedy when drift
    // introduced genuinely NEW patterns), so the drop below the frozen
    // codebook's 0.25 is decisive regardless of which local optimum
    // k-means lands in (a same-size retrain CAN land above 0.25 when
    // the semi-joined row order feeds k-means‖ a bad init — observed;
    // capacity 8 leaves at worst a few 0.25-apart pairs merged, two
    // orders of magnitude below the frozen error).
    val retrained = Pq.retrainIndexIfDistorted(drifted, both,
      maxMeanSse = 0.1, m = 4, codebookSize = 8)
    val mdAfter = Pq.meanDistortion(retrained, both)
    assert(mdAfter < 0.25, s"retrain must drop distortion, got $mdAfter")
    assert(retrained.codes.columns.contains("tag"))
    val calm = Pq.retrainIndexIfDistorted(retrained, both,
      maxMeanSse = 1000.0, m = 4, codebookSize = 8)
    assert(calm eq retrained, "below threshold the index must pass through")
    // live-set retrain after a takedown: only live ids survive, and a
    // gapped raw store fails fast instead of silently dropping vectors
    val live = Pq.retrainIndex(removed, corpus, m = 4, codebookSize = 4)
    assert(live.codes.select("cand_id").as[Long].collect().toSet ===
      (0 until 48).filter(_ % 7 != 2).map(_.toLong).toSet)
    val e = intercept[IllegalArgumentException] {
      Pq.retrainIndex(removed, corpus.filter(col("vec_id") =!= 5),
        m = 4, codebookSize = 4)
    }
    assert(e.getMessage.contains("live index ids"))
  }

  test("portable rerank ≡ trained rerank when codebooks recover every subvector") {
    // ids 0..3 cover all 4 alphabet entries in every subspace, so the
    // stride-1 sample IS a complete codebook and both pipelines compute
    // identical shortlists and identical cosine re-ranks.
    val corpus = (0 until 48).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 104).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val portable = Pq.pqRerankTopKPortable(corpus, queries, k = 5, shortlist = 12,
        m = 4, codebookSize = 4, stride = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val trained = Pq.probeRerankTopK(
        Pq.buildIndex(corpus, m = 4, codebookSize = 4), corpus, queries,
        k = 5, shortlist = 12)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(portable.sorted === trained.sorted)
  }
}
