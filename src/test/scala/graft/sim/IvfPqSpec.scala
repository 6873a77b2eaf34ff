package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** IVF-PQ composite verification: exactness when both approximations are
  * disabled (every cell probed × grid recovery), clustered-data recall at
  * a partial probe, and the stored-index round-trip. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // 4 distinct integer-valued subvectors per 2-dim subspace (PqSpec's
  // exact-recovery alphabet)
  private val alphabet = Seq(
    Array(1f, 0f), Array(0f, 2f), Array(2f, 2f), Array(-1f, 1f))
  private def gridVec(i: Int): Array[Float] =
    (0 until 4).flatMap(j => alphabet((i + j) % 4)).toArray

  test("full probe × grid recovery ≡ exact inner-product top-k") {
    val corpus = (0 until 48).map(i => (i.toLong, gridVec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 105).map(i => (i.toLong, gridVec(i))).toDF("vec_id", "embedding")
    val got = IvfPq.ivfPqTopK(corpus, queries, k = 5, nlist = 4, nprobe = 4,
        m = 4, codebookSize = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val exactScored = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.sorted === exact.sorted)
  }

  test("filtered residual probe: predicate applies below the top-k over " +
      "the compressed layout; attributes ride build and append") {
    // grid construction: ADC is exact, so the filtered probe at a full
    // probe must equal brute force over the tag = 1 slice exactly
    val corpus = (0 until 48).map(i => (i.toLong, gridVec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "tag")
    val queries = (100 until 103).map(i => (i.toLong, gridVec(i)))
      .toDF("vec_id", "embedding")
    val idx = IvfPq.buildResidualIndex(corpus, nlist = 4, m = 4,
      codebookSize = 4, keepCols = Seq("tag"))
    assert(idx.codes.columns.contains("tag"))
    val got = IvfPq.probeResidualTopK(idx, queries, k = 5, nprobe = 4,
        filter = Some(col("tag") === 1))
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, c, _, _) => assert(c % 3 === 1) }
    val slice = corpus.filter(col("tag") === 1)
    val exactScored = slice
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.sorted === exact.sorted)
    // attributes survive the frozen-quantizer append, and the filtered
    // probe sees appended matching rows
    val appended = IvfPq.appendToResidualIndex(idx,
      Seq((9001L, gridVec(1), 1), (9002L, gridVec(2), 2))
        .toDF("vec_id", "embedding", "tag"))
    assert(appended.codes.columns.contains("tag"))
    val hits = IvfPq.probeResidualTopK(appended, queries, k = 48, nprobe = 4,
        filter = Some(col("tag") === 1))
      .select("cand_id").as[Long].collect().toSet
    assert(hits.contains(9001L) && !hits.contains(9002L), hits.toString)
    // the serving tier: whitelisted filter honored, non-whitelisted 400s
    val svc = new graft.serve.AnnPqService(idx, dim = 8, maxK = 10,
      nprobe = 4, filterCols = Set("tag"))
    val served = svc.topK(gridVec(100).toIndexedSeq, 3, Some(("tag", "1")))
    assert(served.nonEmpty)
    served.foreach { case (id, _, _) => assert(id % 3 === 1) }
    intercept[IllegalArgumentException] {
      svc.topK(gridVec(100).toIndexedSeq, 3, Some(("cell", "1")))
    }
  }

  test("partial probe on clustered data: k valid ranks, in-cluster neighbors only") {
    val rnd = new scala.util.Random(7)
    val anchors = (0 until 8).map(a =>
      Array.tabulate(16)(d => if (d % 8 == a % 8) 10f * (1 + a / 8 + 1) else 0f))
    def jittered(a: Int): Array[Float] =
      anchors(a).map(x => x + (rnd.nextInt(11) - 5) * 0.1f)
    val corpus = (0 until 120).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")
    val queries = (1000 until 1003).map(i => (i.toLong, jittered(i % 8)))
      .toDF("vec_id", "embedding")
    val got = IvfPq.ivfPqTopK(corpus, queries, k = 5, nlist = 8, nprobe = 2,
        m = 4, codebookSize = 8)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(1000L, 1001L, 1002L))
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted === Seq(1, 2, 3, 4, 5))
      assert(rows.forall(_._2 != q))
      // coarse cells + PQ both quantize within-cluster jitter away, but
      // cross-cluster separation is the composite's contract
      assert(rows.forall(r => r._2 % 8 === q % 8),
        s"query $q retrieved out-of-cluster neighbors: $rows")
    }
  }

  test("residual encoding: NONZERO residuals reassemble the exact inner-product top-k") {
    // Two far-apart clusters (k-means must split 24/24 — power-of-two cell
    // sizes keep the centroid means dyadic) × the 4-letter grid alphabet
    // as within-cluster patterns. Residual = pattern − mean(patterns)
    // (anchors cancel): 4 distinct residual subvectors per subspace,
    // recovered exactly by codebookSize = 8, and every value is a dyadic
    // rational — so q·centroid + ADC(q, r̂) = q·v bit-for-bit even though
    // the ADC term is genuinely nonzero.
    def vec(i: Int): Array[Float] = {
      val anchor = if ((i / 4) % 2 == 0) 0f else 100f
      gridVec(i).map(_ + anchor)
    }
    val corpus = (0 until 48).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 105).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val got = IvfPq.ivfPqResidualTopK(corpus, queries, k = 5,
        nlist = 2, nprobe = 2, m = 4, codebookSize = 8)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val exactScored = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.sorted === exact.sorted)
  }

  test("appendToIndex / appendToResidualIndex: frozen-quantizer append " +
      "reproduces the full build's codes and probes bit-for-bit") {
    // Strongest possible pin: train BOTH quantizers on the full corpus,
    // drop the delta slice's code rows, re-ingest the delta through the
    // frozen append path — its re-derived (cell, codes) rows must equal
    // what MLlib's own transform produced, on genuinely NONZERO dyadic
    // residuals (the two-cluster construction keeps every distance exact
    // in double, so assignment ties cannot flip between the paths).
    def avec(i: Int): Array[Float] = {
      val anchor = if ((i / 4) % 2 == 0) 0f else 100f
      gridVec(i).map(_ + anchor)
    }
    val corpus = (0 until 48).map(i => (i.toLong, avec(i)))
      .toDF("vec_id", "embedding")
    val queries = (100 until 105).map(i => (i.toLong, avec(i)))
      .toDF("vec_id", "embedding")
    val delta = corpus.filter(col("vec_id") % 5 === 3)
    def rows(i: IvfPqIndex): Set[String] =
      i.codes.select("cand_id", "cell", "__c0", "__c1", "__c2", "__c3")
        .collect().map(_.toString).toSet

    val fullRes = IvfPq.buildResidualIndex(corpus, nlist = 2, m = 4,
      codebookSize = 8)
    val mergedRes = IvfPq.appendToResidualIndex(
      IvfPqIndex(fullRes.centroids, fullRes.codebooks,
        fullRes.codes.filter(col("cand_id") % 5 =!= 3)), delta)
    assert(rows(mergedRes) === rows(fullRes))
    val pm = IvfPq.probeResidualTopK(mergedRes, queries, k = 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val pf = IvfPq.probeResidualTopK(fullRes, queries, k = 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(pm === pf)

    // flat form, plain grid corpus
    val gridCorpus = (0 until 48).map(i => (i.toLong, gridVec(i)))
      .toDF("vec_id", "embedding")
    val gridDelta = gridCorpus.filter(col("vec_id") % 5 === 3)
    val fullFlat = IvfPq.buildIndex(gridCorpus, nlist = 4, m = 4,
      codebookSize = 4)
    val mergedFlat = IvfPq.appendToIndex(
      IvfPqIndex(fullFlat.centroids, fullFlat.codebooks,
        fullFlat.codes.filter(col("cand_id") % 5 =!= 3)), gridDelta)
    assert(rows(mergedFlat) === rows(fullFlat))
  }

  test("retrainResidualIndex: live-id recovery (append + takedown respected), " +
      "balance factor drops, attributes re-denormalized, gapped store fails fast") {
    // two clusters: even ids anchor 0, odd ids anchor 100. Quantizers
    // train on the EVEN slice only, so the appended odd vectors all
    // crowd into one +cluster cell — the classic frozen-ingest drift.
    def cv(i: Int): Array[Float] = {
      val anchor = if (i % 2 == 0) 0f else 100f
      gridVec(i).map(_ + anchor)
    }
    val corpus = (0 until 96).map(i => (i.toLong, cv(i), i % 3))
      .toDF("vec_id", "embedding", "tag")
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val delta = corpus.filter(col("vec_id") % 2 =!= 0)
    val drifted = IvfPq.appendToResidualIndex(
      IvfPq.buildResidualIndex(base, nlist = 4, m = 4, codebookSize = 8,
        keepCols = Seq("tag")),
      delta)
    val bfBefore = IvfPq.balanceFactor(drifted)
    // the 48 odd vectors carry two distinct grid patterns, so they crowd
    // into (at most) two +cluster cells of the 4: n_max ≥ 36 ⇒ bf ≥ 1.5
    assert(bfBefore >= 1.5, s"fixture should be skewed, got $bfBefore")
    // a takedown sweep before the retrain — the live set the retrain
    // must recover is (everything) minus (vec_id ≡ 2 mod 7)
    val pruned = IvfPq.removeFromIndex(drifted,
      corpus.filter(col("vec_id") % 7 === 2))
    val retrained = IvfPq.retrainResidualIndex(pruned, corpus,
      nlist = 4, m = 4, codebookSize = 8)
    val bfAfter = IvfPq.balanceFactor(retrained)
    assert(bfAfter < bfBefore,
      s"retrain must drop the balance factor: $bfBefore -> $bfAfter")
    // live-id recovery: exactly the un-removed ids, nothing resurrected
    val liveIds = (0 until 96).filter(_ % 7 != 2).map(_.toLong).toSet
    assert(retrained.codes.select("cand_id").as[Long].collect().toSet
      === liveIds)
    // attribute columns (filtered-ANN keepCols) re-denormalized from the
    // raw store
    assert(retrained.codes.select("cand_id", "tag").as[(Long, Int)]
        .collect().toSet ===
      liveIds.map(i => (i, (i % 3).toInt)))
    // trigger wiring: above threshold retrains, below passes through
    val fired = IvfPq.retrainResidualIfSkewed(pruned, corpus,
      maxBalance = 1.4, nlist = 4, m = 4, codebookSize = 8)
    assert(IvfPq.balanceFactor(fired) === bfAfter)
    val calm = IvfPq.retrainResidualIfSkewed(retrained, corpus,
      maxBalance = 100.0, nlist = 4, m = 4, codebookSize = 8)
    assert(calm eq retrained, "below threshold the index must pass through")
    // fail fast on a gapped raw store (a silent drop is the one thing a
    // migration must never do) and on a store missing an attribute column
    val gapped = corpus.filter(col("vec_id") =!= 5)
    val e1 = intercept[IllegalArgumentException] {
      IvfPq.retrainResidualIndex(pruned, gapped, nlist = 4, m = 4,
        codebookSize = 8)
    }
    assert(e1.getMessage.contains("live index ids"))
    val e2 = intercept[IllegalArgumentException] {
      IvfPq.retrainResidualIndex(pruned, corpus.drop("tag"), nlist = 4,
        m = 4, codebookSize = 8)
    }
    assert(e2.getMessage.contains("tag"))
    // the flat form shares the live-slice contract
    val flatPruned = IvfPq.removeFromIndex(
      IvfPq.buildIndex(corpus, nlist = 4, m = 4, codebookSize = 8,
        keepCols = Seq("tag")),
      corpus.filter(col("vec_id") % 7 === 2))
    val flatRetrained = IvfPq.retrainIndex(flatPruned, corpus,
      nlist = 4, m = 4, codebookSize = 8)
    assert(flatRetrained.codes.select("cand_id").as[Long].collect().toSet
      === liveIds)
  }

  test("distortionResidualStats: exact reconstruction audits to zero; " +
      "frozen-ingest drift measures exactly; nonzero residuals included") {
    import org.apache.spark.sql.functions.transform
    // two-cluster dyadic construction (nonzero residuals, all arithmetic
    // exact): the audit must measure the FULL coarse+residual
    // reconstruction, not just the residual codewords
    def avec(i: Int): Array[Float] = {
      val anchor = if ((i / 4) % 2 == 0) 0f else 100f
      gridVec(i).map(_ + anchor)
    }
    val corpus = (0 until 48).map(i => (i.toLong, avec(i)))
      .toDF("vec_id", "embedding")
    val full = IvfPq.buildResidualIndex(corpus, nlist = 2, m = 4,
      codebookSize = 8)
    // codebookSize 8 ≥ the ≤8 distinct residual patterns per subspace ⇒
    // exact recovery ⇒ the audit reads EXACTLY zero per subspace
    val d0 = IvfPq.distortionResidualStats(full, corpus)
      .as[(Int, Long, Double)].collect().toSet
    assert(d0 === (0 until 4).map(j => (j, 48L, 0.0)).toSet)
    assert(IvfPq.meanResidualDistortion(full, corpus) === 0.0)
    // a +0.25-per-dim shifted copy ingested through the frozen path:
    // same cell (integer-gap argument), residual moves 0.25 off its
    // exactly-recovered codeword ⇒ EXACTLY 2 dims × 1/16 = 1/8 per
    // subspace per shifted vector
    val shifted = corpus.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.25f)).as("embedding"))
    val drifted = IvfPq.appendToResidualIndex(full, shifted)
    val both = corpus.unionByName(shifted)
    val d1 = IvfPq.distortionResidualStats(drifted, both)
      .as[(Int, Long, Double)].collect().toSet
    assert(d1 === (0 until 4).map(j => (j, 96L, 6.0)).toSet) // 48·0.125
    assert(IvfPq.meanResidualDistortion(drifted, both) === 0.25)
  }

  test("residual encoding beats flat PQ recall at identical (nlist, m, codebookSize)") {
    // 8 well-separated cluster anchors + 8 within-cluster offset patterns:
    // flat PQ must spend its 8 codebook entries per subspace covering
    // 8 anchors × 8 patterns = up to 64 distinct subvectors (anchor
    // variance dominates, within-cluster ranking is quantized away), while
    // residual encoding removes the anchor and recovers the ≤ 8 distinct
    // residual patterns exactly.
    val patterns = (0 until 8).map(p =>
      Array.tabulate(16)(d => ((p * 5 + d * 3) % 7 - 3).toFloat))
    val anchors = (0 until 8).map(a =>
      Array.tabulate(16)(d => if (d % 8 == a) 60f else if (d % 8 == (a + 3) % 8) -40f else 0f))
    def vec(i: Int): Array[Float] = {
      val a = anchors(i % 8); val p = patterns((i / 8) % 8)
      Array.tabulate(16)(d => a(d) + p(d))
    }
    val corpus = (0 until 128).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (0 until 8).map(i => (1000L + i, vec(i))).toDF("vec_id", "embedding")
    val exactScored = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .withColumn("score", round(VectorExprs.dot(col("qv"), col("cv")), 6))
    val exact = Similarity.topKExplode(exactScored, "score", k = 5)
    val flat = IvfPq.ivfPqTopK(corpus, queries, k = 5,
      nlist = 8, nprobe = 8, m = 4, codebookSize = 8)
    val residual = IvfPq.ivfPqResidualTopK(corpus, queries, k = 5,
      nlist = 8, nprobe = 8, m = 4, codebookSize = 8)
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(ann, exact, 5)
        .select("mean_recall").as[Double].head()
    val (rFlat, rRes) = (recall(flat), recall(residual))
    assert(rRes > rFlat,
      s"residual recall $rRes must beat flat recall $rFlat at equal params")
    assert(rRes >= 0.9, s"residual recall $rRes should be near-exact here")
  }

  test("stored IVF-PQ index (codes partitioned by cell) probes identically to in-memory") {
    val corpus = (0 until 48).map(i => (i.toLong, gridVec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 103).map(i => (i.toLong, gridVec(i))).toDF("vec_id", "embedding")
    val idx = IvfPq.buildIndex(corpus, nlist = 4, m = 4, codebookSize = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    idx.codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    idx.codes.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val stored = IvfPqIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/codes"))
    val inMem = IvfPq.probeTopK(idx, queries, k = 5, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val roundTrip = IvfPq.probeTopK(stored, queries, k = 5, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(roundTrip === inMem)
    assert(inMem.nonEmpty)
  }

  test("IVFADC+R: nprobe = nlist × shortlist = |corpus| ≡ exact brute-force cosine") {
    val corpus = (0 until 48).map(i => (i.toLong, gridVec(i))).toDF("vec_id", "embedding")
    val queries = (100 until 103).map(i => (i.toLong, gridVec(i))).toDF("vec_id", "embedding")
    val idx = IvfPq.buildResidualIndex(corpus, nlist = 4, m = 4, codebookSize = 4)
    val rr = IvfPq.probeResidualRerankTopK(idx, corpus, queries,
        k = 5, shortlist = 48, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(rr.sorted === bf.sorted)
  }

  test("IVFADC+R recall ≥ plain residual ADC against exact cosine ground truth") {
    val patterns = (0 until 8).map(p =>
      Array.tabulate(16)(d => ((p * 5 + d * 3) % 7 - 3).toFloat))
    val anchors = (0 until 8).map(a =>
      Array.tabulate(16)(d => if (d % 8 == a) 60f else if (d % 8 == (a + 3) % 8) -40f else 0f))
    def vec(i: Int): Array[Float] = {
      val a = anchors(i % 8); val p = patterns((i / 8) % 8)
      Array.tabulate(16)(d => a(d) + p(d))
    }
    val corpus = (0 until 128).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (0 until 8).map(i => (1000L + i, vec(i))).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val idx = IvfPq.buildResidualIndex(corpus, nlist = 8, m = 4, codebookSize = 8)
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(ann, exact, 5)
        .select("mean_recall").as[Double].head()
    val plain = recall(IvfPq.probeResidualTopK(idx, queries, k = 5, nprobe = 8))
    val rr = recall(IvfPq.probeResidualRerankTopK(idx, corpus, queries,
      k = 5, shortlist = 30, nprobe = 8))
    assert(rr >= plain, s"rerank recall $rr < plain residual recall $plain")
    assert(rr >= 0.9, s"rerank recall $rr should be near-exact here")
    intercept[IllegalArgumentException] {
      IvfPq.probeResidualRerankTopK(idx, corpus, queries, k = 5, shortlist = 3)
    }
  }
}
