package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def vec(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }
  private lazy val corpus = (0 until 120).map(i => (i.toLong, vec(i)))
  private lazy val planted = (0 until 8).map(i => ((i + 10000).toLong, vec(i)))
  private def df = (corpus ++ planted).toDF("vec_id", "embedding")

  test("IVF finds every planted duplicate (identical vector ⇒ same cell)") {
    val queries = df.filter(col("vec_id") < 8)
    val res = Ivf.ivfTopK(df, queries, k = 1, nlist = 8, nprobe = 2)
      .select("query_id", "cand_id", "cosine").as[(Long, Long, Double)].collect()
    assert(res.length === 8)
    res.foreach { case (q, c, cos) =>
      assert(c === q + 10000 && cos === 1.0, s"query $q got $c @ $cos")
    }
  }

  test("nprobe = nlist degenerates to exact brute force") {
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.ivfTopK(df, queries, k = 5, nlist = 8, nprobe = 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(ivf === exact)
  }

  test("partial probing recall@5 vs brute force is reasonable") {
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.ivfTopK(df, queries, k = 5, nlist = 8, nprobe = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("portable IVF: planted duplicates found, full probe ≡ brute force, guards fire") {
    // identical vector ⇒ identical rounded distances ⇒ same cell, so a
    // planted duplicate is always inside the probed cell set
    val queries = df.filter(col("vec_id") < 8)
    val found = Ivf.ivfTopKPortable(df, queries, k = 1, nlist = 8, nprobe = 2,
        stride = 13)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    (0 until 8).foreach(q => assert(found(q.toLong) === q + 10000L))
    // probing every cell must reproduce exact brute force bit-for-bit —
    // the sampled quantizer drops out exactly like nprobe = nlist k-means
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val full = Ivf.ivfTopKPortable(df, queries, k = 5, nlist = 8, nprobe = 8,
        stride = 13)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(full === exact)
    intercept[IllegalArgumentException] {
      Ivf.ivfTopKPortable(df, queries, k = 1, nlist = 64, nprobe = 2, stride = 13)
    }
    intercept[IllegalArgumentException] {
      Ivf.ivfTopKPortable(df, queries, k = 1, nlist = 8, nprobe = 9)
    }
  }

  test("build once, probe many: stored index round-trips and serves multiple query sets") {
    val q1 = df.filter(col("vec_id") < 4)
    val q2 = df.filter(col("vec_id") >= 4 && col("vec_id") < 8)
    val index = Ivf.buildIndex(df, nlist = 8)

    // the same built index serves different query sets, matching the
    // self-contained form exactly (same seed, same training)
    val fused1 = Ivf.ivfTopK(df, q1, k = 5, nlist = 8, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    val probed1 = Ivf.probeTopK(index, q1, k = 5, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(probed1 === fused1)

    // round-trip through parquet, assigned partitioned by cell (the
    // partition-pruning layout); the re-read frames probe identically
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx")
    index.assigned.write.partitionBy("cell").parquet(s"$dir/assigned")
    index.centroids.write.parquet(s"$dir/centroids")
    val stored = IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assigned"))
    val probed2 = Ivf.probeTopK(stored, q2, k = 3, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    val fused2 = Ivf.ivfTopK(df, q2, k = 3, nlist = 8, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(probed2 === fused2)

    // a probe of few cells against the stored layout PRUNES partitions:
    // the cell predicate must be a PARTITION filter on the scan node
    // (directory pruning), not a per-row data filter — asserted on the
    // typed plan node, not a string match a data filter would also pass
    import org.apache.spark.sql.execution.FileSourceScanExec
    val pruned = stored.assigned.filter(col("cell") === 0)
    pruned.collect()
    val scans = allPlanNodes(pruned.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"expected partition pruning on cell; filters: ${scans.head.partitionFilters}")
  }

  test("appendToIndex: merged ≡ frozen-centroid rebuild, probes equal, " +
      "stored append touches only delta cells") {
    val base = df.filter(col("vec_id") % 5 =!= 3)
    val delta = df.filter(col("vec_id") % 5 === 3)
    val queries = df.filter(col("vec_id") < 8)
    val cents = Ivf.portableCentroids(base, nlist = 8, stride = 13)
    val merged = Ivf.appendToIndex(
      IvfIndex(cents, Ivf.assignPortable(base, cents)), delta)
    val rebuilt = IvfIndex(cents, Ivf.assignPortable(df, cents))
    // merged assignment ≡ full rebuild under the same frozen centroids
    assert(merged.assigned.select("cand_id", "cell")
        .as[(Long, Int)].collect().toSet ===
      rebuilt.assigned.select("cand_id", "cell")
        .as[(Long, Int)].collect().toSet)
    // and the probes are bit-identical
    val pm = Ivf.probePortable(merged, queries, k = 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val pr = Ivf.probePortable(rebuilt, queries, k = 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(pm === pr)
    // trained family: appending to a k-means index serves the planted
    // duplicates exactly like the full build (separated assignment — a
    // duplicate vector always lands in its twin's cell)
    val trained = Ivf.buildIndex(base, nlist = 8)
    val trainedMerged = Ivf.appendToIndex(trained, delta)
    val res = Ivf.probeTopK(trainedMerged, queries, k = 1, nprobe = 8)
      .select("query_id", "cand_id", "cosine")
      .as[(Long, Long, Double)].collect()
    res.foreach { case (q, c, cos) =>
      assert(c === q + 10000L && cos === 1.0, s"query $q got $c @ $cos") }
    // stored layout: the delta appends as NEW files in only its own
    // cells; base files are never rewritten
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_merge")
    Ivf.assignPortable(base, cents)
      .write.partitionBy("cell").parquet(s"$dir/assigned")
    def files(): Set[String] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/assigned"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
            java.nio.file.Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".parquet"))
          .map(_.toString).toSet
      } finally s.close()
    }
    val before = files()
    val deltaAssigned = Ivf.assignPortable(delta, cents)
    deltaAssigned.write.mode("append").partitionBy("cell")
      .parquet(s"$dir/assigned")
    val after = files()
    assert(before.subsetOf(after), "append rewrote base files")
    val deltaCells = deltaAssigned.select("cell").distinct()
      .as[Int].collect().toSet
    assert((after -- before).nonEmpty)
    assert((after -- before).forall(f =>
        deltaCells.exists(cl => f.contains(s"cell=$cl/"))),
      s"delta files outside delta cells: ${after -- before}")
    // and the re-read merged layout probes identically to the in-memory one
    val stored = IvfIndex(cents, spark.read.parquet(s"$dir/assigned"))
    val ps = Ivf.probePortable(stored, queries, k = 5, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(ps === pm)
  }

  test("removeFromIndex: probes over the reduced index ≡ rebuilt on the " +
      "remainder (IVF and IVF-PQ)") {
    val cents = Ivf.portableCentroids(df, nlist = 8, stride = 13)
    val removed = df.filter(col("vec_id") % 7 === 2).select("vec_id")
    val reduced = Ivf.removeFromIndex(
      IvfIndex(cents, Ivf.assignPortable(df, cents)), removed)
    val rebuilt = IvfIndex(cents,
      Ivf.assignPortable(df.filter(col("vec_id") % 7 =!= 2), cents))
    val queries = df.filter(col("vec_id") < 8)
    assert(Ivf.probePortable(reduced, queries, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Int)].collect().toSeq.sorted ===
      Ivf.probePortable(rebuilt, queries, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Int)].collect().toSeq.sorted)
    // PQ-coded twin: deletion is exactly a code-row filter
    val full = IvfPq.buildIndex(df, nlist = 8, m = 4, codebookSize = 8)
    val redPq = IvfPq.removeFromIndex(full, removed)
    assert(redPq.codes.collect().map(_.toString).toSet ===
      full.codes.filter(col("cand_id") % 7 =!= 2)
        .collect().map(_.toString).toSet)
  }

  test("retrainIndex: a drifted index's balance factor drops; " +
      "retrainIfSkewed fires only over the threshold; attributes survive") {
    import spark.implicits._
    // even ids cluster at +10, odd ids at -10 (2-D). The quantizer is
    // trained on the EVEN slice only (stride 13 over evens: 0,26,52,78 —
    // all in the + cluster), so the appended odd vectors all crowd into
    // whichever + cell is nearest: the classic ingest drift.
    def v(i: Int): Array[Float] = {
      val r = new scala.util.Random(i)
      val c = if (i % 2 == 0) 10f else -10f
      Array(c + r.nextFloat() * 0.5f, c + r.nextFloat() * 0.5f)
    }
    val base = (0 until 80 by 2).map(i => (i.toLong, v(i), i % 4))
      .toDF("vec_id", "embedding", "tag")
    val delta = (1 until 80 by 2).map(i => (i.toLong, v(i), i % 4))
      .toDF("vec_id", "embedding", "tag")
    val cents0 = Ivf.portableCentroids(base, nlist = 4, stride = 13)
    val drifted = Ivf.appendToIndex(
      IvfIndex(cents0,
        Ivf.assignPortable(base, cents0, keepCols = Seq("tag"))),
      delta) // attribute columns ride the append
    val bfBefore = Ivf.balanceFactor(drifted)
    // 40 odd vectors + their nearest +cluster cell's own members in one
    // cell of 4 over 80 vectors: n_max ≥ 40 ⇒ bf ≥ 2
    assert(bfBefore >= 2.0, s"fixture should be skewed, got $bfBefore")
    // retrain over the merged corpus: stride 13 over ALL ids samples
    // 0, 13, 26, 39 — both clusters represented — so occupancy rebalances
    val retrained = Ivf.retrainIndex(drifted, nlist = 4, stride = 13)
    val bfAfter = Ivf.balanceFactor(retrained)
    assert(bfAfter < bfBefore,
      s"retrain must drop the balance factor: $bfBefore -> $bfAfter")
    // the trigger wiring: above threshold retrains (new centroids),
    // below threshold returns the index untouched
    val fired = Ivf.retrainIfSkewed(drifted, maxBalance = 2.0,
      nlist = 4, stride = 13)
    assert(Ivf.balanceFactor(fired) === bfAfter)
    val calm = Ivf.retrainIfSkewed(retrained, maxBalance = 10.0,
      nlist = 4, stride = 13)
    assert(calm eq retrained, "below threshold the index must pass through")
    // attribute columns (filtered-ANN keepCols) survive the migration
    assert(retrained.assigned.columns.contains("tag"))
    assert(retrained.assigned.select("cand_id", "tag")
        .as[(Long, Int)].collect().toSet ===
      (0 until 80).map(i => (i.toLong, i % 4)).toSet)
    // count preserved: a retrain migrates, never drops or duplicates
    assert(retrained.assigned.count() === 80)
    // the k-means production twin also rebalances the same fixture
    val km = Ivf.retrainIndexKMeans(drifted, nlist = 4)
    assert(km.centroids.count() === 4 && km.assigned.count() === 80)
  }

  test("filtered ANN: the predicate applies BELOW the top-k (k matching " +
      "survivors, never an under-filled post-filter)") {
    import spark.implicits._
    val tagged = df.withColumn("tag",
      pmod(col("vec_id"), lit(3L)).cast("int"))
    val cents = Ivf.portableCentroids(df, nlist = 8, stride = 13)
    val idx = IvfIndex(cents,
      Ivf.assignPortable(tagged, cents, keepCols = Seq("tag")))
    val queries = df.filter(col("vec_id") < 6)
    val k = 5
    val got = Ivf.probePortable(idx, queries, k, nprobe = 8,
        filter = Some(col("tag") === 1))
      .select("query_id", "cand_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect()
    // every survivor matches the predicate
    assert(got.nonEmpty)
    got.foreach { case (_, c, _, _) =>
      assert(c % 3 === 1, s"candidate $c violates tag = 1") }
    // k MATCHING survivors: full probe (nprobe = nlist) must equal the
    // brute-force top-k over the tag = 1 slice (minus the query itself)
    for (q <- 0L until 6L) {
      val mine = got.filter(_._1 == q).sortBy(_._4).map(_._2).toSeq
      val brute = Similarity.bruteForceTopK(
          tagged.filter(col("tag") === 1 && col("vec_id") =!= q)
            .select("vec_id", "embedding"),
          df.filter(col("vec_id") === q), k)
        .orderBy(col("rank")).select("cand_id").as[Long].collect().toSeq
      assert(mine === brute, s"query $q: $mine vs brute $brute")
    }
  }

  test("filtered ANN over a STORED layout: the attribute predicate is " +
      "pushed to the probed cells' scan (PushedFilters + cell pruning)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val tagged = df.withColumn("tag",
      pmod(col("vec_id"), lit(3L)).cast("int"))
    val cents = Ivf.portableCentroids(df, nlist = 8, stride = 13)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_filt")
    cents.write.parquet(s"$dir/centroids")
    Ivf.assignPortable(tagged, cents, keepCols = Seq("tag"))
      .write.partitionBy("cell").parquet(s"$dir/assigned")
    val stored = IvfIndex(spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assigned"))
    val probe = Ivf.probePortable(stored, df.filter(col("vec_id") < 3),
      k = 5, nprobe = 2, filter = Some(col("tag") === 1))
    probe.collect()
    val scans = allPlanNodes(probe.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .filter(_.output.exists(_.name == "tag")) // the assigned-frame scan
    assert(scans.nonEmpty, "no scan over the stored assigned frame found")
    // the tag equality must be a DATA filter pushed into the scan node
    // (parquet row-group stats can then skip), not a post-join filter
    assert(scans.exists(_.dataFilters.exists(_.references.exists(_.name == "tag"))),
      s"tag predicate not pushed to the scan; dataFilters: " +
        s"${scans.map(_.dataFilters).mkString("; ")}")
  }

  test("assignMapOnly ≡ assignPortable cells on every vector; the plan " +
      "carries no Exchange (the map-only streaming-safety pin)") {
    val cents = Ivf.portableCentroids(df, nlist = 4, stride = 13)
    val routed = Ivf.assignMapOnly(df, cents)
    val agg = Ivf.assignPortable(df, cents).select("cand_id", "cell")
    assert(routed.as[(Long, Int)].collect().toSet ===
      agg.as[(Long, Int)].collect().toSet,
      "least-over-literal-structs must equal min(struct) assignment")
    // map-only: no shuffle anywhere in the executed plan
    val plan = routed.queryExecution.executedPlan
    assert(!allPlanNodes(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      s"assignMapOnly must not shuffle:\n$plan")
    // a single-centroid table routes everything to that cell (least()
    // alone would reject one argument)
    val one = Ivf.assignMapOnly(df, cents.filter($"cell" === 2))
      .select("cell").distinct().as[Int].collect().toSeq
    assert(one === Seq(2))
  }

  test("silhouettePortable: tight separated clusters score near 1, bounds hold") {
    import spark.implicits._
    // ids 0 and 29 (the stride samples) sit in different clusters, so the
    // two sampled centroids land one per cluster; members are close to
    // their own centroid (a small) and far from the other (b large).
    def jitter(i: Int, cx: Float): Array[Float] = {
      val r = new scala.util.Random(i)
      Array(cx + r.nextFloat() * 0.1f, r.nextFloat() * 0.1f)
    }
    val d = (0 until 58).map { i =>
      val cluster0 = i % 2 == 0
      (i.toLong, jitter(i, if (cluster0) 0f else 100f))
    }.toDF("vec_id", "embedding")
    val out = Ivf.silhouettePortable(d, nlist = 2, stride = 29)
      .select("vec_id", "sil").as[(Long, Double)].collect()
    assert(out.length === 58)
    out.foreach { case (id, s) =>
      assert(s >= -1.0 && s <= 1.0, s"sil out of bounds for $id: $s")
      assert(s > 0.9, s"separated clusters must score near 1; $id got $s")
    }
    intercept[IllegalArgumentException] {
      Ivf.silhouettePortable(d, nlist = 1)
    }
  }
}
