package graft.serve

import graft.SparkSpec
import graft.graph.Graph

/** Stored-ranks serving tier: build / open / probe / refresh, and the
  * HITS reliable-checkpoint knob. */
class GraphServiceSpec extends SparkSpec {
  import spark.implicits._

  // A→B, A→C, B→A; C dangling (the GraphSpec triangle — ranks
  // hand-checked there, reused here so probe assertions are golden)
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("s", "d")

  test("buildPageRank + overParquetDir: stored probe ≡ direct compute; " +
      "topK bounded with deterministic ties; rankOf point lookups") {
    val root = java.nio.file.Files.createTempDirectory("gr_srv_").toString
    GraphRankService.buildPageRank(triangle, "s", "d", root,
      iterations = 2, scale = 1000L, dampNum = 1L, dampDen = 2L)
    val svc = GraphRankService.overParquetDir(spark, root, maxK = 10)
    // hand-computed r2 (GraphSpec): A=875, B=750, C=750; ties by node
    assert(svc.topK(3) === Seq((1L, 875L, 1), (2L, 750L, 2), (3L, 750L, 3)))
    assert(svc.topK(1) === Seq((1L, 875L, 1)))
    assert(svc.rankOf(Seq(2L, 3L, 99L)) === Map(2L -> 750L, 3L -> 750L))
    intercept[IllegalArgumentException] { svc.topK(0) }
    intercept[IllegalArgumentException] { svc.topK(11) } // maxK = 10
    intercept[IllegalArgumentException] { svc.rankOf(Seq.empty) }
  }

  test("stored probe matches a fresh recompute EXACTLY (integer ranks " +
      "round-trip parquet bit-for-bit)") {
    val root = java.nio.file.Files.createTempDirectory("gr_srv2_").toString
    GraphRankService.buildPageRank(triangle, "s", "d", root, iterations = 5)
    val stored = GraphRankService.overParquetDir(spark, root)
      .topKFrame(3).as[(Long, Long, Int)].collect().toSeq
    val direct = Graph.pageRankInt(triangle, "s", "d", iterations = 5)
      .orderBy($"rank".desc, $"node").limit(3)
      .as[(Long, Long)].collect().toSeq.zipWithIndex
      .map { case ((n, r), i) => (n, r, i + 1) }
    assert(stored === direct)
  }

  test("refreshPageRank: recompute + marker-fenced swap; re-opened " +
      "service serves the new graph") {
    val root = java.nio.file.Files.createTempDirectory("gr_srv3_").toString
    GraphRankService.buildPageRank(triangle, "s", "d", root,
      iterations = 2, scale = 1000L, dampNum = 1L, dampDen = 2L)
    // the edge set changes: B→A disappears, D→A appears
    val moved = Seq((1L, 2L), (1L, 3L), (4L, 1L)).toDF("s", "d")
    GraphRankService.refreshPageRank(spark, root, moved, "s", "d",
      iterations = 2, scale = 1000L, dampNum = 1L, dampDen = 2L)
    val svc = GraphRankService.overParquetDir(spark, root, maxK = 10)
    val expected = Graph.pageRankInt(moved, "s", "d", iterations = 2,
      scale = 1000L, dampNum = 1L, dampDen = 2L)
      .as[(Long, Long)].collect().toMap
    assert(svc.rankOf(Seq(1L, 2L, 3L, 4L)) === expected)
  }

  test("buildHits + overParquetDirHits: stored authority/hub probes ≡ " +
      "direct compute, ties by node") {
    val root = java.nio.file.Files.createTempDirectory("gr_hits_").toString
    val bip = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L)).toDF("s", "d")
    GraphRankService.buildHits(bip, "s", "d", root, iterations = 2)
    val svc = GraphRankService.overParquetDirHits(spark, root, maxK = 10)
    val direct = Graph.hitsInt(bip, "s", "d", iterations = 2)
      .as[(Long, Long, Long)].collect()
    val authTop = direct.sortBy { case (n, a, _) => (-a, n) }.take(2)
      .zipWithIndex.map { case ((n, a, _), i) => (n, a, i + 1) }.toSeq
    assert(svc.topAuthorities(2) === authTop)
    val hubTop = direct.sortBy { case (n, _, h) => (-h, n) }.take(2)
      .zipWithIndex.map { case ((n, _, h), i) => (n, h, i + 1) }.toSeq
    assert(svc.topHubs(2) === hubTop)
  }

  test("buildTriangles + overParquetDirTriangles: stored probe ≡ direct " +
      "compute; statsOf point lookups; globalFrame closure stats") {
    val root = java.nio.file.Files.createTempDirectory("gr_tri_").toString
    // two triangles sharing edge 1–2 (hand-checked in GraphSpec):
    // nodes 1,2 sit in 2 triangles; 3,4 in 1 each
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (1L, 4L))
      .toDF("s", "d")
    GraphRankService.buildTriangles(e, "s", "d", root)
    val svc = GraphRankService.overParquetDirTriangles(spark, root, maxK = 10)
    val direct = Graph.triangleCounts(e, "s", "d")
      .as[(Long, Long, Long, Long)].collect()
      .sortBy { case (n, t, _, _) => (-t, n) }
      .zipWithIndex.map { case ((n, t, d, w), i) => (n, t, d, w, i + 1) }
      .toSeq
    assert(svc.topKFrame(4).as[(Long, Long, Long, Long, Int)]
      .collect().toSeq === direct)
    assert(svc.statsOf(Seq(1L, 3L, 99L)) ===
      Map(1L -> ((2L, 3L, 3L)), 3L -> ((1L, 2L, 1L))))
    // global: 6 corner counts / 3 = 2 triangles; wedges Σ d(d−1)/2
    assert(svc.globalFrame().as[(Long, Long, Long)].collect().toSeq ===
      Seq((2L, 3L + 3L + 1L + 1L, 4L)))
    intercept[IllegalArgumentException] { svc.topKFrame(0) }
    intercept[IllegalArgumentException] { svc.statsOf(Seq.empty) }
  }

  test("refreshTriangles: marker-fenced swap; re-opened service serves " +
      "the new graph") {
    val root = java.nio.file.Files.createTempDirectory("gr_tri2_").toString
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    GraphRankService.buildTriangles(e, "s", "d", root)
    // the triangle breaks: edge 1–3 removed
    val broken = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    GraphRankService.refreshTriangles(spark, root, broken, "s", "d")
    val svc = GraphRankService.overParquetDirTriangles(spark, root)
    assert(svc.globalFrame().as[(Long, Long, Long)].collect().toSeq ===
      Seq((0L, 1L, 3L))) // no triangles; node 2's wedge remains
  }

  test("buildKCore + overParquetDirKCore: fixpoint core stored; probe ≡ " +
      "direct compute; coreDegreeOf absence = peeled; refresh") {
    val root = java.nio.file.Files.createTempDirectory("gr_core_").toString
    // triangle + pendant chain (GraphSpec's cascade graph): exact 2-core
    // is the triangle, which needs the fixpoint loop to find (2 peels)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    GraphRankService.buildKCore(e, "s", "d", root, k = 2)
    val svc = GraphRankService.overParquetDirKCore(spark, root, maxK = 10)
    assert(svc.topKFrame(5).as[(Long, Long, Int)].collect().toSeq ===
      Seq((1L, 2L, 1), (2L, 2L, 2), (3L, 2L, 3)))
    assert(svc.coreDegreeOf(Seq(1L, 4L, 5L)) === Map(1L -> 2L))
    intercept[IllegalArgumentException] { svc.coreDegreeOf(Seq.empty) }
    // refresh on a densified graph: 4 joins the core via edges to 1, 2
    val dense = e.union(Seq((4L, 1L), (4L, 2L)).toDF("s", "d"))
    GraphRankService.refreshKCore(spark, root, dense, "s", "d", k = 2)
    val re = GraphRankService.overParquetDirKCore(spark, root)
    assert(re.coreDegreeOf(Seq(1L, 2L, 3L, 4L, 5L)) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // maxRounds threads through the service layer: a 2-round budget
    // cannot confirm the cascade's 2-peel fixpoint → loud fail-fast
    // from build AND refresh, no need to bypass the service
    intercept[IllegalStateException] {
      GraphRankService.buildKCore(e, "s", "d",
        java.nio.file.Files.createTempDirectory("gr_core_mr_").toString,
        k = 2, maxRounds = 2)
    }
    intercept[IllegalStateException] {
      GraphRankService.refreshKCore(spark, root, e, "s", "d", k = 2,
        maxRounds = 2)
    }
    // ... and a raised budget succeeds through Maintenance's nightly
    assert(!Maintenance.nightlyKCore(spark, root, e, "s", "d", k = 2,
      maxRounds = 8))
    val after = GraphRankService.overParquetDirKCore(spark, root)
    assert(after.coreDegreeOf(Seq(1L, 2L, 3L)) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("buildCommunities + overParquetDirCommunities: stored labels ≡ " +
      "direct LPA; topK by community size; labelOf lookups; refresh " +
      "swaps to the new graph") {
    val root = java.nio.file.Files.createTempDirectory("gr_comm_").toString
    // two triangles bridged by 3–4 (GraphSpec's hand-traced LPA graph):
    // 3 rounds → {1,2,3} label 1, {4,5,6} label 3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    GraphRankService.buildCommunities(e, "s", "d", root, rounds = 3)
    val svc = GraphRankService.overParquetDirCommunities(spark, root,
      maxK = 10)
    assert(svc.labelOf(Seq(1L, 2L, 3L, 4L, 5L, 6L, 99L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(svc.topKFrame(5).as[(Long, Long, Int)].collect().toSeq ===
      Seq((1L, 3L, 1), (3L, 3L, 2)), "two size-3 communities, label ties")
    intercept[IllegalArgumentException] { svc.labelOf(Seq.empty) }
    // refresh on a shifted graph: the marker-fenced swap must serve the
    // NEW node set (old ids absent, new ids labeled per a direct LPA)
    val shifted = e.select(($"s" + 10L).as("s"), ($"d" + 10L).as("d"))
    GraphRankService.refreshCommunities(spark, root, shifted, "s", "d",
      rounds = 3)
    val re = GraphRankService.overParquetDirCommunities(spark, root)
    assert(re.labelOf(Seq(1L, 2L, 3L)) === Map.empty,
      "old node ids must be gone after the swap")
    assert(re.labelOf(Seq(11L, 12L, 13L, 14L, 15L, 16L)) ===
      Map(11L -> 11L, 12L -> 11L, 13L -> 11L,
        14L -> 13L, 15L -> 13L, 16L -> 13L),
      "shifted graph gets the shifted hand-traced labels")
  }

  test("hitsInt reliableCheckpoint: identical scores to the " +
      "localCheckpoint path; loud without a checkpoint dir") {
    val bip = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("s", "d")
    // guard only checkable while no ambient dir is set (SparkContext
    // cannot unset one; suite order must not matter)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val ex = intercept[IllegalArgumentException] {
        Graph.hitsInt(bip, "s", "d", iterations = 1,
          reliableCheckpoint = true)
      }
      assert(ex.getMessage.contains("setCheckpointDir"))
    }
    val dir = java.nio.file.Files.createTempDirectory("gr_ckpt_").toString
    // SparkContext has no unsetCheckpointDir; the temp dir stays set for
    // the rest of the JVM — harmless, nothing else checkpoints
    spark.sparkContext.setCheckpointDir(dir)
    val reliable = Graph.hitsInt(bip, "s", "d", iterations = 2,
      reliableCheckpoint = true).as[(Long, Long, Long)].collect().toSet
    val local = Graph.hitsInt(bip, "s", "d", iterations = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(reliable === local)
    // the reliable path actually wrote checkpoint data
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no checkpoint data written")
  }
}
