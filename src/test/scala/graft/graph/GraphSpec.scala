package graft.graph

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A→B, A→C, B→A; C dangling. dampNum/dampDen = 1/2, scale = 1000 —
  // every floor division below is hand-checkable.
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("s", "d")

  test("pageRankInt: hand-computed two iterations (teleport, floor " +
      "shares, dangling mass dropped)") {
    // teleport = ((2-1)*1000)/2 = 500; r0 = 1000 everywhere.
    // iter1: A→{B,C} share 1000 DIV 2 = 500 each; B→A share 1000.
    //   r1(A) = 500 + 1000/2 = 1000; r1(B) = 500 + 500/2 = 750; r1(C) = 750.
    // iter2: A shares 500 each; B shares 750.
    //   r2(A) = 500 + 750/2 = 875; r2(B) = r2(C) = 500 + 500/2 = 750.
    val r1 = Graph.pageRankInt(triangle, "s", "d", iterations = 1,
        scale = 1000L, dampNum = 1L, dampDen = 2L)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 1000L, 2L -> 750L, 3L -> 750L))
    val r2 = Graph.pageRankInt(triangle, "s", "d", iterations = 2,
        scale = 1000L, dampNum = 1L, dampDen = 2L)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 875L, 2L -> 750L, 3L -> 750L))
  }

  test("pageRankInt: parallel edges collapse and self-loops drop") {
    val noisy = triangle
      .union(Seq((1L, 2L), (1L, 2L), (2L, 2L), (3L, 3L)).toDF("s", "d"))
    val clean = Graph.pageRankInt(triangle, "s", "d", iterations = 3,
      scale = 1000L, dampNum = 1L, dampDen = 2L).as[(Long, Long)].collect().toSet
    val got = Graph.pageRankInt(noisy, "s", "d", iterations = 3,
      scale = 1000L, dampNum = 1L, dampDen = 2L).as[(Long, Long)].collect().toSet
    assert(got === clean)
  }

  test("pageRankInt: a node with no in-edges holds exactly the teleport " +
      "mass from iteration 1 on") {
    // B→A only: B has no in-edges → rank(B) = teleport after any i ≥ 1.
    val r = Graph.pageRankInt(Seq((2L, 1L)).toDF("s", "d"),
        "s", "d", iterations = 4, scale = 1000000000L)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) === 150000000L) // ((100-85)*1e9)/100
    assert(r(1L) > r(2L), "the pointed-at node outranks the pointer")
  }

  test("pageRankInt: default-parameter run is deterministic and " +
      "positive-ranked on a denser graph") {
    val edges = (for {
      s <- 1L to 12L; d <- 1L to 12L
      if s != d && (s + d) % 3 != 0
    } yield (s, d)).toDF("s", "d")
    val a = Graph.pageRankInt(edges, "s", "d").as[(Long, Long)].collect().toSet
    val b = Graph.pageRankInt(edges, "s", "d").as[(Long, Long)].collect().toSet
    assert(a === b && a.size === 12 && a.forall(_._2 > 0))
  }

  test("pageRankIntWeighted: exact floor shares on non-dividing weights " +
      "(the division identity) and parallel-edge summation") {
    // A→B w=3, A→C w=4 (wsum 7), no in-edges to A; damp 1/2, scale 1000.
    // share(A→B) = floor(1000·3/7) = 428, share(A→C) = floor(4000/7) = 571
    // r1(A) = 500; r1(B) = 500 + 428/2 = 714; r1(C) = 500 + 285 = 785.
    val e = Seq((1L, 2L, 3L), (1L, 3L, 4L)).toDF("s", "d", "w")
    val r1 = Graph.pageRankIntWeighted(e, "s", "d", "w", iterations = 1,
        scale = 1000L, dampNum = 1L, dampDen = 2L)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 500L, 2L -> 714L, 3L -> 785L))
    // parallel edges SUM their weights (w=2 plus w=1 ≡ one w=3 edge)
    val par = Seq((1L, 2L, 2L), (1L, 2L, 1L), (1L, 3L, 4L)).toDF("s", "d", "w")
    val r1p = Graph.pageRankIntWeighted(par, "s", "d", "w", iterations = 1,
        scale = 1000L, dampNum = 1L, dampDen = 2L)
      .as[(Long, Long)].collect().toMap
    assert(r1p === r1)
    // uniform weights ≡ the unweighted form
    val uni = triangle.withColumn("w", org.apache.spark.sql.functions.lit(5L))
    val w2 = Graph.pageRankIntWeighted(uni, "s", "d", "w", iterations = 3,
      scale = 1000L, dampNum = 1L, dampDen = 2L).as[(Long, Long)].collect().toSet
    val u2 = Graph.pageRankInt(triangle, "s", "d", iterations = 3,
      scale = 1000L, dampNum = 1L, dampDen = 2L).as[(Long, Long)].collect().toSet
    assert(w2 === u2)
    // a null / non-positive weight is a loud failure, never a 0 share
    val bad = Seq((1L, 2L, 0L)).toDF("s", "d", "w")
    val ex = intercept[Exception] {
      Graph.pageRankIntWeighted(bad, "s", "d", "w").collect()
    }
    assert(ex.getMessage != null)
    // a FRACTIONAL weight column is a type-level argument error — a
    // silent per-edge truncation would diverge from the SQL replay
    val frac = Seq((1L, 2L, 0.5)).toDF("s", "d", "w")
    val te = intercept[IllegalArgumentException] {
      Graph.pageRankIntWeighted(frac, "s", "d", "w")
    }
    assert(te.getMessage.contains("integral weight column"))
  }

  test("pageRankIntPersonalized: hand-computed seeded walk — teleport " +
      "only on seeds, unreachable nodes converge to 0") {
    // triangle, seeds = {A}, damp 1/2, scale 1000:
    // r0 = (1000, 0, 0); r1 = (500, 250, 250); r2 = (625, 125, 125)
    val seeds = Seq(1L).toDF("id")
    val r2 = Graph.pageRankIntPersonalized(triangle, "s", "d", seeds, "id",
        iterations = 2, scale = 1000L, dampNum = 1L, dampDen = 2L)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 625L, 2L -> 125L, 3L -> 125L))
    // a node the seeds cannot reach holds rank 0 — that IS the signal
    val chain = Seq((1L, 2L), (3L, 1L)).toDF("s", "d") // 3→1→2, seed {1}
    val r = Graph.pageRankIntPersonalized(chain, "s", "d", seeds, "id",
        iterations = 4, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(r(3L) === 0L && r(1L) > 0L && r(2L) > 0L)
    // seeds outside the node set are ignored (no edges to walk)
    val ghost = Graph.pageRankIntPersonalized(triangle, "s", "d",
        Seq(99L).toDF("id"), "id", iterations = 2, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(ghost.values.forall(_ === 0L))
  }

  test("hitsInt: hand-computed bipartite iteration (downscale divisor, " +
      "zero scores outside each direction)") {
    // c1→s1, c1→s2, c2→s1 at scale 1000, one iteration:
    // a_raw: s1 = 2000, s2 = 1000 → divisor 2 → a: s1 = 1000, s2 = 500
    // h_raw: c1 = 1500, c2 = 1000 → divisor 2 → h: c1 = 750, c2 = 500
    val e = Seq((1L, 11L), (1L, 12L), (2L, 11L)).toDF("s", "d")
    val out = Graph.hitsInt(e, "s", "d", iterations = 1, scale = 1000L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> ((0L, 750L)), 2L -> ((0L, 500L)),
      11L -> ((1000L, 0L)), 12L -> ((500L, 0L))))
  }

  test("hitsInt: dense graph at default scale stays inside BIGINT " +
      "(ANSI overflow would throw) with scores bounded by scale") {
    val edges = (for { s <- 1L to 40L; d <- 1L to 40L; if s != d }
      yield (s, d)).toDF("s", "d")
    val out = Graph.hitsInt(edges, "s", "d").as[(Long, Long, Long)].collect()
    assert(out.length === 40)
    assert(out.forall(r => r._2 > 0 && r._2 <= 1000000000L &&
      r._3 > 0 && r._3 <= 1000000000L))
  }

  test("pageRankInt: argument guards fail loudly") {
    intercept[IllegalArgumentException] {
      Graph.pageRankInt(triangle, "s", "d", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankInt(triangle, "s", "d", dampNum = 100L, dampDen = 100L)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankInt(triangle, "s", "d", scale = 10L)
    }
  }

  test("triangleCounts: hand-computed graph — two shared-edge triangles, " +
      "direction/duplicates/self-loops ignored") {
    // undirected {1-2, 1-3, 2-3, 2-4, 3-4}: triangles {1,2,3} and {2,3,4}.
    // fed as a noisy DIRECTED list: reversed copies, a duplicate, self-loop
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L), (2L, 4L),
      (4L, 3L), (3L, 2L), (4L, 4L)).toDF("s", "d")
    val out = Graph.triangleCounts(e, "s", "d")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      1L -> ((1L, 2L, 1L)),   // deg 2 → 1 wedge, in 1 triangle
      2L -> ((2L, 3L, 3L)),   // deg 3 → 3 wedges, in both triangles
      3L -> ((2L, 3L, 3L)),
      4L -> ((1L, 2L, 1L))))
  }

  test("triangleCounts: triangle-free star has zero triangles and hub " +
      "wedge capacity n·(n−1)/2; complete K5 closes every wedge") {
    val star = (2L to 6L).map(i => (1L, i)).toDF("s", "d")
    val s = Graph.triangleCounts(star, "s", "d")
      .as[(Long, Long, Long, Long)].collect()
    assert(s.forall(_._2 === 0L))
    assert(s.find(_._1 === 1L).get._4 === 10L) // C(5,2) hub wedges
    val k5 = (for { a <- 1L to 5L; b <- 1L to 5L; if a != b }
      yield (a, b)).toDF("s", "d")
    val k = Graph.triangleCounts(k5, "s", "d")
      .as[(Long, Long, Long, Long)].collect()
    // every node: C(4,2) = 6 triangles through it = its 6 wedges, all closed
    assert(k.forall(r => r._2 === 6L && r._3 === 4L && r._4 === 6L))
    assert(k.map(_._2).sum / 3 === 10L) // C(5,3) distinct triangles
  }

  test("bfsHops: hand-computed path — min hop per node, bounded depth, " +
      "unreached nodes absent, multi-seed takes the nearer seed") {
    // undirected path 1-2-3-4-5 (both directions fed)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("s", "d")
    val seeds1 = Seq(1L).toDF("k")
    val full = Graph.bfsHops(path, "s", "d", seeds1, "k", maxHops = 4)
    val fullMap = full.as[(Long, Int)].collect().toMap
    assert(fullMap === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    full.unpersist(blocking = true)
    val capped = Graph.bfsHops(path, "s", "d", seeds1, "k", maxHops = 2)
    assert(capped.as[(Long, Int)].collect().toMap ===
      Map(1L -> 0, 2L -> 1, 3L -> 2)) // 4, 5 beyond the bound → absent
    capped.unpersist(blocking = true)
    // seeds at both ends: middle node takes min hop; seed 99 (not in the
    // graph) is ignored
    val both = Graph.bfsHops(path, "s", "d",
      Seq(1L, 5L, 99L).toDF("k"), "k", maxHops = 4)
    assert(both.as[(Long, Int)].collect().toMap ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
    both.unpersist(blocking = true)
  }

  test("pageRankInt: segmented resume is EXACT — 3 + 2 iterations via " +
      "ranksInit equal 5 straight, and unseen init nodes start cold") {
    val edges = (for {
      s <- 1L to 12L; d <- 1L to 12L
      if s != d && (s + d) % 3 != 0
    } yield (s, d)).toDF("s", "d")
    val straight = Graph.pageRankInt(edges, "s", "d", iterations = 5)
      .as[(Long, Long)].collect().toSet
    val seg1 = Graph.pageRankInt(edges, "s", "d", iterations = 3)
    val resumed = Graph.pageRankInt(edges, "s", "d", iterations = 2,
        ranksInit = Some(seg1))
      .as[(Long, Long)].collect().toSet
    assert(resumed === straight) // bit-for-bit, not approximately
    // init missing a node → that node starts at the cold `scale`:
    // resuming with a PARTIAL frame equals a run whose r0 mixes values
    val partial = seg1.filter($"node" =!= 1L)
    val mixed = Graph.pageRankInt(edges, "s", "d", iterations = 2,
      ranksInit = Some(partial)).as[(Long, Long)].collect().toMap
    assert(mixed.size === 12 && mixed.values.forall(_ > 0))
  }

  test("commonNeighborRecs: hand-computed 2-hop scores — adjacency and " +
      "self excluded, minCommon gate, per-seed rank") {
    // undirected: seed 1 - {2,3}; 2 - {4,5}; 3 - {4}; 4 - {6}.
    // candidates of 1: 4 via {2,3} (2 common), 5 via {2} (1), 6 not at
    // 2 hops; 2,3 are adjacent → excluded.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 4L),
        (4L, 6L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("s", "d")
    val seeds = Seq(1L).toDF("k")
    val r = Graph.commonNeighborRecs(und, "s", "d", seeds, "k", k = 10)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(r === Set((1L, 4L, 2L, 1), (1L, 5L, 1L, 2)))
    // minCommon = 2 drops the single-path candidate
    val r2 = Graph.commonNeighborRecs(und, "s", "d", seeds, "k", k = 10,
      minCommon = 2L).as[(Long, Long, Long, Int)].collect().toSet
    assert(r2 === Set((1L, 4L, 2L, 1)))
    // k truncates per seed by (count desc, candidate)
    val r3 = Graph.commonNeighborRecs(und, "s", "d", seeds, "k", k = 1)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(r3 === Set((1L, 4L, 2L, 1)))
    intercept[IllegalArgumentException] {
      Graph.commonNeighborRecs(und, "s", "d", seeds, "k", k = 0)
    }
  }

  test("kCoreNodes: hand-computed peel — cascade removal across rounds, " +
      "end-state degrees, fixpoint stability") {
    // triangle {1,2,3} + pendant chain 3-4, 4-5: 2-core peel round 1
    // removes 5 (deg 1); round 2 removes 4 (its degree FELL to 1 when 5
    // left — the cascade); the triangle is the 2-core fixpoint.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val r1 = Graph.kCoreNodes(e, "s", "d", k = 2, rounds = 1)
    assert(r1.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L)) // 4 survives round 1
    r1.unpersist(blocking = true)
    val r2 = Graph.kCoreNodes(e, "s", "d", k = 2, rounds = 2)
    assert(r2.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // the cascade got 4; core is clean
    r2.unpersist(blocking = true)
    val r5 = Graph.kCoreNodes(e, "s", "d", k = 2, rounds = 5)
    assert(r5.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // fixpoint: extra rounds no-op
    r5.unpersist(blocking = true)
    // k above the max degree empties the graph entirely
    val empty = Graph.kCoreNodes(e, "s", "d", k = 4, rounds = 2)
    assert(empty.count() === 0)
    empty.unpersist(blocking = true)
    intercept[IllegalArgumentException] {
      Graph.kCoreNodes(e, "s", "d", k = 0, rounds = 1)
    }
    intercept[IllegalArgumentException] {
      Graph.kCoreNodes(e, "s", "d", k = 2, rounds = -1)
    }
  }

  test("kCoreNodes rounds = 0: iterates to the exact fixpoint (≡ a " +
      "large bounded peel) and maxRounds fail-fasts a truncated budget") {
    // same cascade graph as above: fixpoint needs 2 peel rounds + 1
    // confirming round
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val fix = Graph.kCoreNodes(e, "s", "d", k = 2, rounds = 0)
    assert(fix.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    fix.unpersist(blocking = true)
    val bounded = Graph.kCoreNodes(e, "s", "d", k = 2, rounds = 8)
    assert(bounded.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L), "fixpoint ≡ large-rounds peel")
    bounded.unpersist(blocking = true)
    // a 2-round budget cannot confirm the 2-peel cascade's stability
    intercept[IllegalStateException] {
      Graph.kCoreNodes(e, "s", "d", k = 2, rounds = 0, maxRounds = 2)
    }
    // an emptying peel still stabilizes (at the empty set), not errors
    val empty = Graph.kCoreNodes(e, "s", "d", k = 4, rounds = 0)
    assert(empty.count() === 0)
    empty.unpersist(blocking = true)
  }

  test("kCoreNodesCounted: measured peel depth — the stale-oracle gate " +
      "an unrolled fixed-depth replay asserts against") {
    // the cascade graph needs exactly 2 removing rounds (5 then 4);
    // the confirming no-op round is NOT counted
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val (core, peelRounds) = Graph.kCoreNodesCounted(e, "s", "d",
      k = 2, rounds = 0)
    assert(peelRounds === 2, s"expected peel depth 2, got $peelRounds")
    assert(core.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    core.unpersist(blocking = true)
    // an already-stable graph (the bare triangle) peels in 1 round
    // (the first survivor set differs from the sentinel, so round 1
    // counts; round 2 confirms)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val (c2, p2) = Graph.kCoreNodesCounted(tri, "s", "d", k = 2, rounds = 0)
    assert(p2 === 1 && c2.count() === 3)
    c2.unpersist(blocking = true)
    // bounded mode reports the requested rounds verbatim
    val (c3, p3) = Graph.kCoreNodesCounted(e, "s", "d", k = 2, rounds = 5)
    assert(p3 === 5)
    c3.unpersist(blocking = true)
  }

  test("kCoreNodes deep peel: a path graph cascades one endpoint pair " +
      "per round — the per-round edge pin keeps a 12-deep fixpoint from " +
      "compounding the semi-join chain") {
    // path 1-2-...-24: every 2-core round removes the two current
    // endpoints (deg 1), so the peel runs 12 removing rounds before the
    // survivor set empties. Before the per-round edge pin, round r's
    // degree aggregate re-derived r-1 stacked semi-joins from the base
    // edges — this fixture is the depth regression gate.
    val n = 24
    val path = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("s", "d")
    val (core, peelRounds) = Graph.kCoreNodesCounted(path, "s", "d",
      k = 2, rounds = 0)
    assert(core.count() === 0, "a path has no 2-core")
    assert(peelRounds === n / 2,
      s"expected ${n / 2} removing rounds, got $peelRounds")
    core.unpersist(blocking = true)
  }

  test("communities: synchronous min-label LPA — hand-computed two-" +
      "triangle graph converges to one label per community, " +
      "deterministically") {
    // triangles {1,2,3} and {4,5,6} bridged by 3–4. Sync LPA with
    // min-label ties, by hand:
    //   r1: 1→2, 2→1, 3→1, 4→3, 5→4, 6→4
    //   r2: 1→1, 2→1, 3→1, 4→4, 5→3, 6→3
    //   r3: {1,2,3}→1, {4,5,6}→3 — the two communities
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    val r3 = Graph.communities(e, "s", "d", rounds = 3)
    assert(r3.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    r3.unpersist(blocking = true)
    // intermediate round matches the hand trace (the sync semantics pin)
    val r2 = Graph.communities(e, "s", "d", rounds = 2)
    assert(r2.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L))
    r2.unpersist(blocking = true)
    // determinism: same input, same labels
    val again = Graph.communities(e, "s", "d", rounds = 3)
    assert(again.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    again.unpersist(blocking = true)
    // parallel edges / self-loops / direction are normalized away
    val noisy = e.union(Seq((2L, 1L), (1L, 1L), (2L, 3L)).toDF("s", "d"))
    val clean = Graph.communities(noisy, "s", "d", rounds = 3)
    assert(clean.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    clean.unpersist(blocking = true)
    intercept[IllegalArgumentException] {
      Graph.communities(e, "s", "d", rounds = 0)
    }
  }

  test("bfsHops: edge DIRECTION is respected, and the reliable-checkpoint " +
      "knob demands a checkpoint dir") {
    val arc = Seq((1L, 2L)).toDF("s", "d") // 1→2 only
    val fwd = Graph.bfsHops(arc, "s", "d", Seq(1L).toDF("k"), "k", 2)
    assert(fwd.as[(Long, Int)].collect().toMap === Map(1L -> 0, 2L -> 1))
    fwd.unpersist(blocking = true)
    val back = Graph.bfsHops(arc, "s", "d", Seq(2L).toDF("k"), "k", 2)
    assert(back.as[(Long, Int)].collect().toMap === Map(2L -> 0))
    back.unpersist(blocking = true)
    intercept[IllegalArgumentException] {
      Graph.bfsHops(arc, "s", "d", Seq(1L).toDF("k"), "k", 0)
    }
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        Graph.bfsHops(arc, "s", "d", Seq(1L).toDF("k"), "k", 2,
          reliableCheckpoint = true)
      }
    }
  }
}
