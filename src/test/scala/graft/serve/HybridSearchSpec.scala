package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("fuseRanked: hand-computed RRF scores, one-sided candidates, " +
      "ties break by id") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3))
    val b = Seq((20L, 1), (40L, 2))
    // 20 -> 1/61 + 1/62 (both lists); 10 -> 1/61; 40 -> 1/62; 30 -> 1/63
    val out = HybridSearch.fuseRanked(a, b, k = 4)
    assert(out.map(_._1) === Seq(20L, 10L, 40L, 30L), out.toString)
    // scores carry the frame form's round-6 contract (HALF_UP)
    assert(out.head._2 === BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.map(_._3) === Seq(1, 2, 3, 4))
    // symmetric ranks → equal scores → id ascending
    val t = HybridSearch.fuseRanked(Seq((6L, 1), (5L, 2)),
      Seq((5L, 1), (6L, 2)), k = 2)
    assert(t.map(_._1) === Seq(5L, 6L))
    // k bounds the fused list
    assert(HybridSearch.fuseRanked(a, b, k = 1).map(_._1) === Seq(20L))
  }

  test("rrfFuse ≡ fuseRanked per query on the same rankings") {
    val a = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3),
      (1L, 30L, 1), (1L, 10L, 2)).toDF("query_id", "cand_id", "rank")
    val b = Seq((0L, 20L, 1), (0L, 40L, 2),
      (1L, 10L, 1), (1L, 50L, 2)).toDF("query_id", "cand_id", "rank")
    val fused = HybridSearch.rrfFuse(a, b, k = 3)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).toSeq).toMap
    def ranked(df: Seq[(Long, Long, Int)], q: Long) =
      df.filter(_._1 == q).map(t => (t._2, t._3))
    val aSeq = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3),
      (1L, 30L, 1), (1L, 10L, 2))
    val bSeq = Seq((0L, 20L, 1), (0L, 40L, 2), (1L, 10L, 1), (1L, 50L, 2))
    for (q <- Seq(0L, 1L)) {
      val want = HybridSearch.fuseRanked(ranked(aSeq, q), ranked(bSeq, q), 3)
      val got = fused(q).map(t => (t._2, t._4))
      assert(got === want.map(t => (t._1, t._3)), s"query $q: $got vs $want")
      // scores match too, at the frame's round-6 contract
      fused(q).map(_._3).zip(want.map(_._2)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 5e-7, s"query $q score: $g vs $w")
      }
    }
  }
}
