package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
  * Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet and
  * individual Rank Learning Methods", public): combine a KEYWORD top-k
  * and a VECTOR top-k into one ranking without comparing their
  * incommensurable scores — each list contributes `1 / (kRrf + rank)`
  * and the fused score is the sum. This is the standard first-stage
  * shape of a modern retrieval stack (BM25 ∪ ANN → fuse → rerank):
  * neither list alone finds everything (keyword misses paraphrase,
  * vectors miss exact identifiers), and RRF needs no score calibration
  * between them.
  *
  * Determinism: each term is one IEEE division of exact integers and
  * the two-list sum is a single commutative addition — no reduction
  * order to drift — so the fused ranking is hash-checkable cross-engine
  * whenever both input rankings are (`srv_hybrid_rrf` certifies the
  * whole pipeline).
  *
  * Scale shape: the inputs are already top-k frames (k rows per query,
  * never corpus-sized), so the fusion is a full-outer join + window over
  * O(queries · k) rows — negligible next to the probes that produced
  * them. At serving time use [[fuseRanked]], which does the same
  * arithmetic on two collected k-row lists with no Spark job at all. */
object HybridSearch {

  /** Fuse two ranked frames — each (queryCol, candCol, rankCol) with
    * rank 1..k per query — into the RRF top-`k`:
    * (query_id, cand_id, rrf, rank). Candidates present in only one
    * list contribute a single term (the other side adds 0.0). Ties
    * break by candidate id, the repo-wide deterministic order. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kRrf: Int = 60,
              queryCol: String = "query_id", candCol: String = "cand_id",
              rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    require(kRrf > 0, s"kRrf must be > 0, got $kRrf")
    def side(df: DataFrame, out: String) =
      df.select(col(queryCol).as("query_id"), col(candCol).as("cand_id"),
        col(rankCol).as(out))
    val joined = side(a, "__ra")
      .join(side(b, "__rb"), Seq("query_id", "cand_id"), "full_outer")
    val term = (r: String) => coalesce(
      lit(1.0) / (lit(kRrf) + col(r)).cast(org.apache.spark.sql.types.DoubleType),
      lit(0.0))
    val scored = joined.withColumn("rrf",
      round(term("__ra") + term("__rb"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rrf"), col("rank"))
  }

  /** The serving-side form: fuse two collected top-k lists of
    * (id, rank) — e.g. an [[AnnBackend.topK]] result and a
    * [[SearchService.topK]] result — into the RRF top-`k` of
    * (id, rrf, rank). Pure driver-side arithmetic (the lists are ≤ maxK
    * rows each); identical scoring to [[rrfFuse]] INCLUDING the round-6
    * before ranking — at deep ranks adjacent reciprocal terms differ by
    * less than 1e-6, and ranking raw doubles here while the certified
    * frame form ranks rounded values would let the served order diverge
    * from the hash-checked one. */
  def fuseRanked(a: Seq[(Long, Int)], b: Seq[(Long, Int)], k: Int,
                 kRrf: Int = 60): Seq[(Long, Double, Int)] = {
    require(k > 0, s"k must be > 0, got $k")
    require(kRrf > 0, s"kRrf must be > 0, got $kRrf")
    val ra = a.toMap
    val rb = b.toMap
    (ra.keySet ++ rb.keySet).toSeq
      .map { id =>
        val s = ra.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0) +
          rb.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0)
        // Spark round() is decimal HALF_UP — mirror it exactly
        (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
  }
}
