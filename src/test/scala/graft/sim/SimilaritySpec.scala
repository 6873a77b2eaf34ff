package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall checks for the ANN path vs the exact brute-force baseline. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  // Deterministic pseudo-random gaussian vectors (seeded per id).
  private def vec(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }

  private lazy val corpus = (0 until 60).map(i => (i.toLong, vec(i), 0))
  // Planted exact copies: id+10000 duplicates vector id.
  private lazy val planted = (0 until 10).map(i => ((i + 10000).toLong, vec(i), 0))

  private def df = (corpus ++ planted).toDF("vec_id", "embedding", "label")

  test("cosine: self = 1, orthogonal = 0, zero vector safe") {
    val d = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(round(Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .as[Double].collect()
    assert(d.sameElements(Array(1.0, 0.0, 0.0)))
  }

  test("bruteForceTopK ranks the planted duplicate first for every query") {
    val queries = df.filter(col("vec_id") < 10)
    val top = Similarity.bruteForceTopK(df, queries, k = 1)
      .select("query_id", "cand_id", "cosine").as[(Long, Long, Double)].collect()
    assert(top.length === 10)
    top.foreach { case (q, c, cos) =>
      assert(c === q + 10000, s"query $q top candidate $c")
      assert(cos === 1.0)
    }
  }

  test("LSH ANN finds every planted duplicate (identical sig ⇒ same buckets)") {
    val queries = df.filter(col("vec_id") < 10)
    val res = Similarity.lshTopK(df, queries, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    (0 until 10).foreach { q =>
      assert(res.contains((q.toLong, (q + 10000).toLong)),
        s"planted dup of $q missed by LSH")
    }
  }

  test("LSH ANN recall@5 vs brute force ≥ 0.6 on organic neighbors") {
    val queries = df.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(df, queries, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall $recall")
  }

  test("cosineNearDups at 0.95 returns exactly the planted pairs") {
    val pairs = Similarity.cosineNearDups(df, threshold = 0.95)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    assert(pairs.length === 10)
    pairs.foreach { case (a, b, c) =>
      assert(b === a + 10000 && c === 1.0)
    }
  }

  test("cosineNearDups scans the corpus ONCE (signature frame persisted)") {
    val acc = spark.sparkContext.longAccumulator("graft_rhp_scans")
    val tick = udf { (id: Long) => acc.add(1); true }
    val counted = df.filter(tick(col("vec_id")))
    Similarity.cosineNearDups(counted, threshold = 0.95).collect()
    val n = (corpus.length + planted.length).toLong
    assert(acc.value === n, s"corpus evaluated ${acc.value / n.toDouble}x, expected 1x")
  }
}
