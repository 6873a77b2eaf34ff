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
}
