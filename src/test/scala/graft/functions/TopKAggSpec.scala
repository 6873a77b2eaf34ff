package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native bounded-heap top-k aggregate: ordering, tie-break,
  * partial/merge correctness at any parallelism, and equivalence with the
  * window formulation it replaces. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk_desc keeps k best by (score desc, id asc), SQL surface") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L),
        (2L, 0.5, 20L))
      .toDF("g", "s", "id")
    df.createOrReplaceTempView("tk_in")
    val r = spark.sql(
      "SELECT g, topk_desc(s, id, 2) AS tk FROM tk_in GROUP BY g ORDER BY g")
      .selectExpr("g", "tk.score", "tk.id").as[(Long, Seq[Double], Seq[Long])].collect()
    assert(r(0) === ((1L, Seq(0.9, 0.9), Seq(9L, 10L)))) // tie → lower id first
    assert(r(1) === ((2L, Seq(0.5), Seq(20L))))           // fewer than k rows
  }

  test("invalid k rejected at analysis time, not mid-query on an executor") {
    Seq((1L, 0.5, 10L)).toDF("g", "s", "id").createOrReplaceTempView("tk_bad")
    Seq("topk_desc(s, id, 0)", "topk_desc(s, id, -3)",
        "topk_desc(s, id, NULL)", "topk_desc(s, id, 'x')").foreach { call =>
      val e = intercept[Exception] {
        spark.sql(s"SELECT g, $call FROM tk_bad GROUP BY g").collect()
      }
      assert(e.getMessage.contains("topk_desc"), s"$call: ${e.getMessage}")
    }
  }

  test("duplicate (score, id) pairs never shrink the kept set below k") {
    // Regression: with a full buffer, a duplicate pair's add() returns
    // false; the old insert still evicted the current worst entry, so each
    // repeat of a good pair lost one valid top-k entry. 10 copies of the
    // two best pairs must still leave k=3 entries, with the third-best
    // (0.1, 99) retained.
    val rows = Seq.fill(10)(Seq((1L, 0.9, 1L), (1L, 0.8, 2L))).flatten :+ ((1L, 0.1, 99L))
    val r = rows.toDF("g", "s", "id").repartition(1)
      .groupBy("g")
      .agg(call_function("topk_desc", col("s"), col("id"), lit(3)).as("tk"))
      .selectExpr("tk.score", "tk.id").as[(Seq[Double], Seq[Long])].head()
    assert(r === ((Seq(0.9, 0.8, 0.1), Seq(1L, 2L, 99L))))
  }

  test("partial + merge: result independent of partitioning") {
    val rows = (0 until 500).map(i => (i % 7L, (i % 83) / 100.0, i.toLong))
    def run(parts: Int) = rows.toDF("g", "s", "id").repartition(parts)
      .groupBy("g")
      .agg(call_function("topk_desc", col("s"), col("id"), lit(5)).as("tk"))
      .orderBy("g").selectExpr("g", "tk.score", "tk.id")
      .collect().map(_.toSeq)
    assert(run(1).toSeq === run(13).toSeq)
  }

  test("bruteForceTopKAgg ≡ window bruteForceTopK") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 80).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 5)
    val win = graft.sim.Similarity.bruteForceTopK(df, q, k = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val agg = graft.sim.Similarity.bruteForceTopKAgg(df, q, k = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(agg.toSeq === win.toSeq)
  }
}
