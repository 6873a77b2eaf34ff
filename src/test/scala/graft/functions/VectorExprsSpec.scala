package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot: float arrays, Column API") {
    val d = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
      .toDF("a", "b").select(VectorExprs.dot(col("a"), col("b"))).as[Double].head()
    assert(d === 32.0)
  }

  test("vec_dot: double arrays and SQL surface via GraftExtensions") {
    val d = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(d === 11.0)
  }

  test("vec_dot: length mismatch uses the common prefix; nulls skipped") {
    val d = Seq((Array(Some(1f), None, Some(3f)), Array(Some(2f), Some(2f))))
      .toDF("a", "b").select(VectorExprs.dot(col("a"), col("b"))).as[Double].head()
    assert(d === 2.0)   // only index 0 contributes: 1*2; index 1 null, index 2 beyond b
  }

  test("vec_dot rejects non-numeric-array inputs at analysis time") {
    val e = intercept[Exception] {
      Seq((Array("x"), Array("y"))).toDF("a", "b")
        .select(VectorExprs.dot(col("a"), col("b"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("vec_dot") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("norm and cosine built on the native dot") {
    val r = Seq((Array(3f, 4f), Array(3f, 4f), Array(0f, 0f)))
      .toDF("a", "b", "z")
      .select(VectorExprs.norm(col("a")).as("n"),
        VectorExprs.cosine(col("a"), col("b")).as("c"),
        VectorExprs.cosine(col("a"), col("z")).as("cz"))
      .as[(Double, Double, Double)].head()
    assert(r === ((5.0, 1.0, 0.0)))
  }
}
