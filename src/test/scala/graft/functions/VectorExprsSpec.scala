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

  test("vec_quantize_i8: scale = max|x|/127, extremes map to ±127, zero vector safe") {
    val df = Seq((Array(1.0f, -2.0f, 0.5f), Array(0.0f, 0.0f, 0.0f))).toDF("a", "z")
    val r = df.select(VectorExprs.quantizeI8(col("a")).as("qa"),
        VectorExprs.quantizeI8(col("z")).as("qz"))
      .selectExpr("qa.scale", "qa.q", "qz.scale", "qz.q").head()
    assert(math.abs(r.getDouble(0) - 2.0 / 127) < 1e-15)
    val q = r.getAs[Array[Byte]](1)
    assert(q(1) === -127.toByte)                    // -max → -127
    assert(q(0) === math.floor(1.0 / (2.0 / 127) + 0.5).toByte) // 64
    assert(r.getDouble(2) === 0.0 && r.getAs[Array[Byte]](3).forall(_ === 0))
  }

  test("vec_dot_i8 reconstructs the exact dot within quantization error") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .select(col("id"), col("v"), VectorExprs.quantizeI8(col("v")).as("qv"))
    val a = df.alias("a"); val b = df.alias("b")
    val errs = a.join(b, col("a.id") < col("b.id"))
      .select((VectorExprs.dotI8(col("a.qv"), col("b.qv")) -
        VectorExprs.dot(col("a.v"), col("b.v"))).as("e"),
        VectorExprs.norm(col("a.v")).as("na"), VectorExprs.norm(col("b.v")).as("nb"))
      .selectExpr("abs(e) / (na * nb)").as[Double].collect()
    // int8 relative error bound: per-element ≤ scale/2 → relative ~ sqrt(d)/254
    assert(errs.max < 0.05, s"max relative error ${errs.max}")
  }

  test("vec_dequantize_i8 round-trip: max relative error ≤ scale/2 per element") {
    val v = Array(1.0f, -2.0f, 0.5f, 0.0f)
    val df = Seq(Tuple1(v)).toDF("v")
    val back = df.select(VectorExprs.dequantizeI8(VectorExprs.quantizeI8(col("v"))).as("r"))
      .as[Array[Float]].head()
    assert(back.length === 4)
    val scale = 2.0 / 127
    v.zip(back).foreach { case (orig, rec) =>
      assert(math.abs(orig - rec) <= scale / 2 + 1e-7, s"$orig vs $rec")
    }
    // zero vector → zero vector, not NaN
    val z = df.select(VectorExprs.dequantizeI8(
      VectorExprs.quantizeI8(expr("array(0.0f, 0.0f)"))).as("r")).as[Array[Float]].head()
    assert(z.forall(_ === 0.0f))
  }

  test("vec_dot_i8 SQL surface and analysis-time rejection of raw arrays") {
    val one = spark.sql(
      "SELECT vec_dot_i8(vec_quantize_i8(array(1.0f, 2.0f)), " +
        "vec_quantize_i8(array(1.0f, 2.0f))) AS s").as[Double].head()
    assert(math.abs(one - 5.0) < 0.02)   // q=[64,127], recon ≈ 5.0158
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot_i8(array(1.0f), array(1.0f))").collect()
    }
    assert(e.getMessage.contains("vec_dot_i8"))
  }

  test("vec_sub: elementwise difference, common prefix, float/double mix, SQL surface") {
    val out = Seq((Array(5f, 3f, 1f), Array(1f, 1f)))
      .toDF("a", "b").select(VectorExprs.sub(col("a"), col("b")).as("d"))
      .as[Array[Float]].head()
    assert(out.toSeq === Seq(4f, 2f), "common-prefix semantics like vec_dot")
    val mixed = spark.sql(
      "SELECT vec_sub(array(2.5D, 1.0D), array(1.0f, 0.5f)) AS d")
      .as[Array[Float]].head()
    assert(mixed.toSeq === Seq(1.5f, 0.5f))
    assert(spark.sql("SELECT vec_sub(CAST(NULL AS ARRAY<FLOAT>), array(1.0f)) AS d")
      .collect().head.isNullAt(0))
  }

  test("multiple instances of each vector expression compile in ONE projection (no codegen fallback)") {
    // Regression for the round-9 silent perf bug: fixed local names in
    // doGenCode ("int n", "double acc", "i") compiled fine alone but a
    // projection with TWO instances — every IVF/PQ distance shape
    // dot(v,v) − 2·dot(v,c) + dot(c,c) — hit janino "Redefinition of
    // local variable" and dropped the whole stage to interpreted mode.
    // With fallback disabled the old bug turns into a hard failure here.
    val conf = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Array(1f, 2f), Array(3f, 4f)))
        .toDF("v", "c")
      val dist2 = df.select(
        (VectorExprs.dot(col("v"), col("v"))
          - lit(2.0) * VectorExprs.dot(col("v"), col("c"))
          + VectorExprs.dot(col("c"), col("c"))).as("d2")).as[Double].head()
      // (1-3)² + (2-4)² = 8
      assert(dist2 === 8.0)
      val qd = df.select(VectorExprs.dotI8(
          VectorExprs.quantizeI8(col("v")), VectorExprs.quantizeI8(col("v")))
        + VectorExprs.dotI8(
          VectorExprs.quantizeI8(col("c")), VectorExprs.quantizeI8(col("c"))))
        .as[Double].head()
      assert(math.abs(qd - (5.0 + 25.0)) < 0.1, s"quantized self-dots: $qd")
      val deq = df.select(
        VectorExprs.dot(
          VectorExprs.dequantizeI8(VectorExprs.quantizeI8(col("v"))).cast("array<double>"),
          VectorExprs.dequantizeI8(VectorExprs.quantizeI8(col("c"))).cast("array<double>")))
        .as[Double].head()
      assert(math.abs(deq - 11.0) < 0.05, s"dequantized dot: $deq")
    } finally spark.conf.set("spark.sql.codegen.fallback", conf)
  }

  test("text_unaccent: strips diacritics, normalizes decomposed forms, keeps ASCII") {
    val cases = Seq(
      "café",            // precomposed é
      "cafe\u0301",      // decomposed e + combining acute — same output
      "žluťoučký kůň",   // caron/ring diacritics
      "plain ascii 42!", // untouched
      "")
    val out = cases.toDF("s")
      .select(VectorExprs.unaccent(col("s")).as("n")).as[String].collect()
    assert(out.sameElements(Array(
      "cafe", "cafe", "zlutoucky kun", "plain ascii 42!", "")))
    // SQL surface + null safety
    assert(spark.sql("SELECT text_unaccent('São_Paulo') AS n")
      .as[String].head() === "Sao_Paulo")
    assert(spark.sql("SELECT text_unaccent(CAST(NULL AS STRING)) AS n")
      .collect().head.isNullAt(0))
  }
}
