package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector-math hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) runs interpreted — lambda
  * dispatch and boxing per element — and dominated the embedding near-dup
  * runtime (measured ~23 s for ~500k candidate pairs × 64 dims). This
  * BinaryExpression generates a tight primitive loop inside whole-stage
  * codegen (SURVEY §7.3 escalation path (b): a custom `Expression` where
  * the built-in operators genuinely can't express the computation
  * efficiently). */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float>/array<double> inputs, got ${l.sql} / ${r.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName for EVERY emitted local: a projection containing two
      // instances of this expression (every dist² = dot(v,v) − 2·dot(v,c)
      // + dot(c,c) shape) lands both bodies in ONE generated method, and
      // fixed names fail janino ("Redefinition of local variable") —
      // silently dropping the whole stage to interpreted mode.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val lGet = if (elemIsFloat(left)) s"$a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $lGet) * ((double) $rGet);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 scalar quantization of a float/double vector — the
  * storage path for a 100 TB embedding store (4× smaller than float32,
  * 8× than float64). Output: struct(scale double, q binary) where
  * scale = max|x| / 127 and q[i] = floor(x[i]/scale + 0.5) as one signed
  * byte (explicit floor(+0.5) so SQL oracles can mirror the rounding
  * exactly; Math.round and SQL round() disagree on negative halves).
  * All-zero vectors quantize to scale 0 + zero bytes. Codegen'd. */
case class VectorQuantizeI8(child: Expression) extends UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_quantize_i8 expects array<float>/array<double>, got ${t.sql}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = elemIsFloat
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = math.abs(if (f) x.getFloat(i).toDouble else x.getDouble(i))
        if (v > maxAbs) maxAbs = v
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
          q(i) = math.floor(v / scale + 0.5).toByte
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, q))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName everywhere — see VectorDot.doGenCode
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = java.lang.Math.abs($get);
         |    if ($v > $maxAbs) $maxAbs = $v;
         |  }
         |}
         |double $scale = $maxAbs / 127.0;
         |byte[] $q = new byte[$n];
         |if ($scale > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $q[$i] = (byte) java.lang.Math.floor(($get) / $scale + 0.5);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$scale, $q});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorQuantizeI8 =
    copy(child = newChild)
}

/** Inverse of [[VectorQuantizeI8]]: struct(scale, q) → array<float> with
  * x[i] ≈ q[i]·scale. Codegen'd via `UnsafeArrayData.fromPrimitiveArray`
  * (no per-element boxing). Completes the storage API: quantize at write,
  * dequantize on the narrow post-candidate path when full precision is
  * needed again. */
case class VectorDequantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(StructField(_, DoubleType, _, _), StructField(_, BinaryType, _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_dequantize_i8 expects struct<scale:double,q:binary>, got ${t.sql}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val r = a.asInstanceOf[InternalRow]
    val scale = r.getDouble(0)
    val q = r.getBinary(1)
    val out = new Array[Float](q.length)
    var i = 0
    while (i < q.length) { out(i) = (q(i) * scale).toFloat; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName everywhere — see VectorDot.doGenCode
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |double $scale = $a.getDouble(0);
         |byte[] $q = $a.getBinary(1);
         |float[] $out = new float[$q.length];
         |for (int $i = 0; $i < $q.length; $i++) { $out[$i] = (float) ($q[$i] * $scale); }
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorDequantizeI8 =
    copy(child = newChild)
}

/** Reconstructed inner product of two int8-quantized vectors:
  * scaleA * scaleB * Σ qa[i]·qb[i]. The inner loop is pure byte
  * arithmetic accumulated in a long — the MIPS-rerank hot path over
  * quantized storage, codegen'd; exact for any dim < 2^38. */
case class VectorDotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isQuantStruct(t: DataType): Boolean = t match {
    case StructType(Array(StructField(_, DoubleType, _, _), StructField(_, BinaryType, _, _))) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isQuantStruct(left.dataType) && isQuantStruct(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_i8 expects two struct<scale:double,q:binary> inputs " +
        s"(from vec_quantize_i8), got ${left.dataType.sql} / ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[InternalRow]
    val rb = b.asInstanceOf[InternalRow]
    val qa = ra.getBinary(1)
    val qb = rb.getBinary(1)
    val n = math.min(qa.length, qb.length)
    var s = 0L
    var i = 0
    while (i < n) { s += qa(i).toLong * qb(i).toLong; i += 1 }
    ra.getDouble(0) * rb.getDouble(0) * s.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere — see VectorDot.doGenCode
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $qa = $a.getBinary(1);
         |byte[] $qb = $b.getBinary(1);
         |int $n = java.lang.Math.min($qa.length, $qb.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) { $acc += (long) $qa[$i] * (long) $qb[$i]; }
         |${ev.value} = $a.getDouble(0) * $b.getDouble(0) * (double) $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDotI8 =
    copy(left = newLeft, right = newRight)
}

/** Elementwise difference of two float/double array columns →
  * array<float> over the common prefix (null elements contribute 0, like
  * [[VectorDot]]'s skip rule). The residual-encoding primitive for IVF-PQ
  * (r = v − centroid(cell)) — a corpus-sized map step, so it must stay
  * inside whole-stage codegen rather than ride an interpreted `zip_with`
  * lambda. */
case class VectorSub(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_sub expects array<float>/array<double> inputs, got ${l.sql} / ${r.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      out(i) = (xv - yv).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere — see VectorDot.doGenCode
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : $lGet;
         |  double $yv = $b.isNullAt($i) ? 0.0 : $rGet;
         |  $out[$i] = (float) ($xv - $yv);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorSub =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization + accent stripping for corpus canonicalization:
  * NFD-decompose, drop combining marks (Mn), NFC-recompose — so "café",
  * "café" and "cafe" all fingerprint identically before dedup.
  * Spark has no built-in for this; the expression calls the JDK
  * normalizer through a static helper from generated code, staying inside
  * whole-stage codegen (one virtual call per row, no interpreted
  * fallback). */
case class TextUnaccent(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_unaccent expects string, got ${t.sql}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextUnaccent.strip(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextUnaccent.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): TextUnaccent =
    copy(child = newChild)
}

object TextUnaccent {
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** NFD → strip combining marks → NFC. Static so generated code can call
    * it directly. */
  def strip(s: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.unsafe.types.UTF8String = {
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val stripped = marks.matcher(nfd).replaceAll("")
    val nfc = java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
    org.apache.spark.unsafe.types.UTF8String.fromString(nfc)
  }
}

/** Deflate compression ratio of the UTF-8 text — the classic cheap
  * "information density" quality signal for web corpora (boilerplate,
  * looped templates and padded spam compress far below organic prose;
  * near-random noise barely compresses). Ratio = compressed/original
  * bytes, rounded to 6 decimals; empty string → 1.0.
  *
  * Spark has no compression expression; the JDK Deflater is called from
  * generated code through a static helper, staying inside whole-stage
  * codegen. Deterministic for a given JDK zlib level (the signal is
  * thresholded, never hash-compared across engines). */
case class TextDeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_deflate_ratio expects string, got ${t.sql}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextDeflateRatio.ratio(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextDeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): TextDeflateRatio =
    copy(child = newChild)
}

object TextDeflateRatio {
  /** Static so generated code can call it directly. Raw deflate (nowrap),
    * default level; the output bytes are only counted, never kept. */
  def ratio(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) 1.0
    else {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        math.rint(total.toDouble / bytes.length * 1e6) / 1e6
      } finally d.end()
    }
  }
}

object VectorExprs {

  /** Codegen'd dot product of two float/double array columns. Resolved via
    * the `vec_dot` function registered by [[GraftExtensions]] — sessions
    * must set `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm via the codegen'd self-dot. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero vectors (never NaN/div-by-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }

  /** Elementwise difference → array<float> (residual-encoding primitive). */
  def sub(a: Column, b: Column): Column = call_function("vec_sub", a, b)

  /** Int8 scalar quantization → struct(scale double, q binary). */
  def quantizeI8(a: Column): Column = call_function("vec_quantize_i8", a)

  /** Reconstructed inner product of two quantized vectors. */
  def dotI8(a: Column, b: Column): Column = call_function("vec_dot_i8", a, b)

  /** Reconstruct an approximate float vector from its quantized form. */
  def dequantizeI8(a: Column): Column = call_function("vec_dequantize_i8", a)

  /** Unicode-canonicalize + strip accents (NFD → drop Mn → NFC). */
  def unaccent(a: Column): Column = call_function("text_unaccent", a)

  /** Deflate compression ratio (compressed/original bytes) — the
    * information-density quality signal. */
  def deflateRatio(a: Column): Column = call_function("text_deflate_ratio", a)
}

/** SparkSessionExtensions entry point registering graft's native
  * expressions (`spark.sql.extensions=graft.functions.GraftExtensions`).
  * SQL surface: `SELECT vec_dot(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"vec_dot takes 2 arguments, got ${children.length}")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_sub"),
      new ExpressionInfo(classOf[VectorSub].getName, "vec_sub"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"vec_sub takes 2 arguments, got ${children.length}")
        VectorSub(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_quantize_i8"),
      new ExpressionInfo(classOf[VectorQuantizeI8].getName, "vec_quantize_i8"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"vec_quantize_i8 takes 1 argument, got ${children.length}")
        VectorQuantizeI8(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot_i8"),
      new ExpressionInfo(classOf[VectorDotI8].getName, "vec_dot_i8"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vec_dot_i8 takes 2 arguments, got ${children.length}")
        VectorDotI8(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_desc"),
      new ExpressionInfo(classOf[TopKDesc].getName, "topk_desc"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"topk_desc takes 3 arguments (score, id, k), got ${children.length}")
        TopKDesc(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_desc_num"),
      new ExpressionInfo(classOf[TopKDescNum].getName, "topk_desc_num"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"topk_desc_num takes 3 arguments (score, value, k), got ${children.length}")
        TopKDescNum(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_desc_str"),
      new ExpressionInfo(classOf[TopKDescStr].getName, "topk_desc_str"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"topk_desc_str takes 3 arguments (score, id, k), got ${children.length}")
        TopKDescStr(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("text_unaccent"),
      new ExpressionInfo(classOf[TextUnaccent].getName, "text_unaccent"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"text_unaccent takes 1 argument, got ${children.length}")
        TextUnaccent(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("text_deflate_ratio"),
      new ExpressionInfo(classOf[TextDeflateRatio].getName, "text_deflate_ratio"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"text_deflate_ratio takes 1 argument, got ${children.length}")
        TextDeflateRatio(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"bloom_might_contain takes 2 arguments (bloom, key), got ${children.length}")
        // Spark's own runtime-filter probe expression (codegen'd); the
        // bloom side is a foldable binary (serialized util.sketch
        // BloomFilter), the value side a LongType key.
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"kll_sketch_agg takes 2 arguments (value, k), got ${children.length}")
        KllSketchAgg(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"kll_merge_agg takes 2 arguments (sketch, k), got ${children.length}")
        KllMergeAgg(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"kll_quantile takes 2 arguments (sketch, rank), got ${children.length}")
        KllQuantile(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dequantize_i8"),
      new ExpressionInfo(classOf[VectorDequantizeI8].getName, "vec_dequantize_i8"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"vec_dequantize_i8 takes 1 argument, got ${children.length}")
        VectorDequantizeI8(children.head)
      }))
  }
}
