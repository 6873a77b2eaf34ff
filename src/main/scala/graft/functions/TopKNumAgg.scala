package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate with a NUMERIC payload:
  * `topk_desc_num(score, value, k)` keeps the k highest (score, value)
  * pairs ordered by (score DESC, value ASC — numeric, not render-order)
  * and returns `array<struct<score:double,value:double>>`.
  *
  * Third member of the [[TopKDesc]] / [[TopKDescStr]] family, closing the
  * numeric-column gap in frequent-values profiling: routing a numeric
  * column through the string aggregate makes ties break in BINARY STRING
  * order ("10" < "2"), which is wrong for a numeric report. Same
  * execution shape as its siblings — a true aggregate with MAP-SIDE
  * PARTIAL bounded heaps, so the shuffle carries ≤ k rows per group per
  * partition instead of a high-cardinality column's whole distinct set.
  *
  * CONTRACT: duplicate (score, value) pairs in one group collapse to one
  * kept entry (the buffer is a set keyed by the pair) — the intended
  * semantics for frequent-values, where the pair IS the result row.
  * NaN values are skipped on input (a NaN frequent-value row is
  * meaningless and NaN ordering would poison the tie-break). */
case class TopKDescNum(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Double)]] {

  // (score desc, value asc): "last" element in the set is the WORST kept
  // pair, so bounding the set means removing last().
  private val ord: Ordering[(Double, Double)] =
    Ordering.by[(Double, Double), Double](_._1).reverse.orElseBy(_._2)

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"topk_desc_num k: $other")
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !Seq(IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("topk_desc_num k must be an integer literal")
    else kExpr.eval(null) match {
      case null => TypeCheckResult.TypeCheckFailure("topk_desc_num k must not be null")
      case v if (v match { case i: Int => i <= 0; case l: Long => l <= 0L }) =>
        TypeCheckResult.TypeCheckFailure(s"topk_desc_num k must be positive, got $v")
      case _ => (scoreExpr.dataType, idExpr.dataType) match {
        case (DoubleType | FloatType, DoubleType | FloatType) =>
          TypeCheckResult.TypeCheckSuccess
        case (s, i) => TypeCheckResult.TypeCheckFailure(
          s"topk_desc_num expects (double/float score, double/float value), " +
            s"got ${s.sql} / ${i.sql}")
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Double)] =
    new java.util.TreeSet[(Double, Double)](ord)

  private def insert(buf: java.util.TreeSet[(Double, Double)],
                     p: (Double, Double)): Unit = {
    if (buf.size < k) buf.add(p)
    // evict ONLY when the add actually inserted — a duplicate pair's
    // add() returns false and polling would lose a valid entry
    else if (ord.compare(p, buf.last) < 0 && buf.add(p)) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[(Double, Double)],
                      input: InternalRow): java.util.TreeSet[(Double, Double)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val sv = s match { case f: Float => f.toDouble; case d: Double => d }
      val iv = i match { case f: Float => f.toDouble; case d: Double => d }
      if (!sv.isNaN && !iv.isNaN) insert(buf, (sv, iv))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Double)],
                     other: java.util.TreeSet[(Double, Double)]): java.util.TreeSet[(Double, Double)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Double)]): Any = {
    val rows = new Array[Any](buf.size)
    val it = buf.iterator() // ascending in ord = best-first
    var i = 0
    while (it.hasNext) {
      val (s, v) = it.next()
      rows(i) = new GenericInternalRow(Array[Any](s, v))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, v) = it.next(); bb.putDouble(s); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDescNum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKDescNum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDescNum =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
