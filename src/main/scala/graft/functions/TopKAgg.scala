package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `topk_desc(score, id, k)` keeps the k
  * highest (score, id) pairs ordered by (score DESC, id ASC) and returns
  * them as `array<struct<score:double,id:bigint>>`.
  *
  * This is the scale-correct shape for per-group top-k: as a true
  * aggregate it gets MAP-SIDE PARTIAL aggregation, so each input
  * partition contributes at most k rows per group to the shuffle. The
  * window formulation (`row_number() OVER (ORDER BY score DESC)`) must
  * shuffle EVERY scored candidate to its group's partition and sort them
  * all — at |corpus| × |queries| candidates that shuffle is the job; with
  * this aggregate it is |groups| × k per partition, and the per-partition
  * cost is an O(log k) bounded-heap insert per row instead of a sort.
  *
  * Ties: (score DESC, id ASC) — identical to the deterministic window
  * tie-break used across the engine, so results are interchangeable.
  *
  * CONTRACT: `id` identifies the row WITHIN its group — duplicate
  * (score, id) pairs in one group collapse to one kept entry (the buffer
  * is a set keyed by that pair), where `row_number` would keep each
  * duplicate. All engine call sites pass a unique row id. */
case class TopKDesc(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  // (score desc, id asc): "smallest" element in the set is the WORST kept
  // pair, so bounding the set means removing last().
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), Double](_._1).reverse.orElseBy(_._2)

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"topk_desc k: $other")
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !Seq(IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("topk_desc k must be an integer literal")
    else kExpr.eval(null) match {
      case null => TypeCheckResult.TypeCheckFailure("topk_desc k must not be null")
      case v if (v match { case i: Int => i <= 0; case l: Long => l <= 0L }) =>
        TypeCheckResult.TypeCheckFailure(s"topk_desc k must be positive, got $v")
      case _ => (scoreExpr.dataType, idExpr.dataType) match {
        case (DoubleType | FloatType, LongType | IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (s, i) => TypeCheckResult.TypeCheckFailure(
          s"topk_desc expects (double/float score, bigint/int id), got ${s.sql} / ${i.sql}")
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def insert(buf: java.util.TreeSet[(Double, Long)], p: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    // Evict the worst entry ONLY when the add actually inserted: for a
    // duplicate (score, id) pair add() returns false, and polling then
    // would shrink the kept set below k, silently losing a valid entry.
    else if (ord.compare(p, buf.last) < 0 && buf.add(p)) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val sv = s match { case f: Float => f.toDouble; case d: Double => d }
      val iv = i match { case n: Int => n.toLong; case l: Long => l }
      insert(buf, (sv, iv))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
                     other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val rows = new Array[Any](buf.size)
    val it = buf.iterator() // ascending in ord = best-first
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      rows(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, id) = it.next(); bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDesc =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKDesc =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDesc =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
