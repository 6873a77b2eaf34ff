package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** [[TopKDesc]] with STRING ids: `topk_desc_str(score, id, k)` keeps the k
  * highest (score, id) pairs ordered by (score DESC, id ASC — lexicographic)
  * and returns `array<struct<score:double,id:string>>`.
  *
  * Exists for top-k over CATEGORICAL keys — per-column frequent values in
  * [[graft.profile.Profile]], heavy-hitter style summaries — where the id
  * is the value itself and hashing it to a long would both lose the label
  * and admit collisions. Same scale contract as [[TopKDesc]]: map-side
  * partial aggregation caps each partition's shuffle contribution at k rows
  * per group, an O(log k) bounded-heap insert per row.
  *
  * Ordering note: the id tie-break is UTF8String binary order (Spark's own
  * string ordering), which matches unsigned-byte comparison — the same
  * order DuckDB applies to VARCHAR, so ties replay identically in oracle
  * SQL for ASCII and for well-formed UTF-8 beyond it.
  *
  * CONTRACT (as [[TopKDesc]]): `id` identifies the row within its group —
  * duplicate (score, id) pairs collapse to one kept entry. */
case class TopKDescStr(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, UTF8String)]] {

  // (score desc, id asc): the set's last() is the WORST kept pair.
  private val ord: Ordering[(Double, UTF8String)] =
    Ordering.by[(Double, UTF8String), Double](_._1).reverse
      .orElseBy(_._2)(Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[UTF8String]()))

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"topk_desc_str k: $other")
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !Seq(IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("topk_desc_str k must be an integer literal")
    else kExpr.eval(null) match {
      case null => TypeCheckResult.TypeCheckFailure("topk_desc_str k must not be null")
      case v if (v match { case i: Int => i <= 0; case l: Long => l <= 0L }) =>
        TypeCheckResult.TypeCheckFailure(s"topk_desc_str k must be positive, got $v")
      case _ => (scoreExpr.dataType, idExpr.dataType) match {
        case (DoubleType | FloatType | LongType | IntegerType, StringType) =>
          TypeCheckResult.TypeCheckSuccess
        case (s, i) => TypeCheckResult.TypeCheckFailure(
          s"topk_desc_str expects (numeric score, string id), got ${s.sql} / ${i.sql}")
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, UTF8String)] =
    new java.util.TreeSet[(Double, UTF8String)](ord)

  private def insert(buf: java.util.TreeSet[(Double, UTF8String)],
                     p: (Double, UTF8String)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (ord.compare(p, buf.last) < 0 && buf.add(p)) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[(Double, UTF8String)],
                      input: InternalRow): java.util.TreeSet[(Double, UTF8String)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val sv = s match {
        case f: Float => f.toDouble; case d: Double => d
        case n: Int => n.toDouble; case l: Long => l.toDouble
      }
      // clone() — eval may return a buffer-backed UTF8String that the next
      // row overwrites; the heap must own its bytes
      insert(buf, (sv, i.asInstanceOf[UTF8String].clone()))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, UTF8String)],
                     other: java.util.TreeSet[(Double, UTF8String)])
      : java.util.TreeSet[(Double, UTF8String)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, UTF8String)]): Any = {
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

  override def serialize(buf: java.util.TreeSet[(Double, UTF8String)]): Array[Byte] = {
    val entries = new Array[(Double, Array[Byte])](buf.size)
    var total = 4
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      val bytes = id.getBytes
      entries(i) = (s, bytes)
      total += 8 + 4 + bytes.length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(entries.length)
    entries.foreach { case (s, bytes) =>
      bb.putDouble(s); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.add((s, UTF8String.fromBytes(arr)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDescStr =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKDescStr =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDescStr =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
