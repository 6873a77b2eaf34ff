package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static KLL helpers shared by interpreted eval and generated code. */
object KllOps {
  /** Shared analysis-time validation of the `k` literal for both KLL
    * aggregates: foldable integer, non-null, within DataSketches' legal
    * [8, 65535] range — so a bad k fails the ANALYSIS, not mid-job on an
    * executor. Returns Some(failure) or None when k is acceptable. */
  def checkK(fn: String, kExpr: Expression): Option[TypeCheckResult] =
    if (!kExpr.foldable || !Seq(IntegerType, LongType).contains(kExpr.dataType))
      Some(TypeCheckResult.TypeCheckFailure(s"$fn k must be an integer literal"))
    else kExpr.eval(null) match {
      case null => Some(TypeCheckResult.TypeCheckFailure(s"$fn k must not be null"))
      case v =>
        val kv = v match { case i: Int => i.toLong; case l: Long => l }
        if (kv < 8L || kv > 65535L)
          Some(TypeCheckResult.TypeCheckFailure(
            s"$fn k must be in [8, 65535], got $v"))
        else None
    }

  def quantile(blob: Array[Byte], rank: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(blob))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(sk.getQuantile(rank,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
  }
}

/** Mergeable QUANTILE sketches (Apache DataSketches KLL — Karnin, Lang &
  * Liberty 2016, "Optimal Quantile Approximation in Streams", FOCS,
  * public): `kll_sketch_agg(value, k)` builds one serialized
  * KllDoublesSketch per group — the FIFTH member of the engine's
  * mergeable-sketch family (HLL distinct / Bloom membership / CMS
  * frequency / Theta set-ops / KLL quantiles) and the one none of the
  * others can substitute: rank/quantile queries over a distribution.
  *
  * The 100 TB pattern is the same as the siblings': sketch each
  * shard/day/source ONCE at ingest (one pass, O(k·log n) retained
  * doubles per group, map-side partial aggregation so at most one
  * buffer per group per partition crosses the shuffle), store the blob
  * as a column, and answer later percentile questions — per group or
  * rolled up across groups via `kll_merge_agg` — without ever re-reading
  * raw data. Normalized rank error at the default k = 200 is ~1.65%
  * (two-sided, 99% confidence), independent of stream length.
  *
  * Estimates are engine-local (DataSketches compaction uses internal
  * randomness, so blobs and estimates are not SQL-replayable nor
  * run-deterministic); correctness is pinned in QualitySpec by
  * rank-error bounds against exact percentiles and by the merge ≡
  * global contract — the [[graft.quality.Quality.distinctSketches]]
  * certification discipline. NULL values are skipped; an all-NULL group
  * yields an empty sketch whose quantile reads are NULL. */
case class KllSketchAgg(
    valueExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"kll_sketch_agg k: $other")
  }

  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    KllOps.checkK("kll_sketch_agg", kExpr).getOrElse {
      valueExpr.dataType match {
        case DoubleType | FloatType | LongType | IntegerType =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"kll_sketch_agg expects a numeric value column, got ${t.sql}")
      }
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val d = v match {
        case f: Float  => f.toDouble
        case d0: Double => d0
        case i: Int    => i.toDouble
        case l: Long   => l.toDouble
      }
      buf.update(d)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    // heapify(Memory) returns a read-only view that rejects merge-into;
    // writable heap copy via newHeapInstance + merge keeps the buffer
    // usable for further updates after partial-aggregate restore
    {
      val sk = KllDoublesSketch.newHeapInstance(k)
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
      sk
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1))
}

/** Union-merge of serialized KLL sketches — the ROLLUP aggregate
  * (`kll_merge_agg(sketch_blob, k)`): aggregates sketch-blob ROWS (one
  * per fine-grained group) into one blob per coarser group, without
  * touching raw data. The [[KllSketchAgg]] scaladoc's storage contract;
  * mirrors `hll_union_agg` / `theta_union_agg` for the other families. */
case class KllMergeAgg(
    blobExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"kll_merge_agg k: $other")
  }

  override def children: Seq[Expression] = Seq(blobExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    KllOps.checkK("kll_merge_agg", kExpr).getOrElse {
      if (blobExpr.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"kll_merge_agg expects a binary sketch column, got ${blobExpr.dataType.sql}")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = blobExpr.eval(input)
    if (v != null) {
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val sk = KllDoublesSketch.newHeapInstance(k)
    sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(blobExpr = newChildren(0), kExpr = newChildren(1))
}

/** `kll_quantile(sketch_blob, rank)` — quantile estimate at normalized
  * rank ∈ [0, 1] from a serialized KLL sketch (inclusive search
  * criterion, the DataSketches default). NULL for an empty sketch or a
  * NULL blob. Runs over sketch rows (one per group), never the raw
  * data, so interpretation cost is irrelevant — but codegen is provided
  * anyway to keep containing stages whole. */
case class KllQuantile(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects (binary sketch, double rank), got ${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(blob: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    require(r >= 0.0 && r <= 1.0, s"kll_quantile rank must be in [0,1], got $r")
    KllOps.quantile(blob.asInstanceOf[Array[Byte]], r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, rank) => {
      val q = ctx.freshName("q")
      s"""
         |if (!($rank >= 0.0 && $rank <= 1.0)) {
         |  // positive-form guard: NaN fails it, matching the interpreted
         |  // path's require instead of slipping through to DataSketches
         |  throw new IllegalArgumentException(
         |    "kll_quantile rank must be in [0,1], got " + $rank);
         |}
         |java.lang.Double $q = graft.functions.KllOps.quantile($blob, $rank);
         |if ($q == null) { ${ev.isNull} = true; } else { ${ev.value} = $q.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
