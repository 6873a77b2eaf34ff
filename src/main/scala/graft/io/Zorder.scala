package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton-curve) data layout: sort a table along a space-filling
  * curve over several columns before writing, so parquet row-group min/max
  * stats stay narrow on EVERY z-column at once and a filter on any of them
  * prunes most of the file. A single-column sort clusters only its own
  * column (a filter on the second column then touches every row group);
  * the z-curve trades a little per-column locality for locality on all
  * dimensions — the standard lakehouse layout trick for multi-predicate
  * fact tables (public construction: Morton 1966; same scheme Delta/Hudi
  * expose as OPTIMIZE ZORDER BY).
  *
  * Scale shape: per-column min/max is one tiny aggregate; bucketing and
  * bit-interleaving are map-only codegen'd expressions;
  * `repartitionByRange` on the z-value does one sampled range shuffle
  * (the same cost as any global sort-write) and yields non-overlapping
  * z-ranges per file, so file-level AND row-group-level pruning both
  * engage. Nulls bucket to 0 (they cluster together at curve start). */
object Zorder {

  /** Bit-interleaved Morton value. `buckets` are already-computed integer
    * bucket ids in [0, 2^bits); column j contributes bit i to output bit
    * position (i * n + j) — round-robin interleave, MSB-fair across
    * columns. Pure shift/mask expression tree: codegen'd, map-only. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    require(n > 0, "interleave needs at least one column")
    require(bits > 0, s"bits must be positive, got $bits")
    require(n * bits <= 62, s"n*bits must fit a long, got $n x $bits")
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Uniform bucket id in [0, 2^bits) for `c` given its [lo, hi] range
    * (equi-width; rank-based equi-depth costs a sort and buys little for
    * roughly uniform keys). Nulls and degenerate ranges → bucket 0. */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val nb = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else coalesce(
      least(greatest(
        floor((c.cast(DoubleType) - lit(lo)) / lit(hi - lo) * nb).cast(LongType),
        lit(0L)), lit(nb)),
      lit(0L))
  }

  /** Z-value column for `zCols` of `df`: per-column min/max (one scalar
    * aggregate job) → equi-width buckets → Morton interleave. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column = {
    require(zCols.nonEmpty, "zValue needs at least one column")
    val aggs = zCols.flatMap(c => Seq(
      min(col(c)).cast(DoubleType).as(s"lo_$c"),
      max(col(c)).cast(DoubleType).as(s"hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      val lo = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      bucketize(col(c), lo, hi, bits)
    }
    interleave(buckets, bits)
  }

  /** Write `df` as parquet laid out along the z-curve over `zCols`:
    * range-partition by z-value (non-overlapping z-ranges per file), sort
    * within partitions, drop the scratch column, write. `blockSize`
    * optionally shrinks parquet row groups so min/max pruning gets finer
    * granularity (default parquet 128 MB groups are coarse for narrow
    * tables). */
  def write(df: DataFrame, zCols: Seq[String], path: String,
            bits: Int = 12, partitions: Int = 8,
            blockSize: Option[Int] = None): Unit = {
    // the scratch column must not shadow (and then silently delete) a
    // real user column of the same name on its way to the sink
    require(!df.columns.contains("__z"),
      "Zorder.write uses '__z' as a scratch column; rename the existing one")
    val z = zValue(df, zCols, bits)
    var w = df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
    blockSize.foreach { b =>
      w = w.option("parquet.block.size", b.toString)
        .option("parquet.page.size", (b / 8).toString)
    }
    w.parquet(path)
  }
}
