package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fail-fast gates for operators whose cost is data-dependent.
  *
  * The LSH families (MinHash bands, SimHash blocks, RHP buckets) are
  * candidate-bounded by construction ONLY when bucket occupancy is sane: a
  * degenerate corpus — every embedding constant, every document identical —
  * sends all n rows to one bucket and the candidate self-join degenerates
  * to O(n²). At 100 TB that is a cluster-killer, and it surfaces as an
  * opaque multi-hour stage, not an error. These guards spend one cheap
  * aggregate over the (already-cached, one-row-per-doc-per-band) bucket
  * frame to turn that failure mode into an immediate, actionable exception
  * — the same fail-fast philosophy as `Ops.rangeJoin`'s
  * maxBucketsPerInterval blowup guard. */
object Guards {

  /** Assert no bucket in `banded` holds more than `limit` rows.
    *
    * `keyCols` identify a bucket (e.g. band+bucket). `limit <= 0` disables
    * the gate. The scan is a codegen'd hash-aggregate over narrow rows —
    * O(bands · n) with map-side partials, negligible next to the self-join
    * it protects — and the top-1 lookup is a TakeOrdered, never a full
    * sort. Throws IllegalArgumentException naming the worst bucket, its
    * occupancy, and the caller-supplied remedy. */
  def checkBucketOccupancy(banded: DataFrame, keyCols: Seq[String],
                           limit: Long, operator: String,
                           remedy: String): Unit = {
    if (limit > 0) {
      val worst = banded.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__occ"))
        .orderBy(desc("__occ"))
        .limit(1)
        .collect()
      worst.headOption.foreach { row =>
        val occ = row.getLong(row.fieldIndex("__occ"))
        if (occ > limit) {
          val key = keyCols.map(k => s"$k=${row.get(row.fieldIndex(k))}").mkString(", ")
          throw new IllegalArgumentException(
            s"$operator: LSH bucket ($key) holds $occ rows (> maxBucketOccupancy=$limit); " +
            s"the candidate self-join would generate ~${occ}² pairs from this bucket alone. " +
            s"Likely a degenerate corpus (identical/constant inputs) — $remedy, " +
            s"or raise maxBucketOccupancy if the occupancy is genuine.")
        }
      }
    }
  }

  /** Assert a delta batch carries each id at most once — the ingest gate
    * every stored-index upsert/append shares: two rows with one id in a
    * batch silently corrupt whatever per-id state the writer derives
    * (merged MinHash shingle sets match NEITHER version; duplicated
    * assignment rows double a vector's candidacy). One thin aggregate
    * over the (small) delta. */
  def requireUniqueIds(df: DataFrame, idCol: String, op: String): Unit = {
    // count(idCol) skips NULLs while count(1) doesn't — comparing them
    // surfaces null ids EXPLICITLY before the duplicate check; folding
    // nulls into the distinct compare would misreport a single null-id
    // row as "1 duplicate row(s)" and could never name the real defect
    val r = df.agg(count(lit(1)).as("n"), count(col(idCol)).as("nn"),
      count_distinct(col(idCol)).as("d")).collect()(0)
    val (n, nonNull, distinct) = (r.getLong(0), r.getLong(1), r.getLong(2))
    require(n == nonNull,
      s"$op: batch carries ${n - nonNull} NULL '$idCol' row(s) — a null " +
        "id cannot be probed, removed, or upserted later; assign real " +
        "ids before ingesting")
    require(nonNull == distinct,
      s"$op: batch carries ${nonNull - distinct} duplicate " +
        s"'$idCol' row(s) — per-id state derived from the merged rows " +
        "would match neither version; keep one row per id (the latest " +
        "version) before ingesting")
  }
}
