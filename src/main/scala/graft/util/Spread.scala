package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Parallelism guard for hash-heavy map-side pipelines.
  *
  * A parquet scan parallelizes at ROW-GROUP granularity: a
  * single-row-group file is one task no matter its row count or how small
  * `spark.sql.files.maxPartitionBytes` is set — and everything map-side
  * above it (shingle explosion, per-gram md5, signature aggregation
  * partials) single-threads until the first shuffle. The test tables are
  * exactly that shape (one row group each), so without a spread the
  * engine's most expensive expression pipelines ran on one core of 32.
  *
  * [[forMapWork]] repartitions ONLY when the frame reads from genuinely
  * few files, so at production scale — where inputs arrive in thousands
  * of splits — it is a no-op and never adds a shuffle. When it does fire,
  * the shuffle moves the NARROW pre-explosion rows (ids + text), the
  * cheapest point in the pipeline to pay it. Round-robin repartitioning
  * is deterministic (Spark sorts within partitions for retry safety) and
  * every consumer here is an order-independent aggregate, so results are
  * unchanged. */
object Spread {

  /** Repartition `df` to the default parallelism iff every file-backed
    * relation under it reads fewer than `minFiles` files in total.
    * Non-file frames (in-memory test relations, JDBC, streams) never
    * spread — the degenerate case this fixes is specifically the
    * too-few-files scan.
    *
    * The probe walks the ANALYZED logical plan and reads the already-
    * built file index — no optimization pass, no job. (Both `.rdd` and
    * `.inputFiles` probes are NOT free: they optimize a parallel plan,
    * and ConvertToLocalRelation then evaluates local-relation subtrees
    * driver-side — which double-fired the corpus-scans-ONCE accumulator
    * pins in DedupSpec.) */
  def forMapWork(df: DataFrame, minFiles: Int = 8): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val fileCounts = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.length
        case _ => Int.MaxValue
      }
    }
    val files = fileCounts.foldLeft(0L)(_ + _)
    if (target <= 1 || fileCounts.isEmpty ||
        files >= math.min(minFiles, target).toLong) df
    else df.repartition(target)
  }
}
