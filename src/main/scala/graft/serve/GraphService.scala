package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Request-time centrality serving over a STORED rank layout — the
  * build-once / probe-cheap tier of the [[graft.graph.Graph]] family.
  *
  * Why it exists: PageRank/HITS are iteration chains (5 shuffle+agg
  * rounds over the edge set), and the in-query faces re-run the whole
  * chain per invocation — right for a pipeline stage, wrong for serving
  * (the BM25 / ANN / near-dup families all already have a stored form
  * for exactly this reason). Ranks are INTEGER-EXACT
  * ([[graft.graph.Graph]] scaladoc), so a stored layout is not a lossy
  * snapshot: it replays bit-for-bit against the unrolled-CTE oracle and
  * stored probes stay hash-green.
  *
  * Layout: `root/ranks` = (node BIGINT, rank BIGINT) for the PageRank
  * tiers; `root/scores` = (node, authority, hub) for HITS. One row per
  * node — small relative to the edge set, written coalesced. REFRESH is
  * recompute + the marker-fenced versioned-dir swap
  * ([[graft.io.Sinks]]'s crash contract: a mid-swap crash leaves a full
  * old or full new copy, healed at open). There is no incremental
  * maintenance: rank is a GLOBAL fixed point — one edge can move every
  * node's score — so the refresh unit is the rebuild, scheduled like
  * the nightly ANN retrains ([[Maintenance]]).
  *
  * Probe shapes are all bounded: top-k is a TakeOrderedAndProject
  * (bounded per-partition heaps, never a full sort at the driver), point
  * lookups are an `isin` filter over the thin frame. Request-safety
  * envelope as the sibling services: bounded k, loud
  * [[IllegalArgumentException]]s an HTTP layer maps to 400. */
final class GraphRankService(ranks: DataFrame, val maxK: Int = 1000) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")

  /** Top-k nodes by stored rank as a frame: (node, rank, pos), pos 1..k,
    * ties by node ascending — the registry/probe form. */
  def topKFrame(k: Int): DataFrame = {
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val w = Window.orderBy(col("rank").desc, col("node"))
    ranks.orderBy(col("rank").desc, col("node")).limit(k)
      .withColumn("pos", row_number().over(w).cast(IntegerType))
  }

  /** Top-k as rows: (node, rank, pos). */
  def topK(k: Int): Seq[(Long, Long, Int)] = {
    val spark = ranks.sparkSession
    import spark.implicits._
    topKFrame(k).as[(Long, Long, Int)].collect().toSeq
  }

  /** Stored ranks for the requested nodes; absent nodes are absent from
    * the result (a node outside the edge set has no rank row). */
  def rankOf(nodes: Seq[Long]): Map[Long, Long] = {
    require(nodes.nonEmpty && nodes.size <= maxK,
      s"rankOf takes 1..$maxK nodes, got ${nodes.size}")
    val spark = ranks.sparkSession
    import spark.implicits._
    ranks.filter(col("node").isin(nodes: _*))
      .as[(Long, Long)].collect().toMap
  }
}

/** HITS twin of [[GraphRankService]] over `root/scores`. */
final class GraphHitsService(scores: DataFrame, val maxK: Int = 1000) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")

  private def top(c: String, k: Int): DataFrame = {
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val w = Window.orderBy(col(c).desc, col("node"))
    scores.select(col("node"), col(c))
      .orderBy(col(c).desc, col("node")).limit(k)
      .withColumn("pos", row_number().over(w).cast(IntegerType))
  }

  /** Top-k by authority: (node, authority, pos), ties by node. */
  def topAuthoritiesFrame(k: Int): DataFrame = top("authority", k)

  /** Top-k by hub score: (node, hub, pos), ties by node. */
  def topHubsFrame(k: Int): DataFrame = top("hub", k)

  def topAuthorities(k: Int): Seq[(Long, Long, Int)] = {
    val spark = scores.sparkSession
    import spark.implicits._
    topAuthoritiesFrame(k).as[(Long, Long, Int)].collect().toSeq
  }

  def topHubs(k: Int): Seq[(Long, Long, Int)] = {
    val spark = scores.sparkSession
    import spark.implicits._
    topHubsFrame(k).as[(Long, Long, Int)].collect().toSeq
  }
}

/** Request-time TRIANGLE/clustering serving over a stored
  * (node, triangles, deg, wedges) layout — the build-once / probe-cheap
  * tier of [[graft.graph.Graph.triangleCounts]]. The headline in-query
  * face re-runs the O(m^1.5) adjacency-intersection pipeline per
  * invocation (~8 s warm at sf0.1); the stored frame is node-sized and
  * INTEGER-EXACT, so probes replay bit-for-bit against the same
  * unrolled oracle and answer in the time of a bounded top-k. The
  * local clustering coefficient stays a rational (triangles, wedges)
  * pair — consumers divide at render time. */
final class GraphTriangleService(stats: DataFrame, val maxK: Int = 1000) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")

  /** Top-k nodes by stored triangle count:
    * (node, triangles, deg, wedges, pos), ties by node ascending. */
  def topKFrame(k: Int): DataFrame = {
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val w = Window.orderBy(col("triangles").desc, col("node"))
    stats.orderBy(col("triangles").desc, col("node")).limit(k)
      .withColumn("pos", row_number().over(w).cast(IntegerType))
  }

  /** Stored triangle stats for the requested nodes; absent nodes are
    * absent (a node outside the edge set has no row). */
  def statsOf(nodes: Seq[Long]): Map[Long, (Long, Long, Long)] = {
    require(nodes.nonEmpty && nodes.size <= maxK,
      s"statsOf takes 1..$maxK nodes, got ${nodes.size}")
    val spark = stats.sparkSession
    import spark.implicits._
    stats.filter(col("node").isin(nodes: _*))
      .select("node", "triangles", "deg", "wedges")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, t, d, wd) => n -> ((t, d, wd)) }.toMap
  }

  /** Global closure stats from the stored frame — one row
    * (n_triangles, n_wedges, n_nodes), the [[graft.graph.Graph]]
    * transitivity numerator/denominator (Σ per-node DIV 3). */
  def globalFrame(): DataFrame =
    stats.agg(expr("sum(triangles) DIV 3").cast("long").as("n_triangles"),
      sum(col("wedges")).as("n_wedges"),
      count(lit(1)).as("n_nodes"))
}

/** K-CORE membership serving over a stored (node, deg) layout — the
  * stored twin of [[graft.graph.Graph.kCoreNodes]] (exact fixpoint
  * core when built with `rounds = 0`). Core membership is the
  * crawl/curation gate ("is this page well-embedded?") — a point
  * lookup against a node-sized frame, not a peel per request. */
final class GraphCoreService(core: DataFrame, val maxK: Int = 1000) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")

  /** Top-k core members by end-state degree: (node, deg, pos), ties by
    * node ascending. */
  def topKFrame(k: Int): DataFrame = {
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val w = Window.orderBy(col("deg").desc, col("node"))
    core.orderBy(col("deg").desc, col("node")).limit(k)
      .withColumn("pos", row_number().over(w).cast(IntegerType))
  }

  /** Core degrees for the requested nodes; nodes outside the core are
    * absent — absence IS the "peeled" verdict. */
  def coreDegreeOf(nodes: Seq[Long]): Map[Long, Long] = {
    require(nodes.nonEmpty && nodes.size <= maxK,
      s"coreDegreeOf takes 1..$maxK nodes, got ${nodes.size}")
    val spark = core.sparkSession
    import spark.implicits._
    core.filter(col("node").isin(nodes: _*))
      .as[(Long, Long)].collect().toMap
  }
}

/** COMMUNITY-membership serving over a stored (node, label) layout —
  * the stored twin of [[graft.graph.Graph.communities]]. Community
  * membership is the corpus-mixing key ("which topic cluster is this
  * domain in?") — a point lookup plus a label-sized size rollup, not a
  * propagation per request. Labels are integer-exact node ids, so the
  * stored frame replays bit-for-bit against the LPA replay. */
final class GraphCommunityService(labels: DataFrame, val maxK: Int = 1000) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")

  /** Top-k communities by member count: (label, n_members, pos), ties
    * by label ascending. */
  def topKFrame(k: Int): DataFrame = {
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val sizes = labels.groupBy("label")
      .agg(count(lit(1)).as("n_members"))
    val w = Window.orderBy(col("n_members").desc, col("label"))
    sizes.orderBy(col("n_members").desc, col("label")).limit(k)
      .withColumn("pos", row_number().over(w).cast(IntegerType))
  }

  /** Community labels for the requested nodes; nodes outside the edge
    * set are absent. */
  def labelOf(nodes: Seq[Long]): Map[Long, Long] = {
    require(nodes.nonEmpty && nodes.size <= maxK,
      s"labelOf takes 1..$maxK nodes, got ${nodes.size}")
    val spark = labels.sparkSession
    import spark.implicits._
    labels.filter(col("node").isin(nodes: _*))
      .as[(Long, Long)].collect().toMap
  }
}

object GraphRankService {

  /** Build the stored PageRank layout at `root/ranks` — plain, WEIGHTED
    * (`weightCol`), or PERSONALIZED (`seeds`), matching the
    * [[graft.graph.Graph]] entry points. `numFiles` bounds the output
    * file count (the frame is node-sized; at 1e8 nodes raise it so a
    * file stays ~128 MB). */
  private def computeRanks(edges: DataFrame, srcCol: String, dstCol: String,
                           iterations: Int, scale: Long, dampNum: Long,
                           dampDen: Long, weightCol: Option[String],
                           seeds: Option[(DataFrame, String)]): DataFrame = {
    require(weightCol.isEmpty || seeds.isEmpty,
      "weighted AND personalized PageRank is not a graph the engine " +
        "defines — pick one (the seeded form walks the unweighted graph)")
    (weightCol, seeds) match {
      case (Some(w), _) => graft.graph.Graph.pageRankIntWeighted(
        edges, srcCol, dstCol, w, iterations, scale, dampNum, dampDen)
      case (_, Some((sdf, sCol))) => graft.graph.Graph.pageRankIntPersonalized(
        edges, srcCol, dstCol, sdf, sCol, iterations, scale, dampNum, dampDen)
      case _ => graft.graph.Graph.pageRankInt(
        edges, srcCol, dstCol, iterations, scale, dampNum, dampDen)
    }
  }

  def buildPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                    root: String, iterations: Int = 5,
                    scale: Long = 1000000000L, dampNum: Long = 85L,
                    dampDen: Long = 100L, weightCol: Option[String] = None,
                    seeds: Option[(DataFrame, String)] = None,
                    numFiles: Int = 4): Unit =
    computeRanks(edges, srcCol, dstCol, iterations, scale, dampNum,
      dampDen, weightCol, seeds)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/ranks")

  /** Build the stored HITS layout at `root/scores`. */
  def buildHits(edges: DataFrame, srcCol: String, dstCol: String,
                root: String, iterations: Int = 3,
                scale: Long = 1000000000L, numFiles: Int = 4): Unit =
    graft.graph.Graph.hitsInt(edges, srcCol, dstCol, iterations, scale)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/scores")

  /** Open a stored PageRank layout for serving (crashed swaps healed
    * first — the family contract). */
  def overParquetDir(spark: SparkSession, root: String,
                     maxK: Int = 1000): GraphRankService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/ranks")
    new GraphRankService(spark.read.parquet(s"$root/ranks"), maxK)
  }

  /** Open a stored HITS layout for serving. */
  def overParquetDirHits(spark: SparkSession, root: String,
                         maxK: Int = 1000): GraphHitsService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/scores")
    new GraphHitsService(spark.read.parquet(s"$root/scores"), maxK)
  }

  /** REFRESH = full recompute from the current edges + marker-fenced
    * swap (rank is a global fixed point; there is no per-edge delta).
    * The replacement is COMPLETE on disk before the two-rename swap, so
    * a crash at any point leaves a serving-ready layout; services
    * RE-OPEN after maintenance (the family contract — an open handle's
    * file listing is stale by design). */
  def refreshPageRank(spark: SparkSession, root: String, edges: DataFrame,
                      srcCol: String, dstCol: String, iterations: Int = 5,
                      scale: Long = 1000000000L, dampNum: Long = 85L,
                      dampDen: Long = 100L,
                      weightCol: Option[String] = None,
                      seeds: Option[(DataFrame, String)] = None,
                      numFiles: Int = 4): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/ranks")
    val tmp = s"$root/ranks-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    computeRanks(edges, srcCol, dstCol, iterations, scale, dampNum,
      dampDen, weightCol, seeds)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/ranks", tmp)
  }

  /** HITS twin of [[refreshPageRank]]: full recompute of the
    * `root/scores` layout + marker-fenced swap (the same no-per-edge-
    * delta argument — hub/authority scores are a global fixed point). */
  def refreshHits(spark: SparkSession, root: String, edges: DataFrame,
                  srcCol: String, dstCol: String, iterations: Int = 3,
                  scale: Long = 1000000000L, numFiles: Int = 4): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/scores")
    val tmp = s"$root/scores-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    graft.graph.Graph.hitsInt(edges, srcCol, dstCol, iterations, scale)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/scores", tmp)
  }

  /** Build the stored TRIANGLE layout at `root/triangles` —
    * (node, triangles, deg, wedges), node-sized, integer-exact. The
    * O(m^1.5) intersection pipeline runs ONCE here; probes never pay it
    * again. */
  def buildTriangles(edges: DataFrame, srcCol: String, dstCol: String,
                     root: String, numFiles: Int = 4): Unit =
    graft.graph.Graph.triangleCounts(edges, srcCol, dstCol)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/triangles")

  /** Build the stored K-CORE layout at `root/kcore` — (node, deg) for
    * the surviving core; `rounds = 0` (default) stores the EXACT
    * fixpoint core ([[graft.graph.Graph.kCoreNodes]]). `maxRounds` is
    * the fixpoint-mode runaway budget, threaded through so an operator
    * with a legitimately deep cascade (a long chain hanging off a dense
    * core peels one node per round) can raise it WITHOUT bypassing the
    * service layer. */
  def buildKCore(edges: DataFrame, srcCol: String, dstCol: String,
                 root: String, k: Int, rounds: Int = 0,
                 numFiles: Int = 4, maxRounds: Int = 64): Unit =
    graft.graph.Graph.kCoreNodes(edges, srcCol, dstCol, k, rounds,
        maxRounds = maxRounds)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/kcore")

  /** Open a stored triangle layout for serving (crashed swaps healed
    * first — the family contract). */
  def overParquetDirTriangles(spark: SparkSession, root: String,
                              maxK: Int = 1000): GraphTriangleService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/triangles")
    new GraphTriangleService(spark.read.parquet(s"$root/triangles"), maxK)
  }

  /** Open a stored k-core layout for serving. */
  def overParquetDirKCore(spark: SparkSession, root: String,
                          maxK: Int = 1000): GraphCoreService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/kcore")
    new GraphCoreService(spark.read.parquet(s"$root/kcore"), maxK)
  }

  /** REFRESH the triangle layout: full recompute + marker-fenced swap
    * — triangle counts are global (one edge changes up to deg counts),
    * so like rank the refresh unit is the rebuild. */
  def refreshTriangles(spark: SparkSession, root: String, edges: DataFrame,
                       srcCol: String, dstCol: String,
                       numFiles: Int = 4): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/triangles")
    val tmp = s"$root/triangles-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    graft.graph.Graph.triangleCounts(edges, srcCol, dstCol)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/triangles", tmp)
  }

  /** Build the stored COMMUNITY layout at `root/communities` —
    * (node, label), node-sized, integer-exact min-label LPA
    * ([[graft.graph.Graph.communities]]). */
  def buildCommunities(edges: DataFrame, srcCol: String, dstCol: String,
                       root: String, rounds: Int,
                       numFiles: Int = 4): Unit =
    graft.graph.Graph.communities(edges, srcCol, dstCol, rounds)
      .coalesce(numFiles).write.mode("overwrite")
      .parquet(s"$root/communities")

  /** Open a stored community layout for serving. */
  def overParquetDirCommunities(spark: SparkSession, root: String,
                                maxK: Int = 1000): GraphCommunityService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/communities")
    new GraphCommunityService(spark.read.parquet(s"$root/communities"),
      maxK)
  }

  /** REFRESH the community layout: labels are a global function of the
    * edge set (one bridge edge can merge two communities), so the
    * refresh unit is the full propagation + marker-fenced swap. */
  def refreshCommunities(spark: SparkSession, root: String,
                         edges: DataFrame, srcCol: String, dstCol: String,
                         rounds: Int, numFiles: Int = 4): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/communities")
    val tmp = s"$root/communities-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    graft.graph.Graph.communities(edges, srcCol, dstCol, rounds)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/communities", tmp)
  }

  /** REFRESH the k-core layout: full recompute + marker-fenced swap
    * (core membership is a global fixed point — no per-edge delta).
    * `maxRounds` threads to the fixpoint peel like [[buildKCore]]'s. */
  def refreshKCore(spark: SparkSession, root: String, edges: DataFrame,
                   srcCol: String, dstCol: String, k: Int,
                   rounds: Int = 0, numFiles: Int = 4,
                   maxRounds: Int = 64): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/kcore")
    val tmp = s"$root/kcore-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    graft.graph.Graph.kCoreNodes(edges, srcCol, dstCol, k, rounds,
        maxRounds = maxRounds)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/kcore", tmp)
  }
}
