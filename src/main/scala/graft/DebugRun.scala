package graft
import org.apache.spark.sql.SparkSession
/** Scratch runner: `runMain graft.DebugRun <sfDir> <query...>` — runs the
  * named SparkEntry queries eagerly and prints full stack traces. */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN=1 prints the formatted physical plan instead of
    // executing — the plan-audit loop (.explain until it's the plan you
    // want, not the first one that passed).
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    args.tail.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (explain) { println(s"=== $name PLAN"); df.explain("formatted") }
        else {
          println(s"=== $name OK rows=${df.count()}")
          df.show(5, truncate = false)
        }
      } catch {
        case e: Throwable =>
          println(s"=== $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace(System.out)
      }
    }
    spark.stop()
  }
}
