package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
/** Scratch profiler for the minhash pipeline stages. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" near dup tail")).as("text"))
    val all = docs.unionByName(planted).cache()
    println("n=" + all.count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = Dedup.minHashSignatures(all, "text", "doc_id").cache()
    time("signatures")(sigs.count())
    val banded = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(15)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))), b).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket")).cache()
    time("banding")(banded.count())
    val a = banded.alias("a"); val b = banded.alias("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b").cache()
    time("cand join")(println("cand=" + cand.count()))
    time("full nearDups")(
      println("pairs=" + Dedup.minHashNearDups(all, "text", "doc_id",
        threshold = 0.8, bands = 16, rowsPerBand = 4).count()))
    spark.stop()
  }
}
