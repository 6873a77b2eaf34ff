// Measure rounds-to-fixpoint of the k = 60 peel on the part co-purchase
// graph at sf0.01 and sf0.1 (pure ASCII for the REPL; see memory note).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

spark.conf.set("spark.sql.shuffle.partitions", 32)

def probe(dir: String): Unit = {
  val li = spark.read.parquet(dir + "/lineitem.parquet")
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
  val pairs = li.as("a")
    .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
    .select(col("a.pk").as("src"), col("b.pk").as("dst"))
  val raw = pairs.select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
    .filter(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
  var e = raw.select(least(col("s"), col("d")).as("u"),
      greatest(col("s"), col("d")).as("v")).distinct()
    .select(col("u"), col("v")).localCheckpoint(true)
  val k = 60
  var prev = -1L
  var round = 0
  var stable = false
  while (!stable && round < 40) {
    round += 1
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val surv = deg.filter(col("deg") >= k).select("node").localCheckpoint(true)
    val cnt = surv.count()
    println(s"DIR=$dir round=$round survivors=$cnt")
    if (cnt == prev) stable = true
    else {
      prev = cnt
      e = e.join(surv.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(surv.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .localCheckpoint(true)
    }
  }
  println(s"DIR=$dir FIXPOINT after $round rounds (survivors=$prev)")
}

probe("/root/testdata/sf0.01")
probe("/root/testdata/sf0.1")
System.exit(0)
