// 10x derived-dataset builder for scale-curve evidence (STATUS "Scale-curve
// evidence" sections). Run with:
//   /opt/spark/bin/spark-shell --master 'local[16]' -i tools/scale10_build.scala
//
// Builds /root/repo/target/scale10/ from /root/testdata/sf0.1 as TEN
// id-shifted DISJOINT copies of the big tables, so node/edge/doc/vector
// counts scale honestly 10x (cross-copy rows share no keys: the graph
// becomes 10 disconnected components of the sf0.1 shape, documents gain a
// copy-distinct suffix token so no cross-copy exact dup exists, vectors get
// a deterministic per-copy jitter so no cross-copy identical vector
// exists). Small dims (region/nation/customer/part/events) copy through
// unchanged -- the round-17 scale-curve targets the graph / SQ8 / phrase
// families, none of which read them at scale.
//
// Strides keep every invariant the faces rely on:
//   - suppkey stride 1e6 * 10 copies < 1e12 (the HITS bipartite shift)
//   - stride % 10 == 0 preserves the mod-10 seed-set pattern of
//     gr_pagerank_seeded on every copy
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

val src = "/root/testdata/sf0.1"
val out = "/root/repo/target/scale10"
val copies = 10
val ORD = 100000000L  // orderkey stride (sf0.1 max orderkey ~ 6e5)
val SUP = 1000000L    // suppkey stride  (sf0.1 max suppkey 1000)
val CUS = 1000000L    // custkey stride  (sf0.1 max custkey 15000)
val PRT = 1000000L    // partkey stride
val DOC = 1000000L    // doc_id stride
val VEC = 1000000L    // vec_id stride

def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

def tenfold(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
  (0 until copies).map(i => shift(df, i)).reduce(_ unionAll _)

// lineitem: shift order/supp/part keys per copy
tenfold(rd("lineitem")) { (d, i) =>
  d.withColumn("l_orderkey", col("l_orderkey") + lit(ORD * i))
   .withColumn("l_suppkey",  col("l_suppkey")  + lit(SUP * i))
   .withColumn("l_partkey",  col("l_partkey")  + lit(PRT * i))
}.repartition(16).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

// orders: shift orderkey consistently with lineitem; custkey per copy
tenfold(rd("orders")) { (d, i) =>
  d.withColumn("o_orderkey", col("o_orderkey") + lit(ORD * i))
   .withColumn("o_custkey",  col("o_custkey")  + lit(CUS * i))
}.repartition(8).write.mode("overwrite").parquet(s"$out/orders.parquet")

// supplier: shifted keys so the seeded-PageRank seed set covers all copies
tenfold(rd("supplier")) { (d, i) =>
  d.withColumn("s_suppkey", col("s_suppkey") + lit(SUP * i))
}.coalesce(2).write.mode("overwrite").parquet(s"$out/supplier.parquet")

// documents: shifted ids + a copy-distinct suffix token (no cross-copy
// exact dup; phrase/positional occurrence structure replicates per copy)
tenfold(rd("documents")) { (d, i) =>
  d.withColumn("doc_id", col("doc_id") + lit(DOC * i))
   .withColumn("text", concat(col("text"), lit(s" copymark$i")))
   .withColumn("n_chars", col("n_chars") + lit((s" copymark$i").length.toLong))
}.repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

// embeddings: shifted ids + deterministic per-copy element jitter (keeps
// the magnitude distribution, breaks cross-copy identity)
tenfold(rd("embeddings")) { (d, i) =>
  d.withColumn("vec_id", col("vec_id") + lit(VEC * i))
   .withColumn("embedding",
     expr(s"transform(embedding, (x, j) -> cast(x + 0.001 * (pmod(hash(vec_id, j, $i), 100) - 50) as float))"))
}.repartition(4).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

// pass-through dims
Seq("region", "nation", "customer", "part", "events").foreach { t =>
  rd(t).write.mode("overwrite").parquet(s"$out/$t.parquet")
}
println("scale10 build complete: " + out)
sys.exit(0)
