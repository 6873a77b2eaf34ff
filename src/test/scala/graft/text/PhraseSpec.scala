package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional postings + exact phrase search. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "cat sat cat sat cat"),          // overlapping repeats
    (3L, "the cat  SAT on nothing"),      // case + double space
    (4L, "sat the cat"),                  // words present, order wrong
    (5L, ""),                             // empty doc
    (6L, "cat")                           // phrase longer than doc
  ).toDF("doc_id", "text")

  private def postings = TextOps.positionalPostings(docs, "text", "doc_id")

  test("positionalPostings: 0-based positions, lowercased, empty docs " +
      "contribute nothing") {
    val p = postings.as[(Long, Int, String)].collect().toSet
    assert(p.contains((1L, 0, "the")) && p.contains((1L, 5, "mat")))
    assert(p.contains((3L, 2, "sat")), "case-folded and double-space safe")
    assert(!p.exists(_._1 == 5L), "empty doc has no postings")
    assert(p.count(_._1 == 2L) === 5)
  }

  test("phraseMatches: exact adjacency, overlap counting, order " +
      "sensitivity, case-insensitive query") {
    val m = TextOps.phraseMatches(postings, Seq("cat", "SAT"))
      .as[(Long, Long)].collect().toMap
    // doc 2 has "cat sat" at positions 0 and 2 — two occurrences
    assert(m === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // order + adjacency: "sat cat" appears only inside doc 2's repeats;
    // doc 4's "sat the cat" has both words but never adjacent
    val rev = TextOps.phraseMatches(postings, Seq("sat", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(rev === Map(2L -> 2L))
  }

  test("phraseMatches: trigram alignment and repeated-term phrases") {
    val tri = TextOps.phraseMatches(postings, Seq("the", "cat", "sat"))
      .as[(Long, Long)].collect().toMap
    assert(tri === Map(1L -> 1L, 3L -> 1L))
    val rep = TextOps.phraseMatches(postings, Seq("cat", "sat", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(rep === Map(2L -> 2L), "repeated query term aligns per slot")
  }

  test("phraseSearchTopK: rank by hits desc then doc_id, k bounds") {
    val top = TextOps.phraseSearchTopK(postings, Seq("cat", "sat"), k = 2)
      .as[(Long, Long, Int)].collect().toList
    assert(top === List((2L, 2L, 1), (1L, 1L, 2)))
    val all = TextOps.phraseSearchTopK(postings, Seq("cat", "sat"), k = 10)
      .as[(Long, Long, Int)].collect().toList
    assert(all === List((2L, 2L, 1), (1L, 1L, 2), (3L, 1L, 3)))
  }

  test("proximityMatches: ordered window pairs, window sensitivity, " +
      "guards") {
    // doc 2 "cat sat cat sat cat": window 1 → cat@0-sat@1, cat@2-sat@3;
    // window 3 adds cat@0-sat@3
    val w1 = TextOps.proximityMatches(postings, "cat", "sat", window = 1)
      .as[(Long, Long)].collect().toMap
    assert(w1 === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    val w3 = TextOps.proximityMatches(postings, "cat", "SAT", window = 3)
      .as[(Long, Long)].collect().toMap
    assert(w3(2L) === 3L, "wider window finds the skip pair")
    // ORDER matters: b must follow a
    val rev = TextOps.proximityMatches(postings, "sat", "cat", window = 1)
      .as[(Long, Long)].collect().toMap
    assert(rev === Map(2L -> 2L))
    // doc 4 "sat the cat": within window 2 even though not adjacent
    val gap = TextOps.proximityMatches(postings, "sat", "cat", window = 2)
      .as[(Long, Long)].collect().toMap
    assert(gap(4L) === 1L)
    intercept[IllegalArgumentException] {
      TextOps.proximityMatches(postings, "cat", "sat", window = 0)
    }
    intercept[IllegalArgumentException] {
      TextOps.proximityMatches(postings, "cat sat", "on", window = 2)
    }
  }

  test("phraseMatches: argument guards (empty phrase, multi-word term, k)") {
    intercept[IllegalArgumentException] {
      TextOps.phraseMatches(postings, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextOps.phraseMatches(postings, Seq("cat sat"))
    }
    intercept[IllegalArgumentException] {
      TextOps.phraseSearchTopK(postings, Seq("cat"), k = 0)
    }
  }

  test("single-term phrase ≡ term frequency") {
    val m = TextOps.phraseMatches(postings, Seq("cat"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 6L -> 1L))
  }

  test("stored bucket-partitioned postings probe ≡ in-memory (pruned scan)") {
    val out = java.nio.file.Files.createTempDirectory("phrase_idx_").toString
    val withBucket = postings
      .withColumn("bucket", TextOps.bm25Bucket(col("term")))
    graft.io.Sinks.onePerPartitionValue(withBucket, Seq("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(out)
    val phrase = Seq("cat", "sat")
    val stored = spark.read.parquet(out)
      .filter(phrase.map(tm => col("bucket") === TextOps.bm25Bucket(lit(tm)))
        .reduce(_ || _))
      .drop("bucket")
    val viaStore = TextOps.phraseMatches(stored, phrase)
      .as[(Long, Long)].collect().toMap
    assert(viaStore === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // the bucket equality is a PARTITION filter on the probe's scan —
    // only the phrase terms' buckets are read (the 100 TB access pattern)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val probe = TextOps.phraseMatches(stored, phrase)
    probe.collect()
    val scans = allPlanNodes(probe.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters
        .exists(_.references.exists(_.name == "bucket"))),
      s"phrase probe lost bucket pruning: ${scans.map(_.partitionFilters)}")
  }
}
