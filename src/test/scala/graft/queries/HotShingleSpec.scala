package graft.queries

import graft.SparkSpec
import java.nio.file.Files

/** q35's hot-shingle safety (VERDICT r5 #1): a corpus-stopword shingle
  * shared by every document must not trigger quadratic pair fan-out.
  * The df cap ([[TextOps.JaccardMaxDf]]) drops it in a count-only
  * pre-pass, so the one hot key costs a counter — not a 10k-element
  * collect_list and ~5*10^7 exploded pairs.
  */
class HotShingleSpec extends SparkSpec {
  import spark.implicits._

  test("q35 on a 10k-doc corpus sharing one hot shingle: no pair explosion, true near-dups kept") {
    val dir = Files.createTempDirectory("hotshingle").toString
    // Every doc opens with the same 3-gram ("alpha beta gamma", df=10000,
    // way past the cap) then diverges into unique words. Docs 0 and 1 are
    // true near-dups: identical except the final word, sharing 9 rare
    // shingles; every other pair shares ONLY the hot shingle.
    val docs = (0 until 10000).map { i =>
      val tail =
        if (i <= 1) (0 until 10).map(j => if (j == 9) s"end$i" else s"dup$j")
        else (0 until 10).map(j => s"u${i}x$j")
      (i.toLong, ("alpha beta gamma " + tail.mkString(" ")), "en", "src0")
    }.toDF("doc_id", "text", "lang", "source")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val out = TextOps.jaccardPairs.run(spark, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val pairs = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((0L, 1L)), s"expected only the injected near-dup pair, got $pairs")
    val jac = out.head.getAs[Double]("jaccard")
    // 13 words -> 11 distinct shingles per doc; docs 0/1 share 10 of
    // them, minus the capped hot one = 9 in the intersection, full set
    // sizes in the denominator: 9 / (11+11-9) = 0.692308
    assert(math.abs(jac - 9.0 / 13.0) < 1e-6, s"jaccard=$jac")
    // capped plan touches ~10k rows post-filter; the uncapped form
    // explodes ~5*10^7 pairs. Generous bound, only to catch the blowup.
    assert(secs < 60, s"q35 took ${secs}s on the hot-shingle corpus")
  }
}
