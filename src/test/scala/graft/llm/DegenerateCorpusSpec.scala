package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The LLM/curation operators against the corpora a real crawl
  * contains: null text, empty strings, whitespace-only, single
  * documents, and fully-empty tables. Nothing here may throw, and
  * totals must account for every row — silent row loss on dirty input
  * is the classic 100 TB pipeline bug.
  */
class DegenerateCorpusSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val dirty = corpus(
    1L -> null,
    2L -> "",
    3L -> "   ",
    4L -> "one",
    5L -> "one two three four five",
    6L -> "one two three four five")

  test("exact dedup: null/empty/blank each fingerprint; nulls keep their row") {
    val out = Dedup.exact(dirty).agg(sum("n_docs")).head().getLong(0)
    // sha2(null) is null -> null fp group still counts its doc
    assert(out == 6L, s"exact dedup dropped rows: kept $out of 6")
  }

  test("minhash LSH: dirty rows produce no pairs, clean dup pair survives, no throw") {
    val pairs = Dedup.minhashLsh(dirty).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 6L)))
  }

  test("simhash pairs: dirty corpus does not throw; exact dups collide") {
    val pairs = Dedup.simhashPairs(dirty).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((5L, 6L)))
  }

  test("fingerprints: every row keeps exactly one fingerprint row") {
    assert(Dedup.fingerprints(dirty).count() == 6L)
  }

  test("quality gate: every row scored, dirty rows rejected not dropped") {
    val out = TextAnalysis.qualityGate(dirty).cache()
    assert(out.count() == 6L, "quality gate must score, not drop")
    val keeps = out.select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(keeps.values.forall(_ != null), "keep flag must never be null")
    assert(keeps(1L) == false, "null text must be an explicit reject")
    assert(keeps(5L) == true, "clean doc must pass")
  }

  test("language id: null -> unknown, never null or throw") {
    val out = dirty.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 6 && out.values.forall(_ != null))
    assert(out(1L) == "unknown" && out(3L) == "unknown")
  }

  test("contamination / stratified sample / repetition on empty + dirty corpora") {
    val empty = corpus()
    assert(Curation.contamination(empty, empty).count() == 0L)
    val sampled = Curation.stratifiedSample(
      dirty.withColumn("source", lit("src0")), Map("src0" -> 1000000L), 0L)
    assert(sampled.count() == 6L, "threshold 10^6 must keep every row incl. dirty")
    // repetition: null text yields a row with null stats or is scored; must not throw
    val rep = Curation.repetitionStats(dirty.filter(col("text").isNotNull))
    assert(rep.count() == 5L)
  }

  test("corpus shuffle / split assign: empty table empty, every dirty row routed exactly once") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.corpusShuffle(empty, "s", 4).count() == 0)
    assert(Curation.splitAssign(empty, "s").count() == 0)
    // shuffle and split key on the id, so null/empty/blank TEXT is
    // irrelevant — all 6 rows must appear exactly once, none dropped
    val shuffled = Curation.corpusShuffle(dirty, "s", 4).collect()
    assert(shuffled.map(_.getAs[Long]("doc_id")).sorted.sameElements(1L to 6L))
    val splits = Curation.splitAssign(dirty, "s").select("doc_id", "split").collect()
    assert(splits.length == 6 &&
      splits.forall(r => Set("train", "val", "test")(r.getString(1))))
  }

  test("near-dup clustering on an empty pair set returns an empty frame, no throw") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.nearDupClusters(noPairs).count() == 0L)
  }

  test("pii scrub redacts emails and IPs; chunking covers every token exactly once per window") {
    import spark.implicits._
    val d = Seq((1L, "mail a.b-c@ex-ample.org and 10.0.255.1 twice a@b.io", "x"))
      .toDF("doc_id", "text", "source")
    d.createOrReplaceTempView("pii_docs")
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val scrubbed = d.select(
      regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"), ip, "<IP>").as("t"),
      size(expr(s"regexp_extract_all(text, '$email', 0)")).as("ne"),
      size(expr(s"regexp_extract_all(text, '$ip', 0)")).as("ni")).head()
    assert(scrubbed.getString(0) == "mail <EMAIL> and <IP> twice <EMAIL>")
    assert(scrubbed.getInt(1) == 2 && scrubbed.getInt(2) == 1)

    // chunking: 120 tokens, window 64 step 48 -> chunks at 0,48,96 with
    // sizes 64,64,24; consecutive chunks overlap by exactly 16
    val doc = (1 to 120).map(i => s"t$i").mkString(" ")
    val chunks = graft.queries.TextOps.chunking
      .run.apply(spark, "/root/testdata/sf0.001") // oracle query runs on testdata
    val toks = split(col("text"), " ")
    val n = Seq((1L, doc)).toDF("doc_id", "text")
      .select(explode(sequence(lit(0), lit(2))).as("i"), toks.as("toks"))
      .select(slice(col("toks"), col("i") * 48 + 1, lit(64)).as("c"))
      .collect().map(_.getSeq[String](0))
    assert(n.map(_.length).toSeq == Seq(64, 64, 24))
    assert(n(0).takeRight(16) == n(1).take(16), "adjacent chunks share the overlap")
    assert(chunks.groupBy("doc_id").agg(max("chunk_idx")).count() > 0)
  }

  test("ANN search: empty query set and empty corpus both return empty, no throw") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val noQueries = emb.filter(col("vec_id") < 0)
    assert(SimilaritySearch.topK(emb, noQueries, 3).count() == 0L)
    assert(SimilaritySearch.topKLsh(emb, noQueries, 3, 6, 2).count() == 0L)
  }
}
