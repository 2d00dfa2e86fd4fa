package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("contamination flags docs sharing n-grams with the benchmark, counts distinct grams") {
    val bench = docs((100L, "alpha beta gamma delta"))
    val corpus = docs(
      (1L, "zzz alpha beta gamma yyy"),   // shares 'alpha beta gamma'
      (2L, "alpha beta gamma delta qqq"), // shares 2 grams
      (3L, "totally unrelated words here"))
    val out = Curation.contamination(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("stratified sample: deterministic under repartition, rate ~ threshold") {
    import spark.implicits._
    val df = (0 until 4).flatMap(s => (0 until 500).map(i =>
      (s.toLong * 1000 + i, s"src$s"))).toDF("doc_id", "source")
    val thr = Map("src0" -> 1000000L, "src1" -> 500000L)
    def ids(d: org.apache.spark.sql.DataFrame) =
      Curation.stratifiedSample(d, thr, defaultPerMillion = 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(df)
    assert(a == ids(df.repartition(7)), "sample set depends on partitioning")
    assert(a.count(_ < 1000) == 500, "src0 at threshold 10^6 must keep everything")
    val src1 = a.count(id => id >= 1000 && id < 2000)
    // expect ≈ 250 of 500 at rate 0.5 (binomial sd ≈ 11; ±5 sd bounds)
    assert(src1 > 195 && src1 < 305, s"src1 at 0.5 kept $src1 of 500")
    assert(!a.exists(_ >= 2000), "default threshold 0 must drop src2/src3")
  }

  test("corpus shuffle: a true permutation, partition-independent, salt-sensitive") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val out = Curation.corpusShuffle(df, salt = "a", nShards = 4).collect()
    // every doc appears exactly once
    assert(out.map(_.getAs[Long]("doc_id")).toSet == (0L until 400L).toSet)
    // positions are contiguous 1..n within each shard
    out.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to pos.length), s"shard $sh positions not contiguous")
    }
    // identical under repartition (no RNG state)
    val again = Curation.corpusShuffle(df.repartition(7), salt = "a", nShards = 4)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"))).toSet
    assert(again == out.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"),
      r.getAs[Long]("doc_id"))).toSet)
    // a different salt is a different permutation
    val other = Curation.corpusShuffle(df, salt = "b", nShards = 4)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"))).toSet
    assert(other != again, "salt must change the permutation")
  }

  test("split assign: disjoint, exhaustive, stable under corpus growth, ~98/1/1") {
    import spark.implicits._
    val small = (0L until 2000L).map(i => (i, "s")).toDF("doc_id", "source")
    val grown = (0L until 4000L).map(i => (i, "s")).toDF("doc_id", "source")
    def splits(d: org.apache.spark.sql.DataFrame) =
      Curation.splitAssign(d, salt = "split7")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splits(small); val b = splits(grown)
    assert(a.size == 2000 && b.size == 4000)
    // growth never reassigns an existing doc (leakage safety)
    assert(a.forall { case (id, s) => b(id) == s })
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(frac("train") > 0.95 && frac.getOrElse("val", 0.0) < 0.03 &&
      frac.getOrElse("test", 0.0) < 0.03, s"split fractions off: $frac")
  }

  test("token-budget sample: fills each source to its budget, deterministic, no row loss") {
    import spark.implicits._
    val df = (0L until 300L).map(i =>
      (i, s"src${i % 3}", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val budgets = Map("src0" -> 10000L, "src1" -> 50L)
    val out = Curation.tokenBudgetSample(df, budgets, defaultBudget = 30L, salt = "t")
      .collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    // src0's budget exceeds its total -> everything admitted
    assert(bySrc("src0").length == 100, "uncapped source must keep all docs")
    for ((src, budget) <- Seq("src1" -> 50L, "src2" -> 30L)) {
      val rows = bySrc(src).sortBy(r => (r.getAs[Long]("sample_key"), r.getAs[Long]("doc_id")))
      // every admitted doc started under budget; the set fills the budget
      rows.foreach(r => assert(
        r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens") < budget))
      assert(rows.last.getAs[Long]("cum_tokens") >= budget,
        s"$src under-filled: ${rows.last.getAs[Long]("cum_tokens")} of $budget")
    }
    // identical admitted set under repartition
    val again = Curation.tokenBudgetSample(df.repartition(13), budgets, 30L, salt = "t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("repetition stats: boilerplate fails, varied text passes") {
    val out = Curation.repetitionStats(docs(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over one lazy dog today")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_bigram_ratio"), r.getAs[Double]("top_token_ratio"),
          r.getAs[Boolean]("pass"))).toMap
    val (dup1, top1, pass1) = out(1L)
    assert(dup1 > 0.7 && top1 >= 0.5 && !pass1, s"repetitive doc: $dup1 $top1")
    val (dup2, top2, pass2) = out(2L)
    assert(dup2 == 0.0 && top2 == 0.1 && pass2, s"varied doc: $dup2 $top2")
  }
}
