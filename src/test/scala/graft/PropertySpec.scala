package graft

import graft.ops.SeriesOps
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property tests (SURVEY §5 plan): upsert idempotency,
  * resample conservation, dedup totals. Spark actions per case are
  * expensive ⇒ few, well-seeded cases.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, cases: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(cases).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val genBatch: Gen[(Int, Int, Long)] = for {
    len <- Gen.choose(5, 60)
    overlap <- Gen.choose(0, 5)
    seed <- Gen.choose(1L, 1000L)
  } yield (len, overlap, seed)

  test("upsert is idempotent: merge(merge(a,b),b) == merge(a,b)") {
    check(Prop.forAll(genBatch) { case (len, overlap, seed) =>
      val a = genCandles(len, seed = seed)
        .toDF().withColumn("_batch", lit(1))
      val b = genCandles(math.max(1, len - overlap), startMs = 1672574400000L + (len - overlap) * 60000L, seed = seed + 1)
        .toDF().withColumn("_batch", lit(2))
      def merge(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
        SeriesOps.dedupKeepLast(x.unionByName(y), "_batch", Seq("ts"))
      val once = merge(a, b).orderBy("ts").drop("_batch").collect().toSeq
      val twice = merge(merge(a, b), b).orderBy("ts").drop("_batch").collect().toSeq
      once == twice
    }, cases = 5)
  }

  test("resample conserves volume, count, and OHLC envelope") {
    check(Prop.forAll(Gen.choose(16, 120), Gen.choose(1L, 500L)) { (len, seed) =>
      val data = genCandles(len, seed = seed)
      val res = SeriesOps.resampleOhlcv(data.toDF(), "15min").collect()
      val volOk = math.abs(res.map(_.getAs[Double]("volume")).sum - data.map(_.volume).sum) < 1e-6
      val envOk = res.forall { r =>
        r.getAs[Double]("high") >= math.max(r.getAs[Double]("open"), r.getAs[Double]("close")) &&
          r.getAs[Double]("low") <= math.min(r.getAs[Double]("open"), r.getAs[Double]("close"))
      }
      val bucketsOk = res.length == ((data.last.ts / 900000L) - (data.head.ts / 900000L) + 1).toInt
      volOk && envOk && bucketsOk
    }, cases = 5)
  }

  test("exact dedup partitions the corpus: sum(n_docs) == N, keepers are minima") {
    check(Prop.forAll(Gen.choose(2, 30), Gen.choose(1, 10)) { (nDistinct, dupFactor) =>
      val docs = (0 until nDistinct).flatMap(i =>
        (0 until 1 + (i % dupFactor)).map(j => (i.toLong * 100 + j, s"text body $i")))
        .toDF("doc_id", "text")
      val total = docs.count()
      val out = Dedup.exact(docs).collect()
      out.map(_.getAs[Long]("n_docs")).sum == total &&
        out.forall(r => r.getAs[Long]("keeper") % 100 == 0)
    }, cases = 5)
  }

  test("fused kernels == built-in compositions on random unicode corpora") {
    // one batched DF per sample keeps Spark-job count low while the
    // generator explores separators, empty tokens, and multi-byte chars
    val genToken = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("é", "ü", "中文", "🎉", "", "a-b", "x.y,z"),
      Gen.const(" "))   // double-space when joined
    val genText = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, genToken).map(_.mkString(" ")))
    val genCorpus = Gen.choose(1L, Long.MaxValue).flatMap(seed =>
      Gen.listOfN(25, genText).map(seed -> _))
    check(Prop.forAll(genCorpus) { case (_, textsList) =>
      val df = textsList.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val rows = df.select(
        graft.functions.ShingleHash64(col("text"), 3).as("fusedH"),
        sort_array(transform(graft.queries.TextShingles.wordShingles(col("text"), 3),
          s => graft.llm.TextHash.md5Long(s))).as("builtH"),
        graft.functions.SimHash32Expr(col("text")).as("fusedS"),
        graft.llm.TextHash.simhash32(split(col("text"), " ")).as("builtS"),
        graft.functions.LangIdExpr(col("text"), 0.02).as("fusedL"),
        graft.llm.TextAnalysis.langIdComposed(col("text")).as("builtL")).collect()
      rows.forall { r =>
        r.getSeq[Long](0).sorted == r.getSeq[Long](1).toList.sorted &&
          r.getLong(2) == r.getLong(3) && r.getString(4) == r.getString(5)
      }
    }, cases = 8)
  }

  test("minhash jaccard is 1.0 for identical docs, in [0,1] always") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 30).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.minhashLsh(docs).collect()
    val identical = out.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(identical.exists(_.getAs[Double]("jaccard") == 1.0))
    assert(out.forall(r => r.getAs[Double]("jaccard") >= 0.0 && r.getAs[Double]("jaccard") <= 1.0))
  }
}
