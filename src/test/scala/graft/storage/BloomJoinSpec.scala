package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  private def keyed(n: Int, stride: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong * stride, s"v$i")).toDF("k", "v")
  }

  test("anti join equals plain left_anti (false positives killed exactly)") {
    val big = keyed(20000, 1)
    val small = keyed(700, 13) // members: multiples of 13 under 9100
    val bloom = BloomJoin.buildBroadcast(small, "k", 700, 0.03)
    val expected = big.join(small.select("k"), Seq("k"), "left_anti")
      .agg(count(lit(1)), coalesce(sum("k"), lit(0L))).head()
    val got = BloomJoin.antiJoin(big, small, "k", bloom)
      .agg(count(lit(1)), coalesce(sum("k"), lit(0L))).head()
    assert(got == expected, s"bloom anti join diverged: $got vs $expected")
  }

  test("semi join equals plain left_semi") {
    val big = keyed(20000, 1)
    val small = keyed(700, 13)
    val bloom = BloomJoin.buildBroadcast(small, "k", 700, 0.03)
    val expected = big.join(small.select("k"), Seq("k"), "left_semi")
      .agg(count(lit(1)), coalesce(sum("k"), lit(0L))).head()
    val got = BloomJoin.semiJoin(big, small, "k", bloom)
      .agg(count(lit(1)), coalesce(sum("k"), lit(0L))).head()
    assert(got == expected, s"bloom semi join diverged: $got vs $expected")
  }

  test("no false negatives; fp rate within bound; probe really prunes") {
    val big = keyed(50000, 1)
    val small = keyed(1000, 31)
    val fpp = 0.01
    val bloom = BloomJoin.buildBroadcast(small, "k", 1000, fpp)
    val maybe = BloomJoin.mightContain(col("k"), bloom)
    val member = col("k") % 31 === 0 && col("k") < 31L * 1000
    val p = big.agg(
      coalesce(sum(when(member && !maybe, 1L)), lit(0L)),
      coalesce(sum(when(!member && maybe, 1L)), lit(0L)),
      coalesce(sum(when(!member, 1L)), lit(0L))).head()
    val (falseNeg, falsePos, nonMembers) = (p.getLong(0), p.getLong(1), p.getLong(2))
    assert(falseNeg == 0L, s"bloom false negative: $falseNeg")
    assert(falsePos <= (5 * fpp * nonMembers).toLong + 8,
      s"fp count $falsePos blows $fpp over $nonMembers non-members")
  }

  test("probe survives codegen + empty build side") {
    import spark.implicits._
    val big = keyed(100, 1)
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val bloom = BloomJoin.buildBroadcast(empty, "k", 64, 0.01)
    // empty filter: everything is a definite miss -> anti join = big
    assert(BloomJoin.antiJoin(big, empty, "k", bloom).count() == 100)
    assert(BloomJoin.semiJoin(big, empty, "k", bloom).count() == 0)
    // null probe keys: left_anti KEEPS them (null = x never matches),
    // left_semi drops them — bloom shapes must agree with the SQL joins
    val withNull = big.withColumn("k",
      when(col("k") === 50, lit(null)).otherwise(col("k")))
    val small = keyed(10, 7)
    val b2 = BloomJoin.buildBroadcast(small, "k", 64, 0.01)
    assert(BloomJoin.antiJoin(withNull, small, "k", b2).count() ==
      withNull.join(small.select("k"), Seq("k"), "left_anti").count())
    assert(BloomJoin.semiJoin(withNull, small, "k", b2).count() ==
      withNull.join(small.select("k"), Seq("k"), "left_semi").count())
  }

  test("persisted artifact: versioned publish, union keeps both batches, racers split seqs") {
    val root = java.nio.file.Files.createTempDirectory("bloomart").toString
    try {
      val a = keyed(500, 3) // multiples of 3
      val b = keyed(500, 7) // multiples of 7
      val bytesA = BloomJoin.buildBytes(a, "k", 2000, 0.01)
      val bytesB = BloomJoin.buildBytes(b, "k", 2000, 0.01)
      assert(BloomJoin.saveVersion(root, bytesA) == 1L)
      val merged = BloomJoin.union(
        BloomJoin.loadLatest(spark, root).get._2.value, bytesB)
      assert(BloomJoin.saveVersion(root, merged) == 2L)
      val (seq, bloom) = BloomJoin.loadLatest(spark, root).get
      assert(seq == 2L)
      // union remembers BOTH batches: every member of a and b probes true
      val probe = BloomJoin.mightContain(col("k"), bloom)
      assert(a.unionByName(b).filter(!probe).count() == 0)
      // geometry mismatch is a loud error, not silent corruption
      val other = BloomJoin.buildBytes(a, "k", 64, 0.1)
      intercept[Exception](BloomJoin.union(merged, other))
      // concurrent publishers: every writer wins a DISTINCT seq
      val seqs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val threads = (1 to 8).map(_ => new Thread(() => {
        seqs.add(BloomJoin.saveVersion(root, bytesA)): Unit
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(seqs.size == 8 && !seqs.contains(1L) && !seqs.contains(2L))
    } finally graft.core.PathWalk.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
