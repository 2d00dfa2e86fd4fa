package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SEARCH surface's recall quality gates (VERDICT r16 #2): the
  * dedup surface proves multi-probe recall via component counts; here
  * the q49 search path proves it via neighbor sets — recall@k against
  * the exact brute-force top-k is monotone in nProbe, probing every
  * cluster IS brute force (recall exactly 1), and a planted boundary
  * neighbor invisible to rank-1 probing is found at nProbe=2.
  */
class AnnRecallSpec extends SparkSpec {

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF search recall is monotone in nProbe; probing all clusters equals brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    val exact = pairs(SimilaritySearch.topK(emb, queries, k))
    assert(exact.nonEmpty)
    val centroids = IvfSearch.trainCentroids(emb, k = 8, iters = 1)
    val index = IvfSearch.buildIndex(emb, centroids).cache()
    val kClusters = centroids.count().toInt
    val recalls = Seq(1, 2, 4, kClusters).map { nProbe =>
      val approx = pairs(IvfSearch.topK(index, centroids, queries, k, nProbe = nProbe))
      nProbe -> (exact intersect approx).size.toDouble / exact.size
    }
    recalls.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall must be monotone in nProbe: $p1->$r1 vs $p2->$r2")
    }
    assert(recalls.last._2 == 1.0,
      s"probing all $kClusters clusters IS brute force; got ${recalls.last._2}")
    // the law has to have somewhere to go: rank-1 on Gaussian-blob data
    // with frozen coarse centroids genuinely misses neighbors
    assert(recalls.head._2 < 1.0,
      "test premise: rank-1 probing must miss at least one true neighbor " +
        "(otherwise this corpus cannot distinguish probe levels)")
    emb.unpersist(); index.unpersist()
  }

  /** Unit vector at `angle` in the first coordinate plane of 4-dim
    * space (the SemanticIndexSpec planted-boundary geometry).
    */
  private def planeVec(angle: Double): Seq[Float] = {
    val v = Array.fill(4)(0.0f)
    v(0) = math.cos(angle).toFloat
    v(1) = math.sin(angle).toFloat
    v.toSeq
  }

  test("a planted boundary neighbor invisible at nProbe=1 is found at nProbe=2") {
    import spark.implicits._
    // two tight angular groups around 0 and π pin the trained quantizer
    // to exactly two centroids (the SemanticIndexSpec seed-bucket trick)
    val buckets = (0L until 64L).toDF("id")
      .withColumn("b", pmod(TextHash.md5Long(col("id").cast("string")), lit(8L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
      .filter(_._2.length >= 4).toSeq.sortBy(_._1).take(2)
    assert(buckets.length == 2, "fixture premise: need two seed buckets with >= 4 ids")
    val aIds = buckets(0)._2.take(4)
    val bIds = buckets(1)._2.take(4)
    val groupA = aIds.zipWithIndex.map { case (id, i) => id -> planeVec(i * 0.01) }
    val groupB = bIds.zipWithIndex.map { case (id, i) => id -> planeVec(math.Pi + i * 0.01) }
    val face = math.Pi / 2 + 0.015
    // the query sits just on one side of the Voronoi face; its TRUE
    // nearest neighbor sits just on the other side
    val query = 200L -> planeVec(face - 0.011)
    val neighbor = 201L -> planeVec(face + 0.011)
    val corpus = (groupA ++ groupB :+ query :+ neighbor).toSeq.toDF("vec_id", "embedding")
    val train = (groupA ++ groupB).toSeq.toDF("vec_id", "embedding")
    val centroids = IvfSearch.trainCentroids(train, k = 8, iters = 1)
    val index = IvfSearch.buildIndex(corpus, centroids).cache()
    val queries = corpus.filter(col("vec_id") === 200L)

    // premise: query and its true neighbor land in different rank-1 cells
    val cells = index.filter(col("vec_id").isin(200L, 201L))
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(200L) != cells(201L),
      s"the planted pair must straddle rank-1 cells, got $cells")

    val top1 = pairs(IvfSearch.topK(index, centroids, queries, 1, nProbe = 1))
    assert(!top1.contains((200L, 201L)),
      "rank-1 probing must miss the across-the-face true nearest neighbor " +
        "(the blind spot multi-probe search exists to fix)")
    val top2 = pairs(IvfSearch.topK(index, centroids, queries, 1, nProbe = 2))
    assert(top2 == Set((200L, 201L)),
      s"nProbe=2 must find the true nearest neighbor, got $top2")
    index.unpersist()
  }
}
