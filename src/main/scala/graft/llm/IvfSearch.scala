package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{fdot, fnorm}

/** IVF (inverted-file) approximate nearest neighbor over
  * `embedding: array<float>` — the coarse-quantizer scale path
  * complementing hyperplane LSH (BASELINE north star).
  *
  * Index build: k centroids refined by a few Lloyd iterations (each a
  * single groupBy over the corpus: assign = argmax cosine, update =
  * per-dimension mean), then every vector is assigned a `cluster` id.
  * At 100 TB the assigned corpus is written partitioned by cluster, so
  * a probe reads only nProbe partitions; centroids are tiny (k × dim
  * floats) and always broadcast — the corpus never shuffles for a
  * query.
  *
  * Search: a query probes its nProbe nearest centroids' clusters and
  * ranks candidates by exact cosine.
  */
object IvfSearch {

  /** argmax-cosine cluster id for each vector: centroids are collected
    * (k × dim floats — tiny by construction) and inlined as literal
    * arrays, so assignment is a MAP-ONLY projection — no crossJoin, no
    * shuffle, no per-row window, deterministic under task retry.
    * ‖emb‖ scales every centroid's score equally, so argmax only needs
    * fdot(emb, c)/‖c‖ with ‖c‖ precomputed on the driver. Ties prefer
    * the smaller cluster id.
    */
  private def assign(df: DataFrame, centroids: DataFrame,
                     embCol: String): DataFrame = {
    val cents: Array[(Int, Array[Float], Double)] = centroids
      .collect()
      .map { r =>
        val c = r.getAs[scala.collection.Seq[Float]]("centroid").toArray
        val norm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
        (r.getAs[Int]("cluster"), c, if (norm == 0.0) 1.0 else norm)
      }
      .sortBy(_._1)
    val scored = cents.map { case (k, c, norm) =>
      struct((fdot(col(embCol), array(c.map(lit(_)): _*)) / norm).as("s"),
        lit(-k).as("nk"))
    }
    df.withColumn("cluster", (-greatest(scored.toSeq: _*).getField("nk")).cast("int"))
  }

  /** Build centroids: deterministic seed (every (N/k)-th vector by id
    * rank), then `iters` Lloyd refinements. Returns (cluster, centroid).
    */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 2,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val n = corpus.count()
    val stride = math.max(1L, n / k)
    val w = Window.orderBy(col(idCol))
    var centroids = corpus
      .withColumn("__rk", row_number().over(w))
      .filter((col("__rk") - 1) % stride === 0 && (col("__rk") - 1) / stride < k)
      .select((((col("__rk") - 1) / stride)).cast("int").as("cluster"),
        col(embCol).as("centroid"))
      .localCheckpoint(true)

    for (_ <- 0 until iters) {
      val assigned = assign(corpus.select(col(idCol), col(embCol)), centroids, embCol)
      // per-dimension mean via posexplode + groupBy (map-side combinable)
      centroids = assigned
        .select(col("cluster"), posexplode(col(embCol)).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(avg(col("v")).as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Assign every corpus vector its cluster (the index build output —
    * write this partitioned by `cluster` at scale).
    */
  def buildIndex(corpus: DataFrame, centroids: DataFrame,
                 embCol: String = "embedding"): DataFrame =
    assign(corpus, centroids, embCol)

  /** Top-k ANN: probe the nProbe nearest clusters per query. */
  def topK(index: DataFrame, centroids: DataFrame, queries: DataFrame, k: Int,
           nProbe: Int = 2, idCol: String = "vec_id",
           embCol: String = "embedding"): DataFrame = {
    val wq = Window.partitionBy(col("q_id")).orderBy(col("__sim").desc, col("cluster"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", fdot(col("q_emb"), col("centroid")) /
        (fnorm(col("q_emb")) * fnorm(col("centroid"))))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cluster"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    index.join(broadcast(probes), Seq("cluster"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"),
        (fdot(col("q_emb"), col(embCol)) /
          (fnorm(col("q_emb")) * fnorm(col(embCol)))).as("sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
