package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import graft.Tables

/** Similarity-search operators over `embeddings` (array<float>, dim=64) —
  * BASELINE north star [EXT].
  *
  * All vector math is done with built-in higher-order functions
  * (zip_with/aggregate) folding LEFT-TO-RIGHT in DOUBLE, which matches
  * DuckDB's sequential list kernels bit-for-bit; results are additionally
  * rounded to 6 decimals on both sides.
  *
  * Scale design: the brute-force top-k broadcasts only the (tiny) query
  * set against the corpus — a map-side cross of Q×N that partitions on the
  * corpus, never shuffles it, and reduces with a per-query top-k window.
  * The LSH-bucketed variant (graft.llm.SimilaritySearch) prunes N with a
  * random-hyperplane bucket equi-join first.
  */
object Embeddings {

  /** dot(a,b) folded sequentially in double — a codegen'd Catalyst
    * expression (graft.functions.FloatVecDot), numerically identical to
    * the `aggregate(zip_with(...))` built-in form and to DuckDB's
    * sequential list kernels.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.fdot(a, b)

  def norm(a: Column): Column = graft.functions.VectorFunctions.fnorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-vector norm + dimension stats (array function coverage F14). */
  val vectorStats: Q = Q(
    "q40_vector_stats",
    """SELECT label, COUNT(*) AS n,
      |  ROUND(SUM(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS sum_sq,
      |  CAST(MIN(len(embedding)) AS BIGINT) AS min_dim,
      |  CAST(MAX(len(embedding)) AS BIGINT) AS max_dim
      |FROM embeddings
      |GROUP BY label
      |ORDER BY label""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(aggregate(col("embedding"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))), 4).as("sum_sq"),
        min(size(col("embedding"))).cast("long").as("min_dim"),
        max(size(col("embedding"))).cast("long").as("max_dim"))
      .orderBy("label")
  }

  /** Brute-force cosine top-k ANN baseline: 5 query vectors × corpus,
    * top-3 neighbors each, deterministic tiebreak on vec_id.
    */
  val cosineTopK: Q = Q(
    "q41_cosine_topk",
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
      |sims AS (
      |  SELECT q_id, vec_id AS n_id,
      |    list_aggregate(list_transform(list_zip(q_emb, embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      |      / (sqrt(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |         * sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
      |  FROM embeddings, q WHERE vec_id <> q_id)
      |SELECT q_id, n_id, ROUND(sim, 6) AS sim, rnk FROM (
      |  SELECT q_id, n_id, sim,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rnk
      |  FROM sims)
      |WHERE rnk <= 3
      |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val sims = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Label-centroid assignment: average vector per label (map-side
    * combinable via per-dimension sums), then count how many vectors are
    * nearer their own label centroid than centroid 0 — exercises
    * array aggregation + rebroadcast-join of a derived dimension.
    */
  val centroidAgg: Q = Q(
    "q42_centroid_agg",
    """WITH sums AS (
      |  SELECT label, COUNT(*) AS n,
      |    ROUND(SUM(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')), 4) AS total_mass,
      |    ROUND(SUM(CAST(embedding[1] AS DOUBLE)), 4) AS dim0_sum,
      |    ROUND(SUM(CAST(embedding[64] AS DOUBLE)), 4) AS dim63_sum
      |  FROM embeddings GROUP BY label)
      |SELECT label, n, total_mass, dim0_sum, dim63_sum FROM sums
      |ORDER BY label""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(aggregate(col("embedding"), lit(0.0), (acc, v) => acc + v.cast("double"))), 4)
          .as("total_mass"),
        round(sum(element_at(col("embedding"), 1).cast("double")), 4).as("dim0_sum"),
        round(sum(element_at(col("embedding"), 64).cast("double")), 4).as("dim63_sum"))
      .orderBy("label")
  }

  /** Int8 max-abs quantization ([EXT] storage compression for embedding
    * corpora — 4× smaller than float32 at negligible recall cost):
    * per-vector scale = 127/max|v|, element q = floor(v·scale + 0.5)
    * (round-half-up, exact in both engines), plus reconstruction-error
    * stats. Map-only per-row arithmetic — composes with any downstream
    * ANN plan; at 100 TB this is the write-side transform before the
    * cluster-partitioned index lands.
    */
  val quantize: Q = Q(
    "q56_embedding_quantize",
    """WITH m AS (
      |  SELECT vec_id, embedding,
      |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS max_abs
      |  FROM embeddings WHERE vec_id < 100),
      |s AS (
      |  SELECT vec_id, embedding,
      |    CASE WHEN max_abs > 0 THEN CAST(127 AS DOUBLE) / max_abs
      |         ELSE CAST(1 AS DOUBLE) END AS scale
      |  FROM m)
      |SELECT vec_id, scale,
      |  CAST(list_aggregate(list_transform(embedding,
      |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + CAST(0.5 AS DOUBLE)) AS BIGINT)), 'sum')
      |    AS BIGINT) AS q_sum,
      |  list_aggregate(list_transform(embedding,
      |    x -> abs(CAST(x AS DOUBLE) -
      |         FLOOR(CAST(x AS DOUBLE) * scale + CAST(0.5 AS DOUBLE)) / scale)), 'max')
      |    AS max_err
      |FROM s
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d).filter(col("vec_id") < 100)
      .withColumn("max_abs", aggregate(col("embedding"), lit(0.0),
        (acc, v) => greatest(acc, abs(v.cast("double")))))
      .withColumn("scale", when(col("max_abs") > 0, lit(127.0) / col("max_abs"))
        .otherwise(lit(1.0)))
      .select(
        col("vec_id"), col("scale"),
        aggregate(col("embedding"), lit(0L),
          (acc, v) => acc + floor(v.cast("double") * col("scale") + 0.5)).as("q_sum"),
        aggregate(col("embedding"), lit(0.0),
          (acc, v) => greatest(acc, abs(v.cast("double") -
            floor(v.cast("double") * col("scale") + 0.5) / col("scale")))).as("max_err"))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(vectorStats, cosineTopK, centroidAgg, quantize)
}
