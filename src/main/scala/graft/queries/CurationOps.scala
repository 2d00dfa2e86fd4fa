package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.Curation

/** Oracle-checked queries for the corpus-curation operators (training-
  * data pipeline surface beyond the reference): benchmark
  * decontamination, deterministic stratified sampling, repetition
  * quality signals. Oracle SQL is generated from the same constants as
  * the Spark plans (graft.llm.Curation), so comparisons are bit-exact.
  */
object CurationOps {

  /** Eval-overlap decontamination: docs sharing any word 3-gram with
    * the pseudo-benchmark slice (doc_id % 97 == 0).
    */
  val contamination: Q = Q(
    "q52_contamination",
    Curation.duckContamination(n = 3, benchPred = "doc_id % 97 = 0")) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.contamination(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), n = 3)
      .orderBy("doc_id")
  }

  private val sampleThresholds = Map("src0" -> 1000000L, "src1" -> 500000L,
    "src2" -> 500000L, "src3" -> 100000L)
  private val sampleDefault = 250000L

  /** Hash-mod stratified sampling summary: per-source kept counts under
    * a mixing recipe (src0 keep-all, src1/src2 half, src3 10%, rest
    * 25%) — identical keep set on every run/engine/partitioning.
    */
  val stratified: Q = Q(
    "q53_stratified_sample",
    s"""SELECT source, COUNT(*) AS n_kept,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM documents
       |WHERE ${Curation.duckSampleKeep(sampleThresholds, sampleDefault)}
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (s, d) =>
    Curation.stratifiedSample(Tables.documents(s, d), sampleThresholds, sampleDefault)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source")
  }

  /** Repetition quality signals per doc over a deterministic slice. */
  val repetition: Q = Q(
    "q54_repetition_stats",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t, text
      |  FROM documents WHERE doc_id < 200),
      |base AS (
      |  SELECT doc_id,
      |    CAST(len(t) AS BIGINT) AS n_tokens,
      |    CAST(GREATEST(len(t) - 1, 0) AS BIGINT) AS n_bigrams,
      |    CAST(len(list_distinct(list_transform(
      |      generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]))) AS BIGINT)
      |      AS n_distinct_bigrams
      |  FROM toks),
      |topf AS (
      |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_count FROM (
      |    SELECT doc_id, tok, COUNT(*) AS c
      |    FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks)
      |    GROUP BY doc_id, tok)
      |  GROUP BY doc_id),
      |joined AS (
      |  SELECT b.doc_id, b.n_tokens,
      |    CASE WHEN b.n_bigrams > 0
      |         THEN CAST(1 AS DOUBLE) - CAST(b.n_distinct_bigrams AS DOUBLE)
      |              / CAST(b.n_bigrams AS DOUBLE)
      |         ELSE CAST(0 AS DOUBLE) END AS dup_bigram_ratio,
      |    CAST(t.top_token_count AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
      |      AS top_token_ratio
      |  FROM base b JOIN topf t USING (doc_id))
      |SELECT doc_id, n_tokens, dup_bigram_ratio, top_token_ratio,
      |  (dup_bigram_ratio <= 0.2 AND top_token_ratio <= 0.1) AS pass
      |FROM joined
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.repetitionStats(Tables.documents(s, d).filter(col("doc_id") < 200))
      .select("doc_id", "n_tokens", "dup_bigram_ratio", "top_token_ratio", "pass")
      .orderBy("doc_id")
  }

  /** Sharded deterministic corpus shuffle (training order): 8 shards,
    * per-shard positions — the full permutation layout, hash-checked.
    */
  val corpusShuffle: Q = Q(
    "q65_corpus_shuffle",
    Curation.duckCorpusShuffle(salt = "s42", nShards = 8)) { (s, d) =>
    Curation.corpusShuffle(Tables.documents(s, d), salt = "s42", nShards = 8)
      .select("shard", "pos", "doc_id", "shuffle_key")
      .orderBy("shard", "pos")
  }

  /** Train/val/test split census per source: 98/1/1 hash split,
    * stable under corpus growth, salt-independent of q53/q65.
    */
  val splitAssign: Q = Q(
    "q66_split_assign",
    s"""SELECT source, ${Curation.duckSplitExpr("split7", 98, 1)} AS split,
       |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM documents
       |GROUP BY source, split
       |ORDER BY source, split""".stripMargin) { (s, d) =>
    Curation.splitAssign(Tables.documents(s, d), salt = "split7", trainPct = 98, valPct = 1)
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source", "split")
  }

  private val tokenBudgets = Map("src0" -> 1000000L, "src1" -> 800L)
  private val tokenDefault = 500L

  /** Token-budget mixing: src0 effectively uncapped, src1 trimmed to
    * 800 tokens, everything else to 500 (sources carry ~1.3k tokens at
    * sf0.01, so the default trims well over half) — the admitted set is
    * hash-order deterministic and every admitted row is hash-checked.
    */
  val tokenBudget: Q = Q(
    "q67_token_budget_sample",
    s"""${Curation.duckTokenBudgetSample(tokenBudgets, tokenDefault, salt = "mix1")}
       |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
    Curation.tokenBudgetSample(Tables.documents(s, d), tokenBudgets,
      tokenDefault, salt = "mix1")
      .select("source", "doc_id", "n_tokens", "sample_key", "cum_tokens")
      .orderBy("source", "doc_id")
  }

  val all: Seq[Q] = Seq(contamination, stratified, repetition,
    corpusShuffle, splitAssign, tokenBudget)
}
