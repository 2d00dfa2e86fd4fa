package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.TextShingles

/** Training-corpus curation operators beyond the reference's surface:
  * benchmark decontamination, deterministic stratified sampling (data
  * mixing), and within-document repetition signals (the classic
  * published quality heuristics: duplicate-n-gram and top-token
  * ratios). All pure built-ins over md5-derived hashes, so each has a
  * bit-exact DuckDB oracle (q52–q54).
  */
object Curation {

  /** Benchmark decontamination: corpus documents sharing at least one
    * word n-gram with the benchmark set, with the count of distinct
    * overlapping grams — the standard eval-overlap hygiene check run
    * before training.
    *
    * Scale shape: the benchmark side is DISTINCT n-gram hashes (eval
    * sets are tiny vs the corpus) and is broadcast; the corpus side is
    * a map-only shingle explode followed by a partial-aggregated count
    * keyed by doc_id. The corpus never shuffles its text — only
    * (doc_id, hit) pairs after the broadcast join filter.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // fused kernel ≡ shingleHashes(wordShingles(text, n)) (cross-checked
    // in FusedKernelSpec) — one per-row loop instead of five nested
    // higher-order string expressions; same values, same oracle
    val gram = graft.functions.ShingleHash64(col(textCol), n)
    val benchGrams = benchmark.select(explode(gram).as("gram")).distinct()
    corpus
      .select(col(idCol).as("doc_id"), explode(gram).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id")
      // wordShingles is per-doc distinct, so this counts DISTINCT
      // overlapping grams without a count-distinct shuffle
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Deterministic stratified sampling (data mixing): keep a row iff
    * md5(id) mod 10^6 falls below the stratum's integer threshold —
    * reproducible across runs/engines/partitionings, no RNG state, and
    * exactly the published hash-mod sampling recipe. Thresholds are
    * per-million (0.25 ⇒ 250000L) so the comparison is integer-exact.
    *
    * Scale shape: map-only filter; composes with any downstream plan.
    */
  val SampleDomain: Long = 1000000L

  def stratifiedSample(df: DataFrame, thresholdsPerMillion: Map[String, Long],
                       defaultPerMillion: Long, stratumCol: String = "source",
                       idCol: String = "doc_id"): DataFrame = {
    val key = pmod(TextHash.md5Long(col(idCol).cast("string")), lit(SampleDomain))
    val thr = thresholdsPerMillion.foldLeft(lit(defaultPerMillion)) {
      case (acc, (s, t)) => when(col(stratumCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(key < thr)
  }

  /** Within-document repetition signals (published quality-filter
    * heuristics): duplicate-bigram ratio (1 − distinct/total bigrams)
    * and top-token frequency ratio, plus a pass flag at the
    * conventional thresholds. High values mean boilerplate/spam-like
    * repetition.
    *
    * Scale shape: the bigram side is per-row expressions (map-only);
    * the top-token count shuffles (doc_id, token) once then reduces to
    * doc_id — both aggs are partial+final. The join back to the base
    * stats is co-partitioned on doc_id.
    */
  def repetitionStats(docs: DataFrame, maxDupBigram: Double = 0.2,
                      maxTopToken: Double = 0.1, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = docs.select(
      col(idCol).as("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      greatest(size(toks).cast("long") - 1L, lit(0L)).as("n_bigrams"),
      size(TextShingles.wordShingles(col(textCol), 2)).cast("long")
        .as("n_distinct_bigrams"))

    val topTok = docs
      .select(col(idCol).as("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_token_count"))

    base.join(topTok, Seq("doc_id"))
      .withColumn("dup_bigram_ratio",
        when(col("n_bigrams") > 0,
          lit(1.0) - col("n_distinct_bigrams").cast("double") /
            col("n_bigrams").cast("double")).otherwise(lit(0.0)))
      .withColumn("top_token_ratio",
        col("top_token_count").cast("double") / col("n_tokens").cast("double"))
      .withColumn("pass",
        col("dup_bigram_ratio") <= maxDupBigram &&
          col("top_token_ratio") <= maxTopToken)
  }

  /** Token-budget sampling (data mixing by TOKENS, not documents): docs
    * are laid out per source in deterministic md5-hash order and
    * admitted while the source's cumulative token count at the doc's
    * START is below its budget — so every source fills to its token
    * target with an unbiased pseudo-random subset, the way mixture
    * recipes are actually specified (e.g. "100B tokens of web, 20B of
    * code"). The last admitted doc may overflow its budget by < its own
    * length (same offset convention as sequence packing q60).
    *
    * Scale shape: one per-source sort-shuffle window over (key, tokens)
    * pairs — text never enters the shuffle; the window is partitioned by
    * source, so parallelism is bounded by source count. With few huge
    * sources, pre-threshold with [[stratifiedSample]] at ~budget/total
    * rate first, then exact-trim the small remainder with this op.
    */
  def tokenBudgetSample(docs: DataFrame, budgets: Map[String, Long],
                        defaultBudget: Long, salt: String,
                        idCol: String = "doc_id", textCol: String = "text",
                        stratumCol: String = "source"): DataFrame = {
    val key = TextHash.md5Long(concat(col(idCol).cast("string"), lit(":" + salt)))
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col("sample_key"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(stratumCol), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        key.as("sample_key"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // admitted iff the budget was not yet exhausted when this doc starts
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  /** Deterministic corpus shuffling (training-order permutation): every
    * document gets an md5 shuffle key from (id, salt), is routed to
    * `key % nShards`, and receives its position within the shard by
    * (key, id) order — the sharded-shuffle layout real training
    * pipelines write (N shard files, each internally permuted; readers
    * interleave shards). Changing the salt produces an independent
    * permutation; no RNG state, identical on every run/engine.
    *
    * Scale shape: one shuffle keyed on shard + a per-shard sort — a
    * distributed sort of (key, id) pairs, never a global single-
    * partition window; text never enters the shuffle. Parallelism is
    * bounded by nShards: size it like an output-file count
    * (corpus_rows / ~10M per shard, thousands at 100 TB), never a
    * small constant — the declared q65 uses 8 only because the oracle
    * corpus is tiny.
    */
  def corpusShuffle(docs: DataFrame, salt: String, nShards: Int,
                    idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = TextHash.md5Long(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    docs
      .select(col(idCol), key.as("shuffle_key"))
      // md5Long is non-negative (60-bit), so plain % == pmod on both engines
      .withColumn("shard", (col("shuffle_key") % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Hash-based train/val/test split assignment: `md5(id:salt) % 100`
    * buckets to train (< trainPct), val (< trainPct+valPct), else test.
    * Documents keep their split forever (stable under corpus growth),
    * the standard leakage-safe recipe — and a DIFFERENT salt than any
    * sampling/shuffle step so the splits are independent of them.
    *
    * Scale shape: map-only expression; composes with any plan.
    */
  def splitAssign(docs: DataFrame, salt: String, trainPct: Int = 98,
                  valPct: Int = 1, idCol: String = "doc_id"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val key = TextHash.md5Long(concat(col(idCol).cast("string"), lit(":" + salt))) % 100
    docs.withColumn("split",
      when(key < trainPct, lit("train"))
        .when(key < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  // ---- DuckDB oracle fragments (same constants, same arithmetic) ----

  /** DuckDB: the token-budget sample pipeline (same key arithmetic;
    * CAST the cumulative SUM to BIGINT — DuckDB windows SUM(BIGINT) as
    * HUGEINT).
    */
  def duckTokenBudgetSample(budgets: Map[String, Long], defaultBudget: Long,
                            salt: String): String = {
    val key = TextHash.duckMd5Long(s"doc_id::VARCHAR || ':$salt'")
    val budget =
      if (budgets.isEmpty) defaultBudget.toString
      else "(CASE " + budgets.toSeq.sortBy(_._1)
        .map { case (s, b) => s"WHEN source = '$s' THEN $b" }
        .mkString(" ") + s" ELSE $defaultBudget END)"
    s"""SELECT source, doc_id, n_tokens, sample_key, cum_tokens FROM (
       |  SELECT source, doc_id, n_tokens, sample_key,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY sample_key, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS cum_tokens
       |  FROM (
       |    SELECT source, doc_id,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |      $key AS sample_key
       |    FROM documents))
       |WHERE cum_tokens - n_tokens < $budget""".stripMargin
  }

  /** DuckDB: the full sharded-shuffle pipeline (same key arithmetic). */
  def duckCorpusShuffle(salt: String, nShards: Int): String = {
    val key = TextHash.duckMd5Long(s"doc_id::VARCHAR || ':$salt'")
    s"""WITH sharded AS (
       |  SELECT doc_id, $key AS shuffle_key, CAST($key % $nShards AS BIGINT) AS shard
       |  FROM documents)
       |SELECT shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
       |       ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
       |  doc_id, shuffle_key
       |FROM sharded
       |ORDER BY shard, pos""".stripMargin
  }

  /** DuckDB: the split-assignment expression (same key arithmetic). */
  def duckSplitExpr(salt: String, trainPct: Int, valPct: Int): String = {
    val key = s"(${TextHash.duckMd5Long(s"doc_id::VARCHAR || ':$salt'")} % 100)"
    s"""CASE WHEN $key < $trainPct THEN 'train'
       |     WHEN $key < ${trainPct + valPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** DuckDB: the full contamination pipeline (constants must match). */
  def duckContamination(n: Int, benchPred: String): String = {
    val grams = TextHash.duckShingleHashes(n)
    s"""WITH bench AS (
       |  SELECT DISTINCT UNNEST($grams) AS gram FROM documents WHERE $benchPred),
       |corpus AS (
       |  SELECT doc_id, UNNEST($grams) AS gram FROM documents WHERE NOT ($benchPred))
       |SELECT c.doc_id, COUNT(*) AS n_hit_grams
       |FROM corpus c JOIN bench b USING (gram)
       |GROUP BY c.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB: the stratified-sample keep predicate. */
  def duckSampleKeep(thresholdsPerMillion: Map[String, Long],
                     defaultPerMillion: Long): String = {
    val key = s"(${TextHash.duckMd5Long("doc_id::VARCHAR")} % $SampleDomain)"
    if (thresholdsPerMillion.isEmpty) s"$key < $defaultPerMillion" // CASE with no WHEN is invalid SQL
    else {
      val cases = thresholdsPerMillion.toSeq.sortBy(_._1)
        .map { case (s, t) => s"WHEN source = '$s' THEN ${t}" }.mkString(" ")
      s"$key < (CASE $cases ELSE $defaultPerMillion END)"
    }
  }
}
