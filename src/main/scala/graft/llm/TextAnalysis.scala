package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (BASELINE north
  * star): language-ID, quality scoring, token counting. All per-row
  * column expressions (scan + project, embarrassingly parallel — the
  * 100 TB shape is a single pass).
  */
object TextAnalysis {

  /** Common function words per language for the n-gram/stopword LID
    * heuristic (public-knowledge lists, top function words) — canonical
    * data lives in the fused kernel object.
    */
  val langMarkers: Map[String, Seq[String]] = graft.functions.LangIdExpr.markers

  def markerScore(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isin(langMarkers(lang): _*))).cast("double") /
      greatest(size(tokens), lit(1)).cast("double")

  /** Best-scoring language, or "unknown" below `minScore` — the fused
    * one-pass codegen kernel (graft.functions.LangIdExpr). The coalesce
    * reproduces the composition's null behavior (null text ⇒ "unknown",
    * because the when-fold's accumulator starts at lit("unknown")).
    */
  def langId(textCol: Column, minScore: Double = 0.02): Column =
    coalesce(graft.functions.LangIdExpr(textCol, minScore), lit("unknown"))

  /** The pure built-in composition langId replaced — kept as the
    * cross-check for FusedKernelSpec (it is also what the generated q47
    * DuckDB oracle replays).
    */
  def langIdComposed(textCol: Column, minScore: Double = 0.02): Column = {
    val toks = split(lower(textCol), "\\s+")
    val scored = langMarkers.keys.toSeq.sorted.map(l => (l, markerScore(toks, l)))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(lit("unknown")) { case (acc, (l, s)) =>
      when(s === best && s >= minScore, l).otherwise(acc)
    }
  }

  /** BPE-ish token estimate: word runs, digit runs, and single
    * punctuation each count as one token (a public approximation of
    * subword tokenizer cost; exact BPE needs a vocab file).
    */
  def tokenEstimate(textColName: String): Column =
    size(expr(s"regexp_extract_all($textColName, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]', 0)"))
      .cast("long")

  /** Quality features: length, mean word length, stopword ratio,
    * punctuation ratio, uppercase ratio — the standard cheap filters.
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(t, "\\s+")
    docs
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        (length(regexp_replace(t, "\\s+", "")).cast("double") /
          greatest(size(toks), lit(1))))
      .withColumn("stopword_ratio", markerScore(toks, "en"))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("double") /
          greatest(length(t), lit(1)))
  }

  /** Composite keep/drop quality gate (thresholds are the usual public
    * heuristics: too short, too long-words, too punctuation-dense).
    */
  def qualityGate(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(docs, textCol)
      .withColumn("keep",
        // null text ⇒ null features ⇒ null condition: force an explicit
        // reject so BOTH filter(keep) and filter(!keep) see the row —
        // a null flag silently drops it from either branch
        coalesce(
          col("n_tokens") >= 5 && col("mean_token_len").between(2.0, 12.0) &&
            col("punct_ratio") <= 0.2,
          lit(false)))
}
