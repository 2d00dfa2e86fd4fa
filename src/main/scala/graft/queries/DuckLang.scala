package graft.queries

import graft.llm.TextAnalysis

/** DuckDB-SQL generator for the language-ID heuristic, derived from the
  * SAME marker lists as `TextAnalysis.langId` (the fused codegen
  * kernel) so the oracle replays the kernel bit-identically — scores
  * are exact int-count ratios in double. Shared by q47 and q86.
  *
  * Contract: the surrounding query must provide a `toks` column
  * (`string_split_regex(lower(text), '\s+')`); `scoreCols` emits one
  * `s_<lang>` score per language, `predictedCase` folds them with the
  * Scala fold's tie priority (later equal-best overwrites ⇒
  * reverse-sorted order in the CASE chain).
  */
object DuckLang {

  private val langs = TextAnalysis.langMarkers.keys.toSeq.sorted

  private def score(l: String): String = {
    val in = TextAnalysis.langMarkers(l).map(m => s"'$m'").mkString(", ")
    s"len(list_filter(toks, t -> t IN ($in))) * 1.0 / greatest(len(toks), 1)"
  }

  /** Select-list fragment: one `s_<lang>` column per language. */
  val scoreCols: String = langs.map(l => s"${score(l)} AS s_$l").mkString(",\n      ")

  /** `CASE … ELSE 'unknown' END` over the `s_<lang>` columns. */
  val predictedCase: String = {
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.reverse.map(l =>
      s"WHEN s_$l >= 0.02 AND s_$l = $best THEN '$l'").mkString("\n        ")
    s"""CASE
       |        $cases
       |        ELSE 'unknown' END""".stripMargin
  }
}
