package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID kernel: one tokenize pass + per-language marker
  * counters + argmax, value-identical to the built-in composition
  *
  * {{{
  *   toks   = split(lower(text), "\\s+")
  *   s_l    = size(filter(toks, _ isin markers(l))) / greatest(size(toks), 1)
  *   best   = greatest(s_de, s_en, s_es, s_fr)
  *   result = fold over sorted langs: when(s_l === best && s_l >= minScore, l)
  * }}}
  *
  * (fold keeps the LAST satisfying language ⇒ reverse-sorted tie
  * priority — replicated here by scanning sorted langs and letting later
  * winners overwrite). The composition re-tokenizes the text 10+ times
  * per row (each markerScore + greatest + the when-chain re-embed the
  * split) — this kernel does it once, which is the whole point: q47 ran
  * at ~1/3 of the entire sf0.1 bench before fusing.
  *
  * Cross-engine notes: lowercasing is UTF8String.toLowerCase (exactly
  * what Spark's `lower()` runs); tokenization is Java `Pattern.split`
  * with limit -1 (exactly what Spark's `split(col, "\\s+")` runs);
  * scores are exact int-count ratios in double — bit-identical to both
  * the built-in composition and the generated DuckDB oracle.
  */
case class LangIdExpr(child: Expression, minScore: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[UTF8String], minScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangIdExpr.compute($c, ${java.lang.Double.toString(minScore)}D)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {

  /** Common function words per language (public-knowledge top function
    * words) — the canonical marker lists; graft.llm.TextAnalysis and the
    * generated q47 oracle SQL both read from here.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"),
    "es" -> Seq("el", "los", "las", "una", "por", "con", "para", "del", "se", "es"))

  /** Languages in sorted order — the fold order of the composition. */
  val langs: Array[String] = markers.keys.toArray.sorted

  private val langUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  private val unknown: UTF8String = UTF8String.fromString("unknown")

  /** marker word → bitmask of language indices (markers happen to be
    * disjoint across languages, but a bitmask keeps counting correct if
    * a word ever appears in two lists).
    */
  private val markerMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case (l, i) =>
      markers(l).foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }

  private val SPACE = java.util.regex.Pattern.compile("\\s+")

  /** Static kernel (called from both eval and generated code). */
  def compute(text: UTF8String, minScore: Double): UTF8String = {
    // identical to Spark's lower(): UTF8String.toLowerCase, then Java
    // regex split with limit -1 (Spark's split(col, "\\s+"))
    val toks = SPACE.split(text.toLowerCase.toString, -1)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val mask = markerMask.get(toks(i))
      if (mask != null) {
        var m = mask.intValue()
        while (m != 0) {
          val j = java.lang.Integer.numberOfTrailingZeros(m)
          counts(j) += 1
          m &= m - 1
        }
      }
      i += 1
    }
    val denom = math.max(toks.length, 1).toDouble
    var best = 0.0
    var j = 0
    while (j < langs.length) {
      val s = counts(j) / denom
      if (s > best) best = s
      j += 1
    }
    var res = unknown
    j = 0
    while (j < langs.length) {
      val s = counts(j) / denom
      if (s == best && s >= minScore) res = langUtf8(j)
      j += 1
    }
    res
  }

  def apply(text: Column, minScore: Double): Column =
    Bridge.column(new LangIdExpr(Bridge.expression(text), minScore))
}
