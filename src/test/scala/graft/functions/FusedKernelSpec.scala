package graft.functions

import graft.SparkSpec
import graft.llm.TextHash
import graft.queries.TextShingles
import org.apache.spark.sql.functions._

/** The fused per-row kernels (ShingleStrings/ShingleHash64/SimHash32Expr)
  * must be value-identical to the pure built-in compositions they
  * replaced (which in turn are what the DuckDB oracle SQL replays) —
  * this spec pins that equivalence on edge-case inputs the testdata
  * doesn't exercise.
  */
class FusedKernelSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "a b c d e f g",
    "a b",                       // shorter than n
    "",                          // empty
    "x",                         // single token
    "a b c",                     // exactly n
    "dup dup dup dup dup",       // repeated shingles
    "a b c d a b c d a b c",     // repeated n-grams
    "trailing space ",           // trailing separator → empty token kept
    " leading",                  // leading separator
    "double  space here again",  // empty token mid-string
    "unicode é ü 中文 tokens here").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }

  private def df = texts.toDF("id", "text")

  test("ShingleStrings == wordShingles (as sets)") {
    val fused = df.select(col("id"), ShingleStrings(col("text"), 3).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val builtin = df.select(col("id"), TextShingles.wordShingles(col("text"), 3).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(fused == builtin)
  }

  test("ShingleHash64 == md5-prefix of wordShingles (as sets)") {
    val fused = df.select(col("id"), ShingleHash64(col("text"), 3).as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val builtin = df.select(col("id"),
      transform(TextShingles.wordShingles(col("text"), 3), s => TextHash.md5Long(s)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fused == builtin)
  }

  test("SimHash32Expr == built-in simhash32 composition") {
    val fused = df.select(col("id"), SimHash32Expr(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val builtin = df.select(col("id"), TextHash.simhash32(split(col("text"), " ")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == builtin)
  }

  test("TokenHash32 == md5Int over split tokens") {
    val fused = df.filter(length(col("text")) > 0)
      .select(col("id"), TokenHash32(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val builtin = df.filter(length(col("text")) > 0)
      .select(col("id"), transform(split(col("text"), " "), t => TextHash.md5Int(t)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(fused == builtin)
  }

  test("LangIdExpr == built-in langId composition (incl. null ⇒ unknown)") {
    val lidTexts = texts ++ Seq(
      (100L, "the quick brown fox and the lazy dog of it all"),
      (101L, "der hund und die katze ist nicht mit von zu haus"),
      (102L, "le chat est dans la maison pour les amis sur des"),
      (103L, "el perro los gatos las casas una por con para del"),
      (104L, "THE OF AND TO IN A IS THAT FOR IT"), // uppercase → lower()
      (105L, "la la la"),                           // single-lang tie with itself
      (106L, "the der le el"),                      // 4-way tie → reverse-sorted priority
      (107L, "x y z q w"),                          // no markers → unknown
      (108L, "the xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx".padTo(200, 'x')))
    val d = lidTexts.toDF("id", "text")
      .union(Seq((999L, null.asInstanceOf[String])).toDF("id", "text"))
    val fused = d.select(col("id"), graft.llm.TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val builtin = d.select(col("id"), graft.llm.TextAnalysis.langIdComposed(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fused == builtin)
    assert(fused(999L) == "unknown")
    assert(fused(100L) == "en" && fused(101L) == "de" &&
      fused(102L) == "fr" && fused(103L) == "es")
  }

  test("FloatVecDot == aggregate(zip_with) composition, bit-exact") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.5f, -3.25f), Array(0.5f, -1.5f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (3L, Array(1e-30f, 1e30f, -1e30f), Array(1e30f, 1e-30f, 1e-30f)))
      .toDF("id", "a", "b")
    val fused = vecs.select(col("id"), VectorFunctions.fdot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val builtin = vecs.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == builtin) // exact equality, not tolerance
  }
}
