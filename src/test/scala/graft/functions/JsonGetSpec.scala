package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity fuzz for the fused JSON extractor vs the built-in
  * `get_json_object` (the kernel's correctness oracle), plus the
  * malformed-input surface.
  */
class JsonGetSpec extends SparkSpec {

  private val rnd = new scala.util.Random(1234)

  private def randString(): String = {
    val pieces = Seq("plain", "sp ace", "q\\\"uote", "back\\\\slash",
      "tab\\there", "nl\\nline", "uni\\u0041\\u00e9\\u4e2d", "sl\\/ash",
      "", "longer text with words")
    pieces(rnd.nextInt(pieces.size))
  }

  private def randValue(depth: Int): String = rnd.nextInt(if (depth > 0) 8 else 6) match {
    case 0 => "\"" + randString() + "\""
    case 1 => rnd.nextInt(2000000).toString
    case 2 => (rnd.nextInt(20000) / 100.0).toString
    case 3 => if (rnd.nextBoolean()) "true" else "false"
    case 4 => "null"
    case 5 => s"${rnd.nextInt(100)}${if (rnd.nextBoolean()) "e" else "E"}${rnd.nextInt(5)}"
    case 6 => s"""{"a":${randValue(depth - 1)},"b":${rnd.nextInt(99)}}"""
    case 7 => s"""[${randValue(depth - 1)},${rnd.nextInt(99)}]"""
  }

  private def randDoc(): String = {
    val keys = rnd.shuffle(Seq("k", "key2", "x", "deep", "k")) // dup "k" possible
      .take(1 + rnd.nextInt(4))
    keys.map(k => s""""$k":${randValue(1)}""").mkString("{", ",", "}")
  }

  test("fuzz parity with get_json_object on well-formed docs") {
    import spark.implicits._
    val docs = (1 to 2000).map(_ => randDoc()) ++ Seq(
      """{}""", """{"k":null}""", """{"k":""}""", """{"k":0}""", """{"k":-0}""",
      """{"k":1e2}""", """{"k":1.50}""", """{"k":123456789012345678901234}""",
      """{"k":-12.5e-3}""", """{ "k" : 7 }""", """{"other":1}""",
      "{\"k\":\"\u0000\"}", """{"k":42}""", """{"k":[1,{"a":"b"}]}""",
      """{"k":{"n":{"m":[true,null]}}}""",
      // Spark's shared Jackson factory enables ALLOW_SINGLE_QUOTES and
      // ALLOW_UNESCAPED_CONTROL_CHARS - cover both
      """{'k':'single'}""", """{'k':42}""", """{"k":'mixed'}""",
      // the \' escape Jackson admits under ALLOW_SINGLE_QUOTES
      """{'k':'a\'b'}""", """{"k":"a\'b"}""",
      // streaming parse stops at the end of the root value -> trailing
      // content is never read and the value still comes back
      """{"k":1} trailing""", """{"k":1}{"k":2}""", """{"k":1}]""",
      // non-finite floats serialize as QUOTED "Infinity" (Jackson's
      // QUOTE_NON_NUMERIC_NUMBERS), both nested and as the leaf
      """{"k":1e999}""", """{"k":-1e999}""", """{"k":[1e999,2]}""",
      """{"k":{"a":-1e999}}""",
      "{\"k\":\"a\u0001b\"}", "{\"k\":{\"a\":\"c\u0002d\"}}")
    val df = docs.toDF("j")
      .withColumn("builtin", get_json_object($"j", "$.k"))
      .withColumn("fused", JsonGetExpr.jsonGet($"j", "k"))
    val diff = df.filter(!($"builtin" <=> $"fused")).collect()
    def esc(r: Any): String = String.valueOf(r).flatMap {
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    assert(diff.isEmpty,
      s"divergent rows (doc | builtin | fused):\n${diff.take(20).map(r =>
        s"${esc(r.get(0))} | ${esc(r.get(1))} | ${esc(r.get(2))}").mkString("\n")}")
  }

  test("nesting-depth limit matches Jackson's default (1000) exactly") {
    import spark.implicits._
    // root object is depth 1; d nested arrays put the innermost at
    // depth 1+d. Jackson's StreamReadConstraints rejects depth > 1000,
    // so d=999 parses and d=1000 is NULL — assert parity with the
    // builtin at the boundary rather than hardcoding either outcome.
    def doc(d: Int): String = "{\"k\":" + ("[" * d) + "7" + ("]" * d) + "}"
    val docs = Seq(doc(3), doc(998), doc(999), doc(1000), doc(1001))
    val df = docs.toDF("j")
      .withColumn("builtin", get_json_object($"j", "$.k"))
      .withColumn("fused", JsonGetExpr.jsonGet($"j", "k"))
    val diff = df.filter(!($"builtin" <=> $"fused")).collect()
    assert(diff.isEmpty, s"depth divergence:\n${diff.map(r =>
      s"len=${r.getString(0).length} | ${String.valueOf(r.get(1)).take(30)} | ${String.valueOf(r.get(2)).take(30)}").mkString("\n")}")
    // and pin the boundary itself so a Jackson default change shows up
    val ok = df.filter(length($"j") === doc(999).length).select("fused").head.getString(0)
    assert(ok != null, "depth 999 must parse")
  }

  test("malformed input returns NULL") {
    import spark.implicits._
    val bad = Seq(
      "", "   ", "not json", "{", "}", """{"k":}""", """{"k":1,}""",
      """{"k" 1}""", """{k:1}""", """{"k":01}""", """{"k":+1}""", """{"k":.5}""",
      """{"k":1.}""", """{"k":1e}""", """{"k":tru}""", """{"k":"unterminated""",
      """{"k":"bad\escape"}""", "{\"k\":\"\\" + "u00g1\"}",
      """[1,2]""", """"just a string"""")
    val df = bad.toDF("j").withColumn("fused", JsonGetExpr.jsonGet($"j", "k"))
    val nonNull = df.filter($"fused".isNotNull).collect()
    assert(nonNull.isEmpty, s"expected NULL for malformed:\n${nonNull.mkString("\n")}")
  }

  test("null input returns NULL; interpreted eval matches codegen") {
    val r = JsonGetExpr.compute(null, "k")
    assert(r == null)
    // interpreted path (nullSafeEval) on a sample
    val v = JsonGetExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("""{"a":1,"k":"v"}"""), "k")
    assert(v != null && v.toString == "v")
  }
}
