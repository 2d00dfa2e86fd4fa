package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass JSON top-level-field extractor, value-identical to
  * `get_json_object(json, "$.<key>")` (fuzz parity in JsonGetSpec,
  * including the built-in's subtle corners: the first NON-null
  * occurrence wins on duplicate keys, nested values are re-serialized
  * compactly with Jackson's number normalization and string escaping,
  * JSON null → SQL NULL, malformed document → SQL NULL).
  *
  * Why not the built-in: Spark's `get_json_object` acquires a Jackson
  * parser PER ROW, and Jackson's buffer-recycler acquisition goes
  * through `ThreadLocal.get` → `getEntryAfterMiss`, whose cost depends
  * on the thread's ThreadLocalMap / SoftReference state. Under a
  * long-lived executor thread that state degrades and the acquisition
  * dominates: profiled at sf1 (1 M events), q24 swung 1.8 s ↔ 144 s
  * run-to-run with every task thread pinned in `getEntryAfterMiss`.
  * This kernel does one pool-free, thread-local-free scan per row —
  * constant ~µs/row regardless of executor age. At 100 TB executor
  * threads live for days; that difference is the whole operator.
  */
case class JsonGetExpr(child: Expression, key: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "json_get"

  override protected def nullSafeEval(input: Any): Any =
    JsonGetExpr.compute(input.asInstanceOf[UTF8String], key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // key is a plan-time constant; reference it as an object (never
    // splice user text into generated source)
    val keyRef = ctx.addReferenceObj("jsonGetKey", key, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonGetExpr.compute($c, $keyRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonGetExpr {

  /** `get_json_object(json, "$.key")` for DataFrame code, minus the
    * per-row Jackson parser.
    */
  def jsonGet(json: Column, key: String): Column =
    Bridge.column(new JsonGetExpr(Bridge.expression(json), key))

  /** Single pass; returns null for a malformed document, absent key,
    * or a key whose every occurrence is JSON null.
    */
  def compute(json: UTF8String, key: String): UTF8String = {
    if (json == null) return null
    val s = json.toString
    val n = s.length
    var i = 0

    def ws(): Unit =
      while (i < n && { val c = s.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1

    def atQuote: Boolean =
      i < n && { val c = s.charAt(i); c == '"' || c == '\'' }

    // decode the JSON string at s(i) (Spark's factory enables
    // ALLOW_SINGLE_QUOTES, so '...' is accepted alongside "...") into
    // `out` (null out = skip); returns false on malformed
    def parseString(out: java.lang.StringBuilder): Boolean = {
      if (!atQuote) return false
      val q = s.charAt(i)
      i += 1
      while (i < n) {
        val c = s.charAt(i)
        if (c == q) { i += 1; return true }
        else if (c == '\\') {
          i += 1
          if (i >= n) return false
          val e = s.charAt(i)
          i += 1
          e match {
            case '"' => if (out != null) out.append('"')
            case '\'' => if (out != null) out.append('\'') // ALLOW_SINGLE_QUOTES also admits \'
            case '\\' => if (out != null) out.append('\\')
            case '/' => if (out != null) out.append('/')
            case 'b' => if (out != null) out.append('\b')
            case 'f' => if (out != null) out.append('\f')
            case 'n' => if (out != null) out.append('\n')
            case 'r' => if (out != null) out.append('\r')
            case 't' => if (out != null) out.append('\t')
            case 'u' =>
              if (i + 4 > n) return false
              var cp = 0
              var j = 0
              while (j < 4) {
                val h = Character.digit(s.charAt(i + j), 16)
                if (h < 0) return false
                cp = (cp << 4) | h
                j += 1
              }
              i += 4
              if (out != null) out.append(cp.toChar)
            case _ => return false // Jackson rejects unknown escapes
          }
        } else {
          // raw control chars allowed: Spark's factory enables
          // ALLOW_UNESCAPED_CONTROL_CHARS
          if (out != null) out.append(c)
          i += 1
        }
      }
      false // unterminated
    }

    // re-encode a decoded string the way Jackson's generator does:
    // minimal escaping — quote, backslash, \b\t\n\f\r short forms,
    // other control chars as uppercase \u00XX, everything else raw
    def appendQuoted(out: java.lang.StringBuilder, v: CharSequence): Unit = {
      out.append('"')
      var j = 0
      val m = v.length
      while (j < m) {
        val c = v.charAt(j)
        if (c == '"') out.append("\\\"")
        else if (c == '\\') out.append("\\\\")
        else if (c >= ' ') out.append(c)
        else c match {
          case '\b' => out.append("\\b")
          case '\t' => out.append("\\t")
          case '\n' => out.append("\\n")
          case '\f' => out.append("\\f")
          case '\r' => out.append("\\r")
          case _ =>
            out.append("\\u00")
            out.append("0123456789ABCDEF".charAt((c >> 4) & 0xF))
            out.append("0123456789ABCDEF".charAt(c & 0xF))
        }
        j += 1
      }
      out.append('"')
    }

    // strict JSON number grammar; appends Jackson's rendering (ints via
    // long/BigInteger, floats via double → Double.toString, so "1e2" →
    // "100.0" and "1.50" → "1.5"); returns false on malformed
    def parseNumber(out: java.lang.StringBuilder): Boolean = {
      val start = i
      if (i < n && s.charAt(i) == '-') i += 1
      if (i >= n) return false
      val d0 = s.charAt(i)
      if (d0 == '0') i += 1
      else if (d0 >= '1' && d0 <= '9') { while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1 }
      else return false
      var isFloat = false
      if (i < n && s.charAt(i) == '.') {
        isFloat = true; i += 1
        val fs = i
        while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1
        if (i == fs) return false
      }
      if (i < n && { val c = s.charAt(i); c == 'e' || c == 'E' }) {
        isFloat = true; i += 1
        if (i < n && { val c = s.charAt(i); c == '+' || c == '-' }) i += 1
        val es = i
        while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1
        if (i == es) return false
      }
      if (out != null) {
        val raw = s.substring(start, i)
        if (isFloat) {
          val d = java.lang.Double.parseDouble(raw)
          // Jackson's generator (QUOTE_NON_NUMERIC_NUMBERS, default on)
          // writes a non-finite double as a QUOTED string — e.g. 1e999
          // overflows to Infinity and serializes as "Infinity"
          if (java.lang.Double.isFinite(d)) out.append(java.lang.Double.toString(d))
          else { out.append('"'); out.append(java.lang.Double.toString(d)); out.append('"') }
        } else {
          try out.append(java.lang.Long.toString(java.lang.Long.parseLong(raw)))
          catch { case _: NumberFormatException => out.append(new java.math.BigInteger(raw).toString) }
        }
      }
      true
    }

    // parse + canonically re-render any JSON value (token-level
    // validation everywhere, like Jackson's full-stream parse).
    // `depth` = Jackson nesting depth of the ENCLOSING containers (root
    // object = 1); a container that would open at depth > 1000 fails,
    // matching Jackson's default StreamReadConstraints max-depth.
    // Returns: 1 ok, 0 malformed, -1 value was a top-level JSON null
    // (rendered as the literal inside containers by the callers below).
    def parseValue(out: java.lang.StringBuilder, depth: Int): Int = {
      if (i >= n) return 0
      s.charAt(i) match {
        case '"' | '\'' =>
          if (out == null) { if (parseString(null)) 1 else 0 }
          else {
            val tmp = new java.lang.StringBuilder(16)
            if (!parseString(tmp)) 0 else { appendQuoted(out, tmp); 1 }
          }
        case '{' =>
          if (depth + 1 > 1000) return 0
          i += 1
          if (out != null) out.append('{')
          ws()
          if (i < n && s.charAt(i) == '}') { i += 1; if (out != null) out.append('}'); return 1 }
          var first = true
          while (true) {
            ws()
            if (!first) { if (out != null) out.append(',') }
            first = false
            if (out == null) { if (!parseString(null)) return 0 }
            else {
              val kt = new java.lang.StringBuilder(8)
              if (!parseString(kt)) return 0
              appendQuoted(out, kt)
            }
            ws()
            if (i >= n || s.charAt(i) != ':') return 0
            i += 1
            if (out != null) out.append(':')
            ws()
            val r = parseValue(out, depth + 1)
            if (r == 0) return 0
            if (r == -1 && out != null) out.append("null")
            ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else if (i < n && s.charAt(i) == '}') { i += 1; if (out != null) out.append('}'); return 1 }
            else return 0
          }
          1
        case '[' =>
          if (depth + 1 > 1000) return 0
          i += 1
          if (out != null) out.append('[')
          ws()
          if (i < n && s.charAt(i) == ']') { i += 1; if (out != null) out.append(']'); return 1 }
          var first = true
          while (true) {
            ws()
            if (!first) { if (out != null) out.append(',') }
            first = false
            val r = parseValue(out, depth + 1)
            if (r == 0) return 0
            if (r == -1 && out != null) out.append("null")
            ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else if (i < n && s.charAt(i) == ']') { i += 1; if (out != null) out.append(']'); return 1 }
            else return 0
          }
          1
        case 't' => if (s.startsWith("true", i)) { i += 4; if (out != null) out.append("true"); 1 } else 0
        case 'f' => if (s.startsWith("false", i)) { i += 5; if (out != null) out.append("false"); 1 } else 0
        case 'n' => if (s.startsWith("null", i)) { i += 4; -1 } else 0
        case _ => if (parseNumber(out)) 1 else 0
      }
    }

    ws()
    if (i >= n || s.charAt(i) != '{') return null
    i += 1
    var result: String = null
    ws()
    if (i < n && s.charAt(i) == '}') i += 1
    else {
      var continue = true
      while (continue) {
        ws()
        val kb = new java.lang.StringBuilder(8)
        if (!parseString(kb)) return null
        ws()
        if (i >= n || s.charAt(i) != ':') return null
        i += 1
        ws()
        // first NON-null occurrence wins (a JSON-null match is skipped
        // and a later duplicate may still supply the value) — matches
        // the built-in, which doesn't emit anything for a null leaf
        val take = result == null && kb.toString == key
        if (take && atQuote) {
          // matched string leaf: the built-in writeRaw()s the DECODED
          // text, unquoted — unlike strings inside nested values
          val vb = new java.lang.StringBuilder(16)
          if (!parseString(vb)) return null
          result = vb.toString
        } else {
          val out = if (take) new java.lang.StringBuilder(16) else null
          val r = parseValue(out, 1) // root object is Jackson nesting depth 1
          if (r == 0) return null
          if (take && r == 1) result = out.toString
        }
        ws()
        if (i < n && s.charAt(i) == ',') i += 1
        else if (i < n && s.charAt(i) == '}') { i += 1; continue = false }
        else return null
      }
    }
    // Deliberately NO trailing-content check: the built-in's streaming
    // parse never reads past the root value, so '{"k":1} garbage'
    // returns '1'. Matching that here (verified against Spark 4.1.2).
    if (result == null) null else UTF8String.fromString(result)
  }
}
