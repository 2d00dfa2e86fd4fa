package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a text column, as one fused
  * kernel: tokenize → build each shingle string → md5 → first 60 bits
  * as long → first-occurrence distinct. Value-identical to
  * `array_distinct(transform(wordShingles(text, n), s ->
  * conv(substr(md5(s),1,15),16,10)))` — i.e. to the DuckDB oracle
  * fragment `TextHash.duckShingleHashes` — but a single per-row loop
  * instead of five nested higher-order/string expression trees.
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash64.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash64.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash64 {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel (called from both eval and generated code). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // match Spark's split(text, " "): Java regex semantics with limit -1
    // (trailing empty tokens kept)
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars as long == (first 8 bytes big-endian) >>> 4
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      seen.add(h >>> 4)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(new ShingleHash64(Bridge.expression(text), n))
}

/** Distinct word-n-gram shingle STRINGS as one fused kernel —
  * value-identical to TextShingles.wordShingles (first-occurrence
  * distinct; order irrelevant to downstream set ops / explode+groupBy).
  */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(new ShingleStrings(Bridge.expression(text), n))
}

/** Word-token 32-bit md5-prefix hashes (the SimHash vote input) as one
  * fused kernel — value-identical to
  * `transform(split(text, " "), t -> conv(substr(md5(t),1,8),16,10))`.
  */
case class TokenHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hash32"

  override protected def nullSafeEval(input: Any): Any =
    TokenHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHash32 {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash32(md: java.security.MessageDigest, tok: String): Long = {
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars == first 4 bytes, unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val md = digest.get()
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = hash32(md, toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column): Column =
    Bridge.column(new TokenHash32(Bridge.expression(text)))
}

/** Full 32-bit SimHash of a text column in one fused pass — value-
  * identical to TextHash.simhash32(split(text, " ")) (per-bit ±1 votes
  * over token md5-prefix hashes; integer sums, order-free).
  */
case class SimHash32Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32Expr {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val md = digest.get()
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = TokenHash32.hash32(md, toks(i))
      var j = 0
      while (j < 32) {
        votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  def apply(text: Column): Column =
    Bridge.column(new SimHash32Expr(Bridge.expression(text)))
}
