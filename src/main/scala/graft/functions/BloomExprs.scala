package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a LONG key column.
  *
  * The filter travels as a BROADCAST of its serialized bytes — the only
  * shape that survives real scale: a 1e9-key filter at 3% fpp is
  * ~0.9 GB, which must ship once per executor via the broadcast
  * machinery (torrent), never embedded in the plan as a literal (the
  * task binary is serialized per STAGE and a giant literal would ride
  * along with every task launch). Deserialization happens lazily once
  * per executor JVM (`@transient lazy`), probes are then a pure
  * in-memory hash test.
  *
  * No false negatives (a key that was put always probes true), bounded
  * false positives (fpp) — the contract [[graft.storage.BloomJoin]]
  * builds on.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[Array[Byte]])
  extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloom.value))

  /** Called from both eval and generated code; public so the codegen
    * reference object can reach it.
    */
  def probe(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
