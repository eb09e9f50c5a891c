package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 64-bit SimHash (Charikar 2002; the
  * reference has no near-dup at all — this is the mandated dedup extension)
  * over a tokenized `array<string>` column: per token, a 64-bit hash votes
  * ±1 on every bit position; the fingerprint sets each bit whose vote sum
  * is positive.
  *
  * The per-token hash is the FIRST 8 BYTES OF md5(token) (big-endian — i.e.
  * the first 16 hex chars of the standard digest), NOT a JVM-private mix:
  * md5 is the engine-neutral hash this library already leans on for
  * sampling/sharding/sketches, so a SQL oracle can replay the bit votes
  * exactly — `('0x' || substr(md5(t), 1, 8))::BIGINT` is the high half,
  * chars 9..16 the low half, and bit `j` of the fingerprint is bit `j` of
  * `(hi << 32) | lo`. That turns the whole simhash near-dup gate from a
  * rows-only check into a full hash-match oracle.
  *
  * Codegen calls the same static kernel as the interpreted path (the md5
  * loop dominates; what matters is staying inside whole-stage codegen with
  * no UDF encoder boundary and no Seq[String] materialization).
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.SimhashExpr.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {

  // One MD5 instance per executor thread: MessageDigest is stateful and
  // not thread-safe, and getInstance per row would dominate short docs.
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** 64-bit simhash over the token array: first-8-md5-bytes token hash,
    * ±1 bit votes (null tokens are skipped — `split` never produces them,
    * but a hole must not crash the kernel), bit set iff votes > 0. An
    * empty array votes nothing and returns 0L — the same fingerprint the
    * SQL replay's zero-sum gives.
    */
  def compute(v: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Int](64)
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        md.reset()
        val d = md.digest(v.getUTF8String(i).getBytes)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Column API over the native expression. */
  def sig(toks: Column): Column =
    GraftSqlBridge.column(SimhashExpr(GraftSqlBridge.expression(toks)))
}
