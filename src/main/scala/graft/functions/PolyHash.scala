package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-portable FULL-STRING
  * polynomial feature hash `poly_hash(str, slots)` — the token→slot
  * map of the whole classifier family (hashed logistic regression,
  * DSIR importance models, watermark green-lists, random-baseline
  * splits). Folds every code point through h ← (h·31 + cp) mod 1000003
  * (prime modulus keeps each intermediate < 2²⁵ ⇒ h·31 + cp < 2³⁰ —
  * no overflow anywhere), then cuts to the slot count; empty string
  * hashes to slot 0.
  *
  * This replaces the `aggregate(transform(sequence(...)))` higher-order
  * SQL fold ([[graft.queries.TextQueries.tokSlotExprOf]] emits this
  * expression now): higher-order functions interpret their lambda once
  * PER ELEMENT outside whole-stage codegen, so every token of every
  * document paid an interpreter round-trip (VERDICT r13 #6). The
  * kernel here is one static JIT-friendly byte walk, codegen-resident
  * via `doGenCode`, and allocation-free (no `toString` — code points
  * are decoded directly from the UTF-8 bytes).
  *
  * Cross-engine contract: DuckDB's oracle twin
  * ([[graft.queries.TextQueries.tokSlotSqlOf]]) is `list_reduce` over
  * `string_split(t, '')` with `ascii(c)` — and DuckDB's `ascii`
  * returns the full CODE POINT (measured: ascii('é') = 233,
  * ascii('𝕊') = 120138), so the code-point fold here agrees with the
  * oracle on ALL input, not just ASCII (PolyHashSpec pins a non-ASCII
  * fixture against the measured DuckDB value). */
case class PolyHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects (string, int literal slot count), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(s: Any, n: Any): Any =
    PolyHash.compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.PolyHash.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyHash =
    copy(left = newLeft, right = newRight)
}

object PolyHash {

  /** The scalar kernel (static, codegen-callable): decode UTF-8 code
    * points in place and fold. ASCII input (the corpus) is the 1-byte
    * branch only — a tight byte loop, zero allocation. */
  def compute(s: UTF8String, slots: Int): Int = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      var cp = 0
      if (b < 0x80) { cp = b; i += 1 }
      else if ((b & 0xE0) == 0xC0) {
        cp = ((b & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); i += 2
      } else if ((b & 0xF0) == 0xE0) {
        cp = ((b & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); i += 4
      }
      h = (h * 31 + cp) % 1000003L
    }
    (h % slots).toInt
  }

  private[graft] val info = new ExpressionInfo(
    classOf[PolyHash].getName, "poly_hash")

  private[graft] val builder = (children: Seq[Expression]) => {
    require(children.length == 2, "poly_hash takes exactly 2 arguments")
    PolyHash(children.head, children(1))
  }

  /** Session-local registration so `expr("poly_hash(t, n)")`
    * resolves (idempotent — the [[CosineSimilarity.register]] rule). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("poly_hash")))
      reg.createOrReplaceTempFunction("poly_hash", builder, "built-in")
  }
}
