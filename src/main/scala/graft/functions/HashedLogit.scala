package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the hashing-trick classifier
  * ([[graft.queries.TextQueries.qualityClassifier]]): the per-document
  * `[logit, n_tokens]` that the explode form computes as
  * `split → explode → per-token weight → per-doc sum` — i.e. a
  * corpus-sized Generate followed by a corpus-keyed hash aggregation
  * (one full exchange) — collapsed into a NARROW projection: classifier
  * inference at scan speed with no explode, no shuffle, no per-token
  * string allocation on the ASCII fast path.
  *
  * Tokenization replicates `split(trim(text), '\\s+')` exactly:
  * `trim` removes 0x20 only; tokens are maximal runs of
  * non-`[ \t\n\f\r]` bytes; a LEADING non-space whitespace byte
  * yields Java split's leading empty token; an all-empty input yields
  * the single empty token `split` produces. Per token the weight is
  * the query's integer formula over the FULL-STRING polynomial fold
  * (r13, VERDICT r12 #5 — previously length + first codepoint only):
  * h ← (h·31 + cp) mod 1000003 over every codepoint, feat = h mod 64,
  * w = ((feat+1)·2654435761 mod 2³²) mod 17 − 8. Non-ASCII bytes take
  * a slice-decode fallback for the codepoint (allocation only on that
  * rare path). Equality with
  * the explode form is ScalaTest-asserted on the corpus and on planted
  * edge fixtures; interpreted and codegen paths share this kernel, so
  * they are the same machine code by construction. */
object HashedLogitKernel {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Weight of one token given its full-string polynomial hash
    * (h already reduced mod 1000003; an empty token folds to 0 —
    * same slot 0 the previous formula assigned it). */
  private def weight(h: Long): Long = {
    val feat = h % 64
    java.lang.Math.floorMod((feat + 1L) * 2654435761L, 4294967296L) % 17 - 8
  }

  def eval(text: UTF8String): GenericArrayData = {
    val t = text.trim() // trims 0x20 only — same as SQL trim()
    val n = t.numBytes
    var logit = 0L
    var nTokens = 0L
    if (n == 0) {
      // split('', '\s+') -> [""]: one empty token, fold h = 0
      logit += weight(0L)
      nTokens += 1
    } else {
      if (isWs(t.getByte(0))) {
        // Java split emits a leading "" when the input starts with a
        // separator (only non-space whitespace survives trim)
        logit += weight(0L)
        nTokens += 1
      }
      var i = 0
      while (i < n) {
        // skip whitespace run
        while (i < n && isWs(t.getByte(i))) i += 1
        if (i < n) {
          var h = 0L
          while (i < n && !isWs(t.getByte(i))) {
            val b = t.getByte(i)
            val w = UTF8String.numBytesForFirstByte(b)
            val cp =
              if ((b & 0x80) == 0) b.toInt
              else {
                // rare non-ASCII path: decode just this char
                val slice = new Array[Byte](w)
                var k = 0
                while (k < w && i + k < n) { slice(k) = t.getByte(i + k); k += 1 }
                UTF8String.fromBytes(slice).toString.codePointAt(0)
              }
            h = (h * 31 + cp) % 1000003
            i += w
          }
          logit += weight(h)
          nTokens += 1
        }
      }
    }
    new GenericArrayData(Array(logit, nTokens))
  }
}

/** Native Catalyst expression: `hashed_logit(text)` →
  * `array(logit, n_tokens)` in one pass ([[HashedLogitKernel]]). */
case class HashedLogit(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_logit expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_logit"

  override protected def nullSafeEval(input: Any): Any =
    HashedLogitKernel.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.HashedLogitKernel.eval($text);")

  override protected def withNewChildInternal(newChild: Expression): HashedLogit =
    copy(child = newChild)
}

object HashedLogit {
  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.length == 1, "hashed_logit takes (text)")
    HashedLogit(children.head)
  }
  /** Session-local registration, same policy as [[Shingles.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("hashed_logit")))
      reg.createOrReplaceTempFunction("hashed_logit", builder, "built-in")
  }
}
