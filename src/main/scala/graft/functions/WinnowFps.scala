package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing kernel (VERDICT r9 #6, the [[TextSig]]
  * precedent): the DISTINCT window-min document fingerprints of the
  * MOSS algorithm (Schleimer, Wilkerson & Aiken, SIGMOD'03) computed
  * in ONE rolling pass over the text bytes — replaces the r9 explode
  * pipeline that fanned every character position out to a row
  * (~|chars| rows corpus-wide) ahead of a per-doc window-min shuffle.
  *
  * Value contract (equality-tested in Round10Spec against the explode
  * form): each character k-gram hashes to
  * `substring(md5(substring(t, pos, k)), 1, 8)` — the 8-hex-char md5
  * prefix — and the window minimum of those FIXED-WIDTH LOWERCASE HEX
  * strings under binary collation equals the unsigned-32-bit minimum
  * of the digests' first 4 bytes, so the kernel slides an integer
  * monotonic deque and renders hex only for the surviving distinct
  * minima (~2/(w+1) of positions before distinct). Output is sorted
  * ascending for a canonical array; consumers explode it, so order
  * never reaches results. */
object WinnowKernel {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Distinct window-min fingerprints of `text`, or an empty array
    * when the text has no full window (numChars < k + w - 1). */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val nChars = text.numChars()
    val grams = nChars - k + 1
    if (grams < w) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val md = md5Local.get()
    val out = new Array[Byte](16)
    // monotonic min-deque over the last w gram hashes (ring buffer;
    // w+1 slots so the push at a full window never laps the head —
    // the head is evicted BEFORE pushing, but the extra slot keeps
    // full-vs-empty unambiguous without the length counter)
    val ring = w + 1
    val qVal = new Array[Long](ring)
    val qIdx = new Array[Int](ring)
    var qHead = 0
    var qTail = 0 // exclusive
    var qLen = 0
    // open-addressed distinct set of the 32-bit minima (sentinel -1)
    var cap = 64
    var set = Array.fill(cap)(-1L)
    var mask = cap - 1
    var filled = 0
    // two byte pointers replicate SQL substring character addressing
    var start = 0
    var end = 0
    var c = 0
    while (c < k) { end += UTF8String.numBytesForFirstByte(bytes(end)); c += 1 }
    var i = 0
    while (i < grams) {
      md.update(bytes, start, end - start)
      md.digest(out, 0, 16)
      val v = ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
        ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
      // evict the expired head FIRST (index left the window ending
      // at i), then pop dominated tail entries (>= keeps the later
      // equal value, irrelevant to the min VALUE the window reports)
      if (qLen > 0 && qIdx(qHead) <= i - w) {
        qHead = if (qHead == ring - 1) 0 else qHead + 1; qLen -= 1
      }
      while (qLen > 0 && qVal(if (qTail == 0) ring - 1 else qTail - 1) >= v) {
        qTail = if (qTail == 0) ring - 1 else qTail - 1; qLen -= 1
      }
      qVal(qTail) = v; qIdx(qTail) = i
      qTail = if (qTail == ring - 1) 0 else qTail + 1; qLen += 1
      if (i >= w - 1) {
        val m = qVal(qHead)
        var idx = (m ^ (m >>> 16)).toInt & mask
        while (set(idx) != -1L && set(idx) != m) idx = (idx + 1) & mask
        if (set(idx) == -1L) {
          set(idx) = m; filled += 1
          if (filled * 4 >= cap * 3) { // grow at 3/4 load
            val nc = cap << 1
            val ns = Array.fill(nc)(-1L)
            val nm = nc - 1
            var j = 0
            while (j < cap) {
              val x = set(j)
              if (x != -1L) {
                var p = (x ^ (x >>> 16)).toInt & nm
                while (ns(p) != -1L) p = (p + 1) & nm
                ns(p) = x
              }
              j += 1
            }
            cap = nc; mask = nm; set = ns
          }
        }
      }
      i += 1
      if (i < grams) {
        start += UTF8String.numBytesForFirstByte(bytes(start))
        end += UTF8String.numBytesForFirstByte(bytes(end))
      }
    }
    val vals = new Array[Long](filled)
    var j = 0
    var p = 0
    while (p < cap) { if (set(p) != -1L) { vals(j) = set(p); j += 1 }; p += 1 }
    java.util.Arrays.sort(vals)
    val res = new Array[Any](filled)
    j = 0
    while (j < filled) {
      val v = vals(j)
      val cs = new Array[Char](8)
      var b = 0
      while (b < 8) { cs(b) = HexChars(((v >>> ((7 - b) * 4)) & 0xfL).toInt); b += 1 }
      res(j) = UTF8String.fromString(new String(cs))
      j += 1
    }
    new GenericArrayData(res)
  }
}

/** Native Catalyst expression: `winnow_fps(text, k, w)` — the
  * [[WinnowKernel]] as a codegen'd narrow projection (no explode, no
  * per-doc window shuffle; the fingerprint relation becomes
  * `explode(winnow_fps(...))`, exactly the [[MinHashSig]] shape). */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.WinnowKernel.winnow($text, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private[functions] val builder = (children: Seq[Expression]) => {
    if (children.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3084",
        messageParameters = Map("msg" -> "winnow_fps takes (text, k, w)"))
    // fold any constant integer expression (CAST(8 AS INT), 4+4, …),
    // not just bare literals (ADVICE r10) — and fail as an analysis
    // error naming the function, not a raw IllegalArgumentException
    def foldInt(e: Expression, name: String): Int = e match {
      case fe if fe.foldable && fe.dataType == IntegerType =>
        fe.eval(null) match {
          case i: Int => i
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3084",
            messageParameters =
              Map("msg" -> s"winnow_fps $name must be a non-null constant integer"))
        }
      case other => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3084",
        messageParameters = Map("msg" ->
          s"winnow_fps $name must be a constant (foldable) integer, got $other"))
    }
    WinnowFps(children.head, foldInt(children(1), "k"), foldInt(children(2), "w"))
  }
  /** Session-local registration, same policy as [[Shingles.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("winnow_fps")))
      reg.createOrReplaceTempFunction("winnow_fps", builder, "built-in")
  }
}
