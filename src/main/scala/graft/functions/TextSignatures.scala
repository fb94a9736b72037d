package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Shared rolling-window signature kernels for [[MinHashSig]] and
  * [[SimHash64]] — called from both the interpreted `eval` and the
  * generated code (via the object's static forwarders), so the two
  * paths are the same machine code by construction.
  *
  * The window walk replicates SQL `substring` character addressing
  * over the UTF-8 byte buffer with two byte pointers (no per-window
  * string allocation): windows are the character shingles
  * `substring(text, i, k)` for i = 1 .. max(numChars - k + 1, 1),
  * and each window's bytes are exactly the substring's bytes, so
  * `XXH64.hashUnsafeBytes(slice, seed)` equals Spark's
  * `xxhash64(...)` of the substring — the r3 explode-pipeline hash
  * family is preserved value-for-value (asserted in ScalaTest).
  */
object TextSig {

  /** xxhash64(lit(1), s) == hash(s bytes, seed = hashInt(1, 42)). */
  private val Seed1 = XXH64.hashInt(1, 42L)
  private val Seed2 = XXH64.hashInt(2, 42L)

  /** MinHash signature over the window MULTISET — identical to the
    * r3 distinct-shingle aggregation because `min` is idempotent
    * under duplicates: no within-row dedup structure is needed at
    * all. Broder two-hash family, all terms in the same 32-bit ring
    * (the r3 recall-collapse lesson): m_i = min over shingles of
    * (h1 + i·h2) mod 2³². */
  def minhash(text: UTF8String, shingleLen: Int, numHashes: Int): GenericArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes
    val nChars = text.numChars()
    if (nChars <= shingleLen) {
      val h1 = XXH64.hashUnsafeBytes(base, off, nBytes, Seed1) & 0xffffffffL
      val h2 = (XXH64.hashUnsafeBytes(base, off, nBytes, Seed2) & 0xffffffffL) | 1L
      var i = 0
      while (i < numHashes) { mins(i) = (h1 + i * h2) & 0xffffffffL; i += 1 }
    } else {
      var start = 0
      var end = 0
      var c = 0
      while (c < shingleLen) { end += UTF8String.numBytesForFirstByte(text.getByte(end)); c += 1 }
      var remaining = nChars - shingleLen + 1
      while (remaining > 0) {
        val h1 = XXH64.hashUnsafeBytes(base, off + start, end - start, Seed1) & 0xffffffffL
        val h2 = (XXH64.hashUnsafeBytes(base, off + start, end - start, Seed2) & 0xffffffffL) | 1L
        var i = 0
        while (i < numHashes) {
          val v = (h1 + i * h2) & 0xffffffffL
          if (v < mins(i)) mins(i) = v
          i += 1
        }
        remaining -= 1
        if (remaining > 0) {
          start += UTF8String.numBytesForFirstByte(text.getByte(start))
          end += UTF8String.numBytesForFirstByte(text.getByte(end))
        }
      }
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash: per-bit majority vote over the DISTINCT window
    * hashes — distinctness tracked by the 64-bit window hash itself
    * in an open-addressed long set (no string allocation). A 64-bit
    * collision between two distinct shingles of ONE document
    * (P ≈ windows²/2⁶⁵ ≈ 1e-14) could drop one vote; that perturbs
    * only CANDIDATE generation — the verification stage recomputes
    * exact string shingles — and is far below the banding's own
    * probabilistic terms. */
  def simhash(text: UTF8String, shingleLen: Int): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes
    val nChars = text.numChars()
    val cnt = new Array[Int](64)
    var n = 0
    if (nChars <= shingleLen) {
      val h = XXH64.hashUnsafeBytes(base, off, nBytes, 42L)
      var b = 0
      while (b < 64) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
      n = 1
    } else {
      val windows = nChars - shingleLen + 1
      // set sized 2× windows, bounded at 4M slots (32 MB): a degenerate
      // 100 MB single document falls back DETERMINISTICALLY to multiset
      // voting once the table reaches 3/4 load, rather than growing
      // without bound (candidate-gen-only perturbation, as above)
      var cap = 16
      while (cap < windows * 2 && cap < (1 << 22)) cap <<= 1
      val full = cap - (cap >>> 2)
      var filled = 0
      val set = new Array[Long](cap)
      val mask = cap - 1
      var zeroSeen = false
      var start = 0
      var end = 0
      var c = 0
      while (c < shingleLen) { end += UTF8String.numBytesForFirstByte(text.getByte(end)); c += 1 }
      var remaining = windows
      while (remaining > 0) {
        val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
        var fresh = false
        if (filled >= full) {
          fresh = true // deterministic multiset fallback past 3/4 load
        } else if (h == 0L) {
          if (!zeroSeen) { zeroSeen = true; fresh = true }
        } else {
          var idx = (h ^ (h >>> 32)).toInt & mask
          while (set(idx) != 0L && set(idx) != h) idx = (idx + 1) & mask
          if (set(idx) == 0L) { set(idx) = h; fresh = true; filled += 1 }
        }
        if (fresh) {
          n += 1
          var b = 0
          while (b < 64) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
        }
        remaining -= 1
        if (remaining > 0) {
          start += UTF8String.numBytesForFirstByte(text.getByte(start))
          end += UTF8String.numBytesForFirstByte(text.getByte(end))
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (2 * cnt(b) > n) sig |= 1L << b; b += 1 }
    sig
  }

  /** EXACT per-document shingle statistics `[total, distinct, max
    * multiplicity]` in one rolling-window pass — the kernel behind
    * `shingle_stats` ([[graft.queries.TextQueries.docRepetition]]).
    *
    * Unlike [[simhash]] (whose 64-bit-hash distinctness only perturbs
    * candidate generation), these counts are ORACLE-CHECKED values, so
    * hash distinctness is not acceptable: the open-addressed table
    * stores each slot's first-occurrence window offsets and resolves
    * hash hits by comparing the window BYTES — a 64-bit collision
    * between different shingles costs a byte-compare, never a wrong
    * count. The table grows by doubling (exactness admits no load-
    * bound fallback); memory is O(distinct windows) per row — the
    * same transient footprint the count would need anywhere — and a
    * pipeline bounds document length upstream of per-doc stats. */
  def shingleStats(text: UTF8String, shingleLen: Int): GenericArrayData = {
    val nChars = text.numChars()
    if (nChars <= shingleLen) return new GenericArrayData(Array(1L, 1L, 1L))
    val windows = nChars - shingleLen + 1
    var cap = 16
    while (cap < windows * 2) cap <<= 1
    var mask = cap - 1
    var hashes = new Array[Long](cap)
    var starts = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var cnts = new Array[Int](cap)
    var filled = 0
    var distinct = 0L
    var top = 0L
    var start = 0
    var end = 0
    var c = 0
    while (c < shingleLen) { end += UTF8String.numBytesForFirstByte(text.getByte(end)); c += 1 }
    var remaining = windows
    while (remaining > 0) {
      val len = end - start
      val h = XXH64.hashUnsafeBytes(text.getBaseObject, text.getBaseOffset + start, len, 42L) | 1L
      var idx = (h ^ (h >>> 32)).toInt & mask
      var done = false
      while (!done) {
        if (cnts(idx) == 0) {
          hashes(idx) = h; starts(idx) = start; lens(idx) = len; cnts(idx) = 1
          filled += 1; distinct += 1
          if (top < 1L) top = 1L
          done = true
        } else if (hashes(idx) == h && lens(idx) == len &&
            ByteArrayMethods.arrayEquals(
              text.getBaseObject, text.getBaseOffset + starts(idx),
              text.getBaseObject, text.getBaseOffset + start, len)) {
          cnts(idx) += 1
          if (cnts(idx) > top) top = cnts(idx)
          done = true
        } else idx = (idx + 1) & mask
      }
      if (filled * 4 >= cap * 3) { // grow at 3/4 load
        val nc = cap << 1
        val nh = new Array[Long](nc); val ns = new Array[Int](nc)
        val nl = new Array[Int](nc); val nn = new Array[Int](nc)
        val nm = nc - 1
        var i = 0
        while (i < cap) {
          if (cnts(i) != 0) {
            var j = (hashes(i) ^ (hashes(i) >>> 32)).toInt & nm
            while (nn(j) != 0) j = (j + 1) & nm
            nh(j) = hashes(i); ns(j) = starts(i); nl(j) = lens(i); nn(j) = cnts(i)
          }
          i += 1
        }
        cap = nc; mask = nm; hashes = nh; starts = ns; lens = nl; cnts = nn
      }
      remaining -= 1
      if (remaining > 0) {
        start += UTF8String.numBytesForFirstByte(text.getByte(start))
        end += UTF8String.numBytesForFirstByte(text.getByte(end))
      }
    }
    new GenericArrayData(Array(windows.toLong, distinct, top))
  }
}

/** Native Catalyst expression: the [[graft.queries.DedupQueries]]
  * MinHash signature (array of `numHashes` 32-bit-ring minima) of a
  * text column, computed in ONE rolling-window pass per row.
  *
  * Why a custom `Expression` (r4 perf): the r3 form exploded every
  * character shingle of every document (~3000 rows/doc) through
  * `xxhash64` into a 16-column `min` hash aggregation — the dominant
  * cost of both dedup-pair queries. This keeps the whole signature
  * per-document (a narrow projection: no explode, no shuffle, no
  * per-window string allocation) while producing bit-identical
  * minima (same xxhash64 family, ScalaTest-asserted vs the explode
  * form). */
case class MinHashSig(child: Expression, shingleLen: Int, numHashes: Int)
    extends UnaryExpression {

  require(shingleLen >= 1 && numHashes >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextSig.minhash(input.asInstanceOf[UTF8String], shingleLen, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TextSig.minhash($text, $shingleLen, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native Catalyst expression: 64-bit SimHash of a text column's
  * distinct character shingles in ONE rolling-window pass per row —
  * same rationale and measurement as [[MinHashSig]] (replaces the r3
  * explode + 16-lane packed bit-count aggregation). */
case class SimHash64(child: Expression, shingleLen: Int)
    extends UnaryExpression {

  require(shingleLen >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextSig.simhash(input.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TextSig.simhash($text, $shingleLen);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object MinHashSig {
  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.length == 3, "minhash_sig takes (text, shingleLen, numHashes)")
    (children(1), children(2)) match {
      case (Literal(k: Int, IntegerType), Literal(n: Int, IntegerType)) =>
        MinHashSig(children.head, k, n)
      case other => throw new IllegalArgumentException(
        s"minhash_sig len/numHashes must be integer literals, got $other")
    }
  }
  /** Session-local registration, same policy as [[Shingles.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("minhash_sig")))
      reg.createOrReplaceTempFunction("minhash_sig", builder, "built-in")
  }
}

object SimHash64 {
  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.length == 2, "simhash64 takes (text, shingleLen)")
    children(1) match {
      case Literal(k: Int, IntegerType) => SimHash64(children.head, k)
      case other => throw new IllegalArgumentException(
        s"simhash64 length must be an integer literal, got $other")
    }
  }
  /** Session-local registration, same policy as [[Shingles.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("simhash64")))
      reg.createOrReplaceTempFunction("simhash64", builder, "built-in")
  }
}

/** Native Catalyst expression: exact `[total, distinct, top]` shingle
  * multiplicities of a text column in ONE rolling-window pass — the
  * repetition-scoring kernel ([[TextSig.shingleStats]]). Replaces a
  * position-sequence explode that duplicated each document's full
  * text once per window (~340× row-width amplification) ahead of two
  * shuffling aggregations; this form is a narrow projection. */
case class ShingleStats(child: Expression, shingleLen: Int)
    extends UnaryExpression {

  require(shingleLen >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_stats expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextSig.shingleStats(input.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TextSig.shingleStats($text, $shingleLen);")

  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)
}

object ShingleStats {
  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.length == 2, "shingle_stats takes (text, shingleLen)")
    children(1) match {
      case Literal(k: Int, IntegerType) => ShingleStats(children.head, k)
      case other => throw new IllegalArgumentException(
        s"shingle_stats length must be an integer literal, got $other")
    }
  }
  /** Session-local registration, same policy as [[Shingles.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("shingle_stats")))
      reg.createOrReplaceTempFunction("shingle_stats", builder, "built-in")
  }
}
