package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: random-hyperplane sign-LSH bucket of a
  * float-vector column — `Σ_p [dot(x, w_p) > 0] << p` with ±1 plane
  * weights derived from engine-neutral integer hashing, in ONE
  * codegen'd pass (all planes in a single loop nest, weights computed
  * inline — no materialized plane vectors, no per-element lambda).
  *
  * Why a custom `Expression`: the `aggregate(zip_with(...))` HOF form
  * evaluates its lambdas interpreted per element — nPlanes × dims
  * invocations per row (PERF.md measured lesson #1); this generates a
  * tight Java loop inside whole-stage codegen. The arithmetic is
  * BIT-IDENTICAL to the HOF form (same weights, same ascending-index
  * double summation), so the DuckDB oracle replay of the LSH pipelines
  * is unaffected — asserted by an equality test in ScalaTest and by
  * the driver's hash check.
  *
  * Weight schemes (both verified offline for balance and pairwise
  * near-orthogonality):
  *   - scheme 0 (ANN search, ≤ 4 planes): w_p(i) = ±1 from bit
  *     (8+5p) of ((p·64+i+1)·2654435761) mod 2³²
  *   - scheme 1 (near-dup pairs, ≤ 8 planes): w_p(i) = ±1 from bit
  *     15 of ((i+1)·(2654435761 + 4096p + 2p²)) mod 2³²
  */
case class SignLshBucket(child: Expression, scheme: Int, nPlanes: Int)
    extends UnaryExpression {

  require(scheme == 0 || scheme == 1, s"unknown signlsh scheme $scheme")
  require(nPlanes >= 1 && nPlanes <= (if (scheme == 0) 4 else 8),
    s"scheme $scheme supports at most ${if (scheme == 0) 4 else 8} planes, got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signlsh_bucket expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "signlsh_bucket"

  // scheme-specific ±1 weight for (plane, dim) — the Java twin lives in
  // doGenCode and MUST stay formula-identical
  @inline private def weight(p: Int, i: Int): Double = {
    val bit =
      if (scheme == 0) ((((p * 64 + i + 1).toLong * 2654435761L) & 0xffffffffL) >> (8 + 5 * p)) & 1L
      else (((i + 1).toLong * (2654435761L + 4096L * p + 2L * p * p) & 0xffffffffL) >> 15) & 1L
    if (bit == 1L) 1.0 else -1.0
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getFloat(i).toDouble * weight(p, i)
        i += 1
      }
      if (dot > 0.0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      val hashExpr =
        if (scheme == 0)
          s"((((long) ($p * 64 + $i + 1)) * 2654435761L) & 0xFFFFFFFFL) >> (8 + 5 * $p)"
        else
          s"((((long) ($i + 1)) * (2654435761L + 4096L * $p + 2L * $p * $p) & 0xFFFFFFFFL)) >> 15"
      s"""
         |int $n = $x.numElements();
         |int $bucket = 0;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = ($hashExpr) & 1L;
         |    double $w = $h == 1L ? 1.0 : -1.0;
         |    $dot += ((double) $x.getFloat($i)) * $w;
         |  }
         |  if ($dot > 0.0) $bucket |= 1 << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object SignLshBucket {

  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.length == 3,
      "signlsh_bucket takes (embedding, scheme, nPlanes)")
    val args = children.tail.map {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"signlsh_bucket scheme/nPlanes must be integer literals, got $other")
    }
    SignLshBucket(children.head, args(0), args(1))
  }

  /** Session-local registration so `expr("signlsh_bucket(e, 0, 4)")`
    * resolves. Idempotent, same policy as [[CosineSimilarity.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("signlsh_bucket")))
      reg.createOrReplaceTempFunction("signlsh_bucket", builder, "built-in")
  }

  private[graft] val info = new ExpressionInfo(
    classOf[SignLshBucket].getName, "signlsh_bucket")
}
