package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expression: cosine similarity of two float-vector
  * columns in ONE codegen'd pass (dot product and both norms in the
  * same loop).
  *
  * Why a custom `Expression` instead of `zip_with`/`aggregate`
  * higher-order functions: Catalyst evaluates HOF lambdas interpreted,
  * per element (measured ~2.5× slower than codegen on bulk data —
  * PERF.md); this expression generates a tight Java loop inside
  * whole-stage codegen. Preference order per SURVEY §2/§7: built-in
  * composition first, custom scalar `Expression` second — this is the
  * second rung, used only where the built-in form is interpreted.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // zero-norm guard: 0/0 would be NaN, and Spark sorts NaN LARGEST —
    // a zero vector would otherwise rank as every query's top neighbor
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val den = ctx.freshName("den")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |double $den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = $den == 0.0 ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  private val info = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "cosine_sim")

  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, "cosine_sim takes exactly 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Session-local registration so `expr("cosine_sim(a, b)")` resolves.
    * Idempotent: skips when already registered, so per-query callers
    * don't spam registry-replacement warnings into every log. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("cosine_sim")))
      reg.createOrReplaceTempFunction("cosine_sim", builder, "built-in")
  }
}

/** `SparkSessionExtensions` hook — users outside this codebase get the
  * COMPLETE custom-expression surface via
  * `spark.sql.extensions=graft.functions.GraftExtensions`: the
  * similarity kernels (`cosine_sim`, `signlsh_bucket`), the text
  * signature kernels (`shingles`, `minhash_sig`, `simhash64`,
  * `shingle_stats`), the media kernel (`media_hist`) and the Bloom
  * expression pair (`graft_bloom_agg`, `graft_might_contain`). The
  * builders are the same ones the session-local `register` hooks use,
  * so both registration paths resolve to identical expressions
  * (asserted in ScalaTest). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("signlsh_bucket"),
      SignLshBucket.info,
      SignLshBucket.builder))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      Shingles.builder))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      MinHashSig.builder))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      SimHash64.builder))
    ext.injectFunction((
      FunctionIdentifier("shingle_stats"),
      new ExpressionInfo(classOf[ShingleStats].getName, "shingle_stats"),
      ShingleStats.builder))
    ext.injectFunction((
      FunctionIdentifier("media_hist"),
      new ExpressionInfo(classOf[MediaHist].getName, "media_hist"),
      MediaHist.builder))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      JaroWinkler.info,
      JaroWinkler.builder))
    ext.injectFunction((
      FunctionIdentifier("sqdist_q"),
      SqDistQ.info,
      SqDistQ.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"graft_bloom_agg(col, estimatedItems, numBits) takes 3 arguments, got ${exprs.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[GraftMightContain].getName, "graft_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_might_contain(bloom, col) takes 2 arguments, got ${exprs.length}")
        GraftMightContain(exprs(0), exprs(1))
      }))
  }
}
