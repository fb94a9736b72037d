package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct character-shingle array of
  * a text column — `array_distinct(transform(sequence(1, max(len-k+1,
  * 1)), i -> substring(text, i, k)))` in ONE generated loop.
  *
  * Why a custom `Expression`: shingling runs over every character of
  * every document (the dedup pipelines' single hottest expression) and
  * `transform`'s lambda is evaluated interpreted per element (PERF.md
  * measured lesson #1) — ~550 boxed lambda invocations per document.
  * This emits a tight loop with a LinkedHashSet for within-row dedup,
  * preserving the HOF form's exact semantics: SQL `substring`
  * character addressing and first-occurrence order (asserted
  * element-by-element in ScalaTest), so oracle outputs are unchanged.
  */
case class Shingles(child: Expression, shingleLen: Int)
    extends UnaryExpression {

  require(shingleLen >= 1, s"shingle length must be positive, got $shingleLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val k = math.max(text.numChars() - (shingleLen - 1), 1)
    val set = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= k) {
      set.add(text.substringSQL(i, shingleLen))
      i += 1
    }
    new GenericArrayData(set.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val set = ctx.freshName("set")
      s"""
         |int $k = java.lang.Math.max($text.numChars() - ${shingleLen - 1}, 1);
         |java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String> $set =
         |  new java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String>();
         |for (int $i = 1; $i <= $k; $i++) {
         |  $set.add($text.substringSQL($i, $shingleLen));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.length == 2, "shingles takes (text, shingleLen)")
    children(1) match {
      case Literal(k: Int, IntegerType) => Shingles(children.head, k)
      case other => throw new IllegalArgumentException(
        s"shingles length must be an integer literal, got $other")
    }
  }

  /** Session-local registration so `expr("shingles(text, 12)")`
    * resolves. Idempotent, same policy as [[CosineSimilarity.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("shingles")))
      reg.createOrReplaceTempFunction("shingles", builder, "built-in")
  }

  private[graft] val info = new ExpressionInfo(classOf[Shingles].getName, "shingles")
}
