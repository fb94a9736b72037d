package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** The custom codegen'd Catalyst expression: value correctness against
  * a plain-Scala reference, registry resolution, and type checking. */
class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim matches a plain-Scala computation") {
    val s = spark
    import s.implicits._
    CosineSimilarity.register(spark)
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("qe", "ce")
      .select(expr("cosine_sim(qe, ce)")).head().getDouble(0)
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val want = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosine_sim of a vector with itself is 1.0") {
    val s = spark
    import s.implicits._
    CosineSimilarity.register(spark)
    val rows = Tables(spark, sfDir, "embeddings").limit(20)
      .select(expr("cosine_sim(embedding, embedding)")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("cosine_sim rejects non-float-array arguments at analysis") {
    val s = spark
    import s.implicits._
    CosineSimilarity.register(spark)
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("qe", "ce").select(expr("cosine_sim(qe, ce)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"), err.getMessage)
  }

  test("interpreted eval path agrees with codegen (wholestage off)") {
    val s = spark
    import s.implicits._
    CosineSimilarity.register(spark)
    val df = Tables(spark, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), expr("cosine_sim(embedding, reverse(embedding))").as("c"))
    val on = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
