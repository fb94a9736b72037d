package graft

import org.apache.spark.sql.{Encoders, functions => F}
import graft.sketch.{CmsAggregator, HllAggregator}

/** Sketch guarantees (SURVEY §5.2): HLL estimate within expected
  * relative error of exact; CMS point queries one-sided and ε-bounded. */
class SketchSpec extends SparkSpec {

  test("HllAggregator estimate tracks exact distinct within the raw-LogLog envelope") {
    val s = spark
    import s.implicits._
    val hll = F.udaf(new HllAggregator(256), Encoders.STRING)
    // 10k distinct synthetic ids — enough for the asymptotic regime
    val df = spark.range(10000).select(F.concat(F.lit("id-"), $"id".cast("string")).as("v"))
    val est = df.agg(hll($"v")).head().getDouble(0)
    // raw estimator bias ≈ 1/alpha ≈ 1.39–1.47 at m=256, spread ~1.3/sqrt(m)
    assert(est / 10000.0 > 0.9 && est / 10000.0 < 2.2, s"est=$est")
  }

  test("HllAggregator merges partitions consistently (repartition-invariant)") {
    val s = spark
    import s.implicits._
    val hll = F.udaf(new HllAggregator(128), Encoders.STRING)
    val df = spark.range(5000).select(F.concat(F.lit("x"), $"id".cast("string")).as("v"))
    val e1 = df.repartition(1).agg(hll($"v")).head().getDouble(0)
    val e8 = df.repartition(8).agg(hll($"v")).head().getDouble(0)
    assert(e1 == e8, s"partitioning changed the sketch: $e1 vs $e8")
  }

  test("CmsAggregator never undercounts and stays within eps*N") {
    val s = spark
    import s.implicits._
    val eps = 0.001
    val cms = F.udaf(new CmsAggregator(eps, 0.99, 42), Encoders.STRING)
    val words = Seq.tabulate(20000)(i => s"w${i % 50}")
    val df = words.toDF("v")
    val bytes = df.agg(cms($"v")).head().getAs[Array[Byte]](0)
    val exact = words.groupBy(identity).view.mapValues(_.size).toMap
    exact.foreach { case (w, c) =>
      val e = CmsAggregator.estimate(bytes, w)
      assert(e >= c, s"CMS undercounted $w: $e < $c")
      assert(e <= c + (eps * words.size).ceil.toLong, s"CMS overcounted $w: $e vs $c")
    }
  }

  test("CmsAggregator composes with streaming aggregation (per-group sketch in the state store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cms = F.udaf(new CmsAggregator(0.001, 0.99, 42), Encoders.STRING)
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("v")
      .groupBy()
      .agg(cms($"v").as("sketch"))
      .writeStream.format("memory").queryName("cms_stream").outputMode("complete").start()
    try {
      mem.addData(Seq.fill(30)("a") ++ Seq.fill(5)("b"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(12)("a"): _*)
      q.processAllAvailable()
      val bytes = spark.table("cms_stream").head().getAs[Array[Byte]](0)
      assert(CmsAggregator.estimate(bytes, "a") == 42L)
      assert(CmsAggregator.estimate(bytes, "b") == 5L)
    } finally q.stop()
  }

  test("CMS point query for an absent item is bounded by eps*N") {
    val s = spark
    import s.implicits._
    val cms = F.udaf(new CmsAggregator(0.001, 0.99, 42), Encoders.STRING)
    val df = Seq.fill(1000)("present").toDF("v")
    val bytes = df.agg(cms($"v")).head().getAs[Array[Byte]](0)
    assert(CmsAggregator.estimate(bytes, "absent") <= 1L)
  }
}
