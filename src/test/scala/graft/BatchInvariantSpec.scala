package graft

import org.apache.spark.sql.functions._
import graft.queries.BatchQueries

/** Property-style invariants over the batch surface (SURVEY §5.3). */
class BatchInvariantSpec extends SparkSpec {

  test("topk group count is a prefix of the full sorted aggregation") {
    val full = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_custkey"))
      .limit(20).collect()
    val topk = BatchQueries.topkGroupCount(spark, sfDir).collect()
    assert(topk.toSeq == full.toSeq)
  }

  test("dedup is idempotent and keys are unique") {
    val d = BatchQueries.dedup(spark, sfDir)
    assert(d.count() == d.select("o_custkey").distinct().count())
    assert(d.count() == d.dropDuplicates("o_custkey").count())
  }

  test("zscore outliers are a subset of input orders") {
    val orders = Tables(spark, sfDir, "orders").select("o_orderkey")
    val out = BatchQueries.zscoreOutliers(spark, sfDir).select("o_orderkey")
    assert(out.join(orders, Seq("o_orderkey"), "left_anti").count() == 0)
  }

  test("histogram bin counts sum to the table row count") {
    val total = BatchQueries.histogram(spark, sfDir)
      .agg(sum("cnt")).head().getLong(0)
    assert(total == Tables(spark, sfDir, "orders").count())
  }

  test("csv roundtrip preserves aggregate checksums vs direct parquet") {
    val viaCsv = BatchQueries.csvRoundtrip(spark, sfDir).collect()
    val direct = Tables(spark, sfDir, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.Det.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment").collect()
    assert(viaCsv.toSeq == direct.toSeq)
  }

  test("flatten(collect_list) token pool equals the scalable exploded form") {
    // API coverage for R2's literal flatten-of-collected-lists shape;
    // the flagship q_collect_flatten uses explode+agg (bounded buffers)
    val pooled = Tables(spark, sfDir, "documents")
      .select(col("lang"), split(trim(col("text")), "\\s+").as("toks"))
      .groupBy("lang")
      .agg(flatten(collect_list(col("toks"))).as("pool"))
      .select(col("lang"),
        size(col("pool")).as("total_tokens"),
        size(array_distinct(col("pool"))).as("vocab"))
      .orderBy("lang").collect()
    val scalable = graft.queries.TextQueries.collectFlatten(spark, sfDir)
      .collect()
    assert(pooled.toSeq == scalable.toSeq)
  }

  test("regex filter output only contains matching names and casted ints in range") {
    BatchQueries.regexFilterCast(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[String]("p_name").matches("^\\w+ widget$"))
      val bn = r.getAs[Int]("brand_num")
      assert(bn >= 5 && bn <= 40)
    }
  }
}
