package graft
import org.apache.spark.sql.SparkSession
object ProfStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k")).count().orderBy("k").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.queries.DedupQueries.profStages(spark, sfDir)
    System.err.println("---- rep2")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    graft.queries.DedupQueries.profStages(spark, sfDir)
    spark.stop()
  }
}
