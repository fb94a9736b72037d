package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    time("docs_warm")(docs.count(): Unit)
    // stage 1: collapse
    val t0 = System.nanoTime()
    val groups = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("rep", min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .select("doc_id", "rep").localCheckpoint()
    println(f"[time] collapse: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    val sh = docs.join(groups.filter(col("doc_id") === col("rep")).select("doc_id"), "doc_id")
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(length(text) - 11, 1)), i -> substring(text, i, 12)))")).as("s"))
      .localCheckpoint()
    println(f"[time] shingles_ckpt: ${(System.nanoTime() - t1) / 1e9}%.2fs")
    // simhash agg
    val t2 = System.nanoTime()
    val hashed = sh.withColumn("h", xxhash64(col("s")))
    val laneSums = (0 until 16).map { g =>
      val lanes = (0 until 4).map { j =>
        val b = g * 4 + j
        shiftleft(shiftright(col("h"), b).bitwiseAND(1), j * 16)
      }
      sum(lanes.reduce(_ + _)).as(s"p$g")
    }
    val perDoc = hashed.groupBy("doc_id").agg(count(lit(1)).as("n"), laneSums: _*)
    val sig0 = (0 until 64).map { b =>
      val cnt = shiftright(col(s"p${b / 4}"), (b % 4) * 16).bitwiseAND(0xffffL)
      when(cnt * 2 > col("n"), lit(1L << b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    val sig = perDoc.select(col("doc_id"), sig0.as("simhash"), col("n").as("sz")).localCheckpoint()
    println(f"[time] simhash_agg: ${(System.nanoTime() - t2) / 1e9}%.2fs")
    // candidates
    val t3 = System.nanoTime()
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND((1L << 16) - 1).as("bh"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val probed = banded.select(col("doc_id"), col("band"),
      explode(expr("concat(array(bh), transform(sequence(0, 15), b -> bh ^ shiftleft(1L, b)))")).as("pv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "pv")
    val capped = probed.withColumn("bsz", count(lit(1)).over(w)).filter(col("bsz") <= 256).drop("bsz")
    val cand = capped.alias("a").join(capped.alias("b"), Seq("band", "pv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
    println(s"cand=${cand.count()}")
    println(f"[time] candidates: ${(System.nanoTime() - t3) / 1e9}%.2fs")
    spark.stop()
  }
}
