package graft

import org.apache.spark.sql.functions._

/** Compression-codec coverage for the parquet/CSV sinks: the engine's
  * storage tier must round-trip bit-identical content under every codec
  * a 100 TB deployment would tune between (zstd for cold storage,
  * snappy/lz4 for hot, gzip for interchange). Content equality is the
  * contract — codecs may not change a single value; sizes are
  * layout-dependent and deliberately NOT asserted (file bytes vary with
  * partitioning and are not a correctness surface). */
class CodecRoundtripSpec extends SparkSpec {

  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)),
      expr("bit_xor(xxhash64(o_orderkey, o_custkey, o_orderstatus," +
        " o_totalprice, o_orderdate, o_orderpriority))")).head
    (r.getLong(0), r.getLong(1))
  }

  test("parquet round-trips identical content under zstd, gzip, snappy, lz4") {
    val orders = Tables(spark, sfDir, "orders")
    val want = fingerprint(orders)
    for (codec <- Seq("zstd", "gzip", "snappy", "lz4", "uncompressed")) {
      val path = s"${Tables.scratchDir}/codec_$codec"
      orders.write.mode("overwrite").option("compression", codec).parquet(path)
      val got = fingerprint(spark.read.parquet(path))
      assert(got == want, s"codec $codec changed content: $got vs $want")
    }
  }

  test("csv round-trips identical content under gzip") {
    import org.apache.spark.sql.types._
    val orders = Tables(spark, sfDir, "orders")
    val want = fingerprint(orders)
    val path = s"${Tables.scratchDir}/codec_csv_gzip"
    // orderdate is TIMESTAMP_NTZ — the CSV codec paths use the NTZ
    // format option, and the read-back schema must be NTZ too or every
    // timestamp silently parses to NULL
    orders.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType), StructField("o_orderpriority", StringType)))
    val got = fingerprint(spark.read
      .option("header", "true").option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(schema).csv(path))
    assert(got == want, "gzip CSV round-trip must be lossless (shortest-round-trip doubles)")
  }
}
