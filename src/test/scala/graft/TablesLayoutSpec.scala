package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression fixture for the events-ts layout drift (VERDICT r7 #1/#2).
  *
  * The driver corpus has shipped `events.ts` as parquet TIMESTAMP(NANOS)
  * (reads as BIGINT under `nanosAsLong`) in some rounds and
  * TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ) in others. `Tables` must
  * normalize BOTH layouts to the same session-tz TimestampType values so
  * one corpus drift can never again take down every events query.
  */
class TablesLayoutSpec extends SparkSpec {

  private val microsEpochs = Seq(
    1700000000000000L, // 2023-11-14 22:13:20 UTC
    1700000123456789L,
    0L,                // epoch itself
    1234567890123456L)

  private def writeFixture(layout: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$layout").toString
    val base = microsEpochs.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, s"e$i", i.toDouble, "{}")
    }
    import spark.implicits._
    val df = base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = layout match {
      // nanos-as-long: what a TIMESTAMP(NANOS) file looks like to Spark
      // under the legacy conf — a raw BIGINT of epoch-nanoseconds.
      case "nanos_long" => df.withColumn("ts", col("us") * lit(1000L))
      // micros-typed: the current corpus layout, TIMESTAMP_NTZ.
      case "micros_ntz" =>
        df.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables normalizes nanos-as-long and micros-NTZ events layouts identically") {
    val nanosDir = writeFixture("nanos_long")
    val microsDir = writeFixture("micros_ntz")

    val fromNanos = Tables(spark, nanosDir, "events")
    val fromMicros = Tables(spark, microsDir, "events")

    assert(fromNanos.schema("ts").dataType === TimestampType)
    assert(fromMicros.schema("ts").dataType === TimestampType)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().toSeq

    val a = rows(fromNanos)
    val b = rows(fromMicros)
    assert(a === b)
    assert(a.map(_.getLong(1)) === microsEpochs)
  }

  /** The r7 drift was diagnosed from a BIGINT read under `nanosAsLong` —
    * but the underlying file carried a genuine parquet
    * `TIMESTAMP(NANOS)` logical-type annotation, which Spark's own
    * writer cannot emit. Write one with the low-level parquet-hadoop
    * API so the fixture matrix covers the REAL third layout, not just
    * its post-conf appearance as a long column.
    */
  private def writeTrueNanosFixture(): String = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.MessageTypeParser

    val dir = Files.createTempDirectory("graft-events-true-nanos").toString
    // isAdjustedToUTC=false ⇒ the same NTZ semantics the micros corpus
    // uses; unit=NANOS is the annotation Spark can read but not write.
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val conf = new Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-0.parquet"))
      .withConf(conf).withType(schema).build()
    val fac = new SimpleGroupFactory(schema)
    try microsEpochs.zipWithIndex.foreach { case (us, i) =>
      val g = fac.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L) // epoch-nanoseconds
      g.add("user_id", i.toLong % 2)
      g.add("event_type", Binary.fromString(s"e$i"))
      g.add("value", i.toDouble)
      g.add("props", Binary.fromString("{}"))
      writer.write(g)
    } finally writer.close()
    dir
  }

  test("Tables normalizes a genuine TIMESTAMP(NANOS)-annotated parquet file") {
    val dir = writeTrueNanosFixture()
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    assert(got === microsEpochs)
  }

  test("Tables passes through an already-TimestampType events column") {
    val dir = Files.createTempDirectory("graft-events-tz").toString
    import spark.implicits._
    microsEpochs.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, s"e$i", i.toDouble, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq === microsEpochs)
  }
}
