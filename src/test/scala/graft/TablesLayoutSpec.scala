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
