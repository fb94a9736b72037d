package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver corpus (`TESTDATA.md`).
  *
  * All engine queries read via this single entry point so scan options
  * stay uniform. Explicit-schema reads are unnecessary for parquet (the
  * footer IS the schema — deterministic, unlike CSV `inferSchema`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark 4 refuses
    // ([PARQUET_TYPE_ILLEGAL]). The entry-point mains set the legacy conf
    // at session build; this guard covers externally-built sessions
    // without mutating session state on every table load (ADVICE r1).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Scratch dir for sink round-trips (CSV/DDL). Kept under target/ so it
    * is git-ignored and never collides with the read-only corpus. */
  val scratchDir = "/root/repo/target/scratch"
}
