package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver corpus (`TESTDATA.md`).
  *
  * All engine queries read via this single entry point so scan options
  * stay uniform. Explicit-schema reads are unnecessary for parquet (the
  * footer IS the schema — deterministic, unlike CSV `inferSchema`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scratch dir for sink round-trips (CSV/DDL). Kept under target/ so it
    * is git-ignored and never collides with the read-only corpus. */
  val scratchDir = "/root/repo/target/scratch"
}
