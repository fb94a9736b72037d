package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver corpus (`TESTDATA.md`).
  *
  * All engine queries read via this single entry point so scan options
  * stay uniform. Explicit-schema reads are unnecessary for parquet (the
  * footer IS the schema — deterministic, unlike CSV `inferSchema`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The corpus's events.ts layout has drifted across driver versions:
    // TIMESTAMP(NANOS) (readable only as BIGINT under the legacy
    // nanosAsLong conf) vs TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ).
    // Dispatch on the read schema so either layout normalizes to the same
    // session-tz TimestampType column (session tz is UTC in every entry
    // point, so NTZ→TZ preserves the instant bit-for-bit).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    assertExpectedColumns(name, df)
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType        => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _               => df
      }
    else df
  }

  /** Fail-fast column check (schema from the parquet footer; no data
    * scan). Corpus drift then surfaces as ONE clear load-time error
    * naming the table, instead of dozens of opaque analysis failures
    * deep inside queries (r7: the events-ts layout drift cost 52
    * queries before being traced back to the loader). Extra columns
    * are tolerated — only the columns queries depend on are pinned. */
  private val expectedColumns: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  private def assertExpectedColumns(name: String, df: DataFrame): Unit =
    expectedColumns.get(name).foreach { cols =>
      val have = df.columns.toSet
      val missing = cols.filterNot(have)
      require(missing.isEmpty,
        s"corpus drift: table '$name' is missing expected column(s) ${missing.mkString(", ")} " +
          s"(found: ${df.columns.mkString(", ")}) — update graft.Tables/FIXTURES.md for the new layout")
    }

  /** Scratch dir for sink round-trips (CSV/DDL). Kept under target/ so it
    * is git-ignored and never collides with the read-only corpus. */
  val scratchDir = "/root/repo/target/scratch"

  /** Pin a derived relation to scratch parquet (VERDICT r10 #2): the
    * 100 TB-safe replacement for `localCheckpoint` on CORPUS-LINEAR
    * relations (k·|V| edge sets, node tables). `localCheckpoint` pins
    * blocks on executor storage with no lineage and no replication —
    * one executor loss aborts the job, and the blocks occupy executor
    * memory/disk for the session. A scratch-parquet pin computes the
    * relation exactly once (same as an eager localCheckpoint), gives
    * every re-read a flat columnar scan, and in production the scratch
    * root is the durable cluster filesystem, so executor loss costs a
    * re-read, not the job. Path is unique per call — the pin has the
    * same lifecycle as the localCheckpoint it replaces (one query
    * invocation), files land under the git-ignored scratch root.
    * `localCheckpoint` remains the right tool for the genuinely
    * vocabulary/calendar/shortlist-BOUNDED class. */
  private val pinSeq = new java.util.concurrent.atomic.AtomicLong()
  def scratchPin(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val path = s"$scratchDir/pins/$tag-${java.lang.Long.toHexString(System.nanoTime())}" +
      s"-${pinSeq.incrementAndGet()}.parquet"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Guard predicate for one-time scratch materializations (VERDICT r9
    * #8): true iff this session already wrote the artifacts for `dir`
    * AND every path still exists on disk. The session-conf flag alone
    * trusts the filesystem blindly — an operator wiping the scratch
    * root mid-session (disk pressure, tmp cleaner, manual rm) used to
    * turn every later trunk read into an opaque PATH_NOT_FOUND; with
    * the existence check the guard silently rebuilds instead, which
    * is the failure mode durable scratch exists to absorb (chaos-
    * tested in Round10Spec). Listing a parquet dir's footer is a
    * metadata stat, not a data scan. */
  def scratchReady(spark: SparkSession, flagKey: String, dir: String,
                   paths: Seq[String]): Boolean =
    spark.conf.getOption(flagKey).contains(dir) && paths.forall { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
}
