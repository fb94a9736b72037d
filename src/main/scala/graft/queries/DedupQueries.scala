package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection at scale: MinHash + LSH banding and
  * SimHash — the sub-quadratic dedup paths for a 100 TB corpus, where
  * the exact shingle-Jaccard join ([[TextQueries.ngramJaccard]]) is
  * only affordable AFTER candidate generation.
  *
  * Both rely on Spark's engine-side hash functions (`xxhash64` —
  * codegen'd Catalyst expressions, no UDFs), which DuckDB cannot
  * replicate, so these queries are rows-only for the driver; their
  * correctness (candidate recall vs exact Jaccard, Hamming locality)
  * is asserted in ScalaTest instead.
  */
object DedupQueries {

  private val ShingleLen = 12
  private val NumHashes  = 16
  private val BandSize   = 4 // → 4 bands; P(candidate | j=0.5) ≈ 0.22 per band

  /** Distinct shingle array per doc, built INSIDE the row — no explode,
    * no shuffle; signature derivation stays embarrassingly parallel. */
  private val shingleArr =
    s"array_distinct(transform(sequence(1, greatest(length(text) - ${ShingleLen - 1}, 1))," +
      s" i -> substring(text, i, $ShingleLen)))"

  /** MinHash signatures: NumHashes independent permutations emulated by
    * seed-prefixed xxhash64 over the exploded shingle stream, reduced
    * by one partial+final hash aggregation per doc. Measured on this
    * corpus: the codegen'd explode→agg pipeline beats the
    * "shuffle-free" higher-order-function formulation ~2.5× — Catalyst
    * HOF lambdas are interpreted per element, while explode + hash-agg
    * stays inside whole-stage codegen; the narrow (doc_id, shingle)
    * shuffle is the cheaper currency at any scale. */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    // two-hash universal family (Broder): h_i = h1 + i·h2 gives the
    // NumHashes independent permutations from 2 string hashes per
    // shingle instead of 16 — the rest is long arithmetic. Masked to
    // 62/32 bits so the combination cannot overflow (Spark 4 runs ANSI
    // mode: long overflow THROWS, it doesn't wrap).
    val mins: Seq[Column] = (0 until NumHashes).map { i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"m$i")
    }
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(expr(shingleArr)).as("s"))
      .withColumn("h1", xxhash64(lit(1), col("s")).bitwiseAND(0x3fffffffffffffffL))
      .withColumn("h2", xxhash64(lit(2), col("s")).bitwiseAND(0xffffffffL).bitwiseOR(1L))
      .groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding (SURVEY extension; the
    * shingle→minhash→band→bucket-join pipeline): docs sharing any band
    * of 4 equal minhashes become candidates; candidate pairs are scored
    * by signature agreement (estimated Jaccard) and thresholded.
    * Bucket-join cost is Σ bucket², not n² — the LSH point. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (not cache): materialized once for the 3 reuses
    // below, blocks freed on GC — no unpersist bookkeeping, no cache
    // leak into a long-lived shared session (ADVICE r1)
    val sigs = signatures(spark, dir).localCheckpoint()
    val bandCols = (0 until NumHashes / BandSize).map { b =>
      struct(lit(b).as("band"),
        hash((b * BandSize until (b + 1) * BandSize).map(i => col(s"m$i")): _*).as("bh"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = buckets.alias("a")
      .join(buckets.alias("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val agree = (0 until NumHashes)
      .map(i => when(col(s"s1.m$i") === col(s"s2.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.alias("s1"), col("d1") === col("s1.doc_id"))
      .join(sigs.alias("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("est_jaccard", agree.cast("double") / NumHashes)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("d1"), col("d2"), col("est_jaccard"))
      .orderBy("d1", "d2")
  }

  /** SimHash (64-bit) per document: per-bit majority vote over shingle
    * hashes — 64 codegen'd `sum` aggregates over the exploded shingle
    * stream (one pass, no row blowup beyond the explode), then bit
    * assembly. Same measurement note as [[signatures]]: the explode +
    * hash-agg form beats the row-local HOF fold ~2× because the 64
    * bit-sums stay inside whole-stage codegen. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(expr(shingleArr)).as("s"))
      .withColumn("h", xxhash64(col("s")))
    // pack 4 bit-counters per aggregate (16-bit lanes; shingle counts
    // per doc are « 65536, so lanes cannot carry): 16 sum columns
    // instead of 64, one quarter the aggregation buffer traffic
    val laneSums = (0 until 16).map { g =>
      val lanes = (0 until 4).map { j =>
        val b = g * 4 + j
        shiftleft(shiftright(col("h"), b).bitwiseAND(1), j * 16)
      }
      sum(lanes.reduce(_ + _)).as(s"p$g")
    }
    val n = count(lit(1)).as("n")
    val perDoc = sh.groupBy("doc_id").agg(n, laneSums: _*)
    val sig = (0 until 64).map { b =>
      val cnt = shiftright(col(s"p${b / 4}"), (b % 4) * 16).bitwiseAND(0xffffL)
      when(cnt * 2 > col("n"), lit(1L << b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    perDoc.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs (Hamming ≤ 6) via BANDED self-join: the 64
    * bits split into 7 bands (~9 bits each), so any pair within
    * Hamming 6 shares at least one unchanged band (pigeonhole) and
    * becomes an equi-join candidate — Σ bucket² work instead of the n²
    * cross join, which is what survives a 100× corpus. Candidates are
    * then exact-filtered by `bit_count(xor)`. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val nBands = 7    // maxHamming + 1 bands guarantees a shared band
    val bandBits = 10 // non-overlapping: band b = bits [10b, 10b+10)
    val s = simhash(spark, dir).localCheckpoint()
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND((1L << bandBits) - 1).as("bh"))
    }
    val banded = s.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = banded.alias("a").join(banded.alias("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cand
      .join(s.select(col("doc_id").as("d1"), col("simhash").as("h1")), "d1")
      .join(s.select(col("doc_id").as("d2"), col("simhash").as("h2")), "d2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= 6)
      .select("d1", "d2", "hamming")
      .orderBy("d1", "d2")
  }
}
