package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SimilarityQueries, TextQueries}

/** Near-dup + ANN correctness against exact baselines — the check the
  * DuckDB oracle can't do for engine-hash-based queries. */
class DedupSimilaritySpec extends SparkSpec {

  test("minhash LSH recalls the exact high-Jaccard pairs") {
    // exact char-shingle Jaccard >= 0.8 pairs (ground truth, doc_id<300)
    val exact = TextQueries.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.minhashLsh(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recalled = exact.intersect(cand)
    assert(recalled.size.toDouble / exact.size >= 0.99,
      s"LSH missed ${exact -- cand} of $exact")
  }

  test("simhash places near-identical docs within small Hamming distance") {
    val nearDups = TextQueries.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty, "fixture should contain j>=0.9 pairs")
    val pairs = DedupQueries.simhashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nearDups.foreach { p =>
      assert(pairs.contains(p), s"simhash missed near-identical pair $p")
    }
  }

  test("ANN LSH results are true cosine values and recall brute-force hits in-bucket") {
    val brute = SimilarityQueries.cosineTopk(spark, sfDir)
      .select("qid", "cid", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ann = SimilarityQueries.annLsh(spark, sfDir)
      .select("qid", "cid", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ann.nonEmpty)
    // any pair ANN returns that brute force also ranked must agree on cosine
    ann.foreach { case (k, c) =>
      brute.get(k).foreach(b => assert(math.abs(b - c) < 1e-9, s"cos mismatch at $k"))
    }
    // LSH recall floor: 4 planes + hamming-1 multiprobe over weakly-similar
    // vectors (top cos ≈ 0.35 → P(plane agrees) ≈ 0.62) gives ~50%
    // theoretical recall; assert a conservative floor
    val hits = brute.keySet.count(k => ann.exists(_._1 == k))
    assert(hits >= (brute.size * 0.3).toInt, s"ANN recall too low: $hits/${brute.size}")
  }

  test("IVF ANN recalls most brute-force neighbors probing 2 of 8 cells") {
    val brute = SimilarityQueries.cosineTopk(spark, sfDir)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.annIvf(spark, sfDir)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("exact dedup accounting is consistent") {
    val r = TextQueries.dedupExact(spark, sfDir).head()
    assert(r.getAs[Long]("n_docs") ===
      r.getAs[Long]("n_distinct") + r.getAs[Long]("n_dups"))
  }
}
