package graft

import org.apache.spark.sql.functions._
import graft.queries.RecommenderQueries

/** VERDICT r8 stretch #7 — the DIMSUM scale twin of q_user_similarity.
  *
  * `RowMatrix.columnSimilarities(threshold)` is the documented 100-TB
  * path for all-pairs similarity; this spec pins its contract on the
  * fixture corpus:
  *   1. threshold=0 (brute-force-exact) equals a plain-Scala Pearson
  *      replay over the same centered dense matrix, and
  *   2. the sampled run's pair set is a SUPERSET of the exact pairs at
  *      or above the threshold (DIMSUM's preservation guarantee), with
  *      values matching the exact run on those pairs.
  */
class DimsumSpec extends SparkSpec {

  private val Threshold = 0.3

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("DIMSUM exact run matches a plain-Scala Pearson replay") {
    val exact = pairsOf(RecommenderQueries.userSimilarityDimsum(spark, sfDir, 0.0))

    // independent replay: rebuild the zero-filled centered matrix from
    // the same ratings definition and compute cosine in plain Scala
    val rt = Tables(spark, sfDir, "events")
      .groupBy("user_id", "event_type")
      .agg(graft.functions.Det.moneyAvg(col("value"), 6).as("r"))
    val top = Tables(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("user_id")).limit(20).select("user_id")
    val cells = rt.join(broadcast(top), "user_id")
      .select(col("user_id"), col("event_type"), col("r").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val users = cells.keys.map(_._1).toSeq.distinct.sorted
    val items = RecommenderQueries.EventTypes
    val colVec: Map[Long, Array[Double]] = users.map { u =>
      val raw = items.map(i => cells.getOrElse((u, i), 0.0)).toArray
      val mu = raw.sum / raw.length
      u -> raw.map(_ - mu)
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val replay = (for {
      u1 <- users; u2 <- users if u1 < u2
      c = cos(colVec(u1), colVec(u2)) if c != 0.0
    } yield (u1, u2) -> c).toMap

    assert(exact.keySet === replay.keySet)
    exact.foreach { case (k, v) => assert(math.abs(v - replay(k)) < 1e-9, s"pair $k") }
  }

  test("sampled DIMSUM preserves every exact pair at/above the threshold") {
    val exact = pairsOf(RecommenderQueries.userSimilarityDimsum(spark, sfDir, 0.0))
    val sampled = pairsOf(RecommenderQueries.userSimilarityDimsum(spark, sfDir, Threshold))

    val mustKeep = exact.filter(_._2 >= Threshold).keySet
    assert(mustKeep.nonEmpty, "fixture should produce at least one above-threshold pair")
    val missing = mustKeep -- sampled.keySet
    assert(missing.isEmpty, s"DIMSUM dropped above-threshold pairs: $missing")
    // at fixture scale γ/(‖cᵢ‖‖cⱼ‖) clamps to 1 ⇒ sampled values are exact
    mustKeep.foreach { k =>
      assert(math.abs(sampled(k) - exact(k)) < 1e-6, s"pair $k: ${sampled(k)} vs ${exact(k)}")
    }
  }
}
