package graft.sketch

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012) as a
  * typed Spark [[Aggregator]] — the fourth sketch beside
  * [[HllAggregator]] (distinct counts), [[CmsAggregator]] (point
  * frequencies) and [[KmvAggregator]] (set algebra), adding the
  * capability none of them has: the DETERMINISTIC-superset heavy-hitter
  * guarantee. With k counters, every item with true frequency > n/k is
  * present in the summary, and each kept count underestimates truth by
  * at most (n − nKept)/k — so the summary is a guaranteed candidate
  * superset for exact-threshold frequent-item mining with O(k) memory
  * per group, independent of cardinality. CMS cannot provide this: its
  * one-sided error is an OVERestimate, so thresholding CMS estimates
  * admits false positives that only a second full-cardinality pass can
  * kill; MG bounds the second pass to ≤ k−1 keys.
  *
  * Buffer is an immutable Map (≤ k−1 entries — encodable, and the
  * decrement-all step that makes the map churn is amortized O(1) per
  * item: each decrement of k counters is paid for by k prior
  * increments). Merge sums the two maps, then applies the mergeable-
  * summaries offset: subtract the k-th largest combined count and drop
  * non-positive entries — the result obeys the same error bound as a
  * single-pass summary of the concatenated streams, which is what
  * makes the sketch safe under Spark's partial aggregation (any
  * partitioning, any merge tree, same guarantee).
  */
class MgAggregator(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "MG needs at least 2 counters")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)                   => b.updated(x, c + 1)
      case None if b.size < k - 1    => b.updated(x, 1L)
      case None =>
        // full and absent: decrement every counter, drop zeros (the
        // arriving item's own +1 cancels against its −1 — net: skip it)
        b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val sum = y.foldLeft(x) { case (m, (key, c)) => m.updated(key, m.getOrElse(key, 0L) + c) }
    if (sum.size < k) sum
    else {
      // k-th largest count of the summed summary; subtracting it from
      // every counter restores |summary| ≤ k−1 within the MG bound
      val kth = sum.valuesIterator.toArray.sortBy(-_).apply(k - 1)
      sum.flatMap { case (key, c) => if (c > kth) Some(key -> (c - kth)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}
