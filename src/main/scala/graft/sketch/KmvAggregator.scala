package graft.sketch

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (bottom-k) distinct sketch (Bar-Yossef et al.
  * 2002; the theta-sketch family) as a typed Spark [[Aggregator]] —
  * the third sketch beside [[HllAggregator]] (distinct counts) and
  * [[CmsAggregator]] (frequencies), adding the capability neither
  * register sketch has: SET OPERATIONS across groups. Because the
  * sketch IS a uniform sample of the hashed key space (the k smallest
  * hash values), two groups' sketches compose — k-th smallest of the
  * merged mins bounds a threshold θ below which both samples are
  * complete, so union/intersection/Jaccard estimates fall out of set
  * algebra on the min-arrays (composed downstream in-plan; see
  * `StreamQueries.kmvIntersect`).
  *
  * Input is a PRE-HASHED long (the engine-neutral Knuth multiplicative
  * hash computed in-plan, so the DuckDB oracle replays the identical
  * sketch bit for bit). The buffer is the sorted distinct array of the
  * k smallest hashes — mergeable by sorted min-merge, so partial
  * aggregation ships k longs per group per partition at any scale,
  * never the distinct values themselves.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    if (b.length == k && h >= b(k - 1)) b
    else {
      val i = java.util.Arrays.binarySearch(b, h)
      if (i >= 0) b // already present
      else {
        val at = -i - 1
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, at)
        out(at) = h
        System.arraycopy(b, at, out, at + 1, n - at - 1)
        out
      }
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    // sorted distinct min-merge, capped at k
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
