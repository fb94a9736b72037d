package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min Sketch as a typed Spark [[Aggregator]] (the reference's
  * `MinCountSketch` class, `Part_B.py:67-88`, whose w×h table +
  * per-row hash + min-over-rows point query is exactly
  * `org.apache.spark.util.sketch.CountMinSketch`).
  *
  * Wrapping the built-in sketch in an `Aggregator` (rather than
  * `df.stat.countMinSketch`) keeps the build inside a single
  * aggregation plan — partial sketches per partition, `mergeInPlace`
  * at the exchange — so it composes with `groupBy` (a sketch per
  * group) and with streaming aggregation, which the driver-side
  * `stat` helper cannot.
  */
class CmsAggregator(eps: Double, confidence: Double, seed: Int)
    extends Aggregator[String, CountMinSketch, Array[Byte]] {

  override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)

  override def reduce(b: CountMinSketch, a: String): CountMinSketch = {
    if (a != null) b.addString(a)
    b
  }

  override def merge(x: CountMinSketch, y: CountMinSketch): CountMinSketch = {
    x.mergeInPlace(y)
    x
  }

  override def finish(r: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    r.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CmsAggregator {
  // per-JVM memo of deserialized sketches (content-keyed): the point-
  // query UDF runs per ROW, and re-parsing the sketch bytes each call
  // is quadratic-ish waste once groups number in the thousands. A
  // query uses a handful of distinct sketches; the cap is a leak guard
  // for long-lived sessions, not a working-set bound. Access-ordered
  // LRU (not clear-all, ADVICE r2): a burst past the cap evicts one
  // cold entry instead of forcing every live sketch to re-deserialize
  // at once. Guarded by its own lock — contention is irrelevant next
  // to the per-row estimateCount work it saves.
  private val CacheCap = 64
  private val cache =
    new java.util.LinkedHashMap[java.nio.ByteBuffer, CountMinSketch](CacheCap + 1, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.nio.ByteBuffer, CountMinSketch]): Boolean =
        size > CacheCap
    }

  /** Point query against a serialized sketch (deserialized once per
    * distinct byte array per JVM, not once per row). */
  def estimate(bytes: Array[Byte], item: String): Long = {
    val key = java.nio.ByteBuffer.wrap(bytes)
    val sketch = cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        cache.put(key, s)
        s
      }
    }
    sketch.estimateCount(item)
  }
}
