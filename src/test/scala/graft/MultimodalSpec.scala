package graft

import graft.queries.MultimodalQueries

/** Multimodal plumbing: schema, batch shape, determinism of the stubbed
  * decode (the Spark-side contract that survives a real codec swap). */
class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with correct byte accounting") {
    val media = MultimodalQueries.mediaTable(spark, sfDir).collect()
    assert(media.nonEmpty)
    media.foreach { r =>
      assert(r.kind == "text/utf-8")
      assert(r.payload.length.toLong == r.n_bytes)
    }
  }

  test("feature extraction is deterministic and fixed-shape") {
    val f1 = MultimodalQueries.extractFeatures(
      MultimodalQueries.mediaTable(spark, sfDir)).collect().sortBy(_.media_id)
    val f2 = MultimodalQueries.extractFeatures(
      MultimodalQueries.mediaTable(spark, sfDir).repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == f2.length)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id)
      assert(a.feature.length == 8 && b.feature.length == 8)
      assert(a.feature.sameElements(b.feature), s"non-deterministic decode at ${a.media_id}")
      assert(a.byte_sum_mod == b.byte_sum_mod)
    }
  }
}
