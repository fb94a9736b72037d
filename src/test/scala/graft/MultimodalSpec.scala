package graft

import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

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

  test("media_hist kernel: interpreted eval, codegen path and a plain-Scala reference agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    def reference(b: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](129)
      for (p <- 0 until (b.length - 3)) {
        var h = 0L
        for (q <- 0 until 4) h = (h * 31 + (b(p + q) & 0xff)) & 0x7fffffffL
        hist((h % 129).toInt) += 1
      }
      hist
    }
    val payloads = Seq(Array.empty[Byte], "abc".getBytes, "abcd".getBytes,
      "the quick brown fox jumps over the lazy dog".getBytes,
      Array.tabulate(500)(i => ((i * 131) % 256).toByte)) // full byte range, not just ASCII
    payloads.foreach { b =>
      val viaEval = graft.functions.MediaHist(Literal(b, BinaryType)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData].toLongArray()
      assert(viaEval.sameElements(reference(b)), s"kernel != reference on ${b.length} bytes")
    }
    // codegen path (projection over a real frame) equals the same kernel
    graft.functions.MediaHist.register(spark)
    val viaDf = MultimodalQueries.mediaTable(spark, sfDir).toDF()
      .selectExpr("media_id", "media_hist(payload) AS h").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val viaKernel = MultimodalQueries.mediaTable(spark, sfDir).collect()
      .map(r => r.media_id -> reference(r.payload)).toMap
    assert(viaDf.keySet == viaKernel.keySet)
    viaDf.foreach { case (id, h) => assert(h.sameElements(viaKernel(id)), s"codegen mismatch at $id") }
  }

  test("media near-dup finds planted perturbed copies across indels and rejects unrelated payloads") {
    // a 400-byte base payload; planted variants exercise the three
    // perturbation classes a perceptual signature must survive:
    // byte substitution, INSERTION and DELETION (the positional-dHash
    // killers — segment grids misalign, content windows do not);
    // plus two exact copies (intra-group, Hamming 0 by construction)
    // and 200 unrelated payloads that must produce no pair.
    val s = spark
    import s.implicits._
    val base = ("a quiet fox walked across the frozen river while the lamplight flickered " +
      "over the old stone bridge and the last ferry of the evening pushed slowly " +
      "through the dark water toward the distant and silent shore of the bay " +
      "where the fishermen had already hauled their nets up for the night and gone " +
      "home to their warm kitchens and sleeping children").take(400)
    val substituted = base.updated(100, 'X').updated(250, 'Q')
    val inserted = base.substring(0, 150) + "INSERTED FRAGMENT " + base.substring(150)
    val deleted = base.substring(0, 200) + base.substring(230)
    val planted = Seq(
      0L -> base, 1L -> substituted, 2L -> inserted, 3L -> deleted,
      4L -> base, 5L -> base) // 4,5: exact copies of 0
    // genuinely distinct noise (md5-derived, like the dedup fixtures);
    // "unrelated content $i" templates would be REAL near-dups — the
    // signature is supposed to pair those
    val noise = (100L until 300L).map(i =>
      i -> (1 to 12).map(k => s"$i-$k".hashCode.toHexString).mkString(" "))
    val media = (planted ++ noise).toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("payload"))
    val pairs = MultimodalQueries.mediaNeardupOn(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val family = Set(0L, 1L, 2L, 3L, 4L, 5L)
    // every variant pairs with the base AND its exact copies (copies
    // share the base's histogram, so variant↔copy must match
    // variant↔base); variant↔variant pairs are two edits apart —
    // additive distance — and are NOT required to clear the radius
    for (v <- Seq(1L, 2L, 3L); b <- Seq(0L, 4L, 5L))
      assert(pairs.contains((math.min(v, b), math.max(v, b))),
        s"missing planted pair ($v,$b); got ${pairs.keySet}")
    // exact copies at Hamming 0, and nothing outside the family
    assert(pairs((0L, 4L)) == 0 && pairs((0L, 5L)) == 0 && pairs((4L, 5L)) == 0)
    assert(pairs.keySet.forall { case (a, b) => family(a) && family(b) },
      s"false positives: ${pairs.keySet.filterNot { case (a, b) => family(a) && family(b) }}")
  }

  test("media near-dup covers the text near-dup ground truth at the test and oracle SFs") {
    // ties the perceptual contract to the corpus's text ground truth
    // where the measured margins hold (true pairs: Hamming ≤ 6,
    // L1 ≤ 0.15 vs cuts 10 / 0.2). The contracts are deliberately not
    // identical — at sf0.1 one short-doc text pair sits at L1 0.29
    // (an edit is a large fraction of a short payload's histogram)
    // and is correctly outside the media contract on BOTH engines.
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val brute = graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, greatest(length(text) - 11, 1)), i -> substring(text, i, 12)))")).as("s"))
        .localCheckpoint()
      val sizes = brute.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val truePairs = brute.select(col("doc_id").as("d1"), col("s"))
        .join(brute.select(col("doc_id").as("d2"), col("s")), Seq("s"))
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .filter(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")) >= 0.5)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val media = MultimodalQueries.mediaNeardup(spark, dir)
        .select("m1", "m2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truePairs.nonEmpty)
      assert(truePairs.subsetOf(media), s"$dir missing ${truePairs -- media}")
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
