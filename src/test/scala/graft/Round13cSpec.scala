package graft

import graft.queries.{SimilarityQueries, TextQueries}

/** Round-13 wave C additions: pairwise token-F1 eval, SemDeDup
  * cluster-bounded pruning, double-sweep graph diameter. */
class Round13cSpec extends SparkSpec {

  // -------------------------------- token F1

  test("tokenF1: multiset overlap, precision/recall/F1 are exact on a hand fixture; pairs never straddle sources") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a a b", "en", "s1", 5L),
      (1L, "a b b", "en", "s1", 5L),
      (2L, "x y", "en", "s1", 3L),
      (3L, "a a b", "en", "s2", 5L)) // lone doc in s2 → no pair
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.tokenF1Of(docs).collect()
    assert(out.length == 2) // (0,1) and (1,2); doc 3 has no successor
    val top = out.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[Long]("doc_a") == 0L && top.getAs[Long]("doc_b") == 1L)
    // overlap = min(2,1)[a] + min(1,2)[b] = 2 of len 3 each
    assert(top.getAs[Long]("overlap") == 2L)
    assert(top.getAs[Long]("prec_ppm") == 666666L)
    assert(top.getAs[Long]("rec_ppm") == 666666L)
    assert(top.getAs[Long]("f1_ppm") == 666666L)
    val second = out.find(_.getAs[Int]("rank") == 2).get
    assert(second.getAs[Long]("doc_a") == 1L && second.getAs[Long]("overlap") == 0L)
    assert(second.getAs[Long]("f1_ppm") == 0L)
  }

  test("tokenF1: F1 is the exact harmonic combination on asymmetric lengths") {
    val s = spark
    import s.implicits._
    // overlap 2, len_a 2, len_b 6: prec 1.0, rec 1/3, F1 = 4/8 = 0.5
    val docs = Seq(
      (0L, "a b", "en", "s1", 3L),
      (1L, "a b c c c c", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextQueries.tokenF1Of(docs).collect().head
    assert(r.getAs[Long]("prec_ppm") == 1000000L)
    assert(r.getAs[Long]("rec_ppm") == 333333L)
    assert(r.getAs[Long]("f1_ppm") == 500000L)
  }

  // -------------------------------- SemDeDup pruning

  private def embDf(vecs: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  private def axis(i: Int, scale: Float, dim: Int = 4): Seq[Float] =
    (0 until dim).map(j => if (j == i) scale else 0.0f)

  test("semdedupPrune: a no-near-dup corpus (±axis vectors) drops nothing") {
    val vecs = (0 until 4).map(i => (i.toLong, axis(i, 1.0f))) ++
      (0 until 4).map(i => (4L + i, axis(i, -1.0f)))
    val rows = SimilarityQueries.semdedupPruneOf(embDf(vecs)).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == 8L)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == 0L)
    assert(rows.map(_.getAs[Long]("n_dropped")).sum == 0L)
    assert(rows.forall(_.getAs[Long]("drop_ppm") == 0L))
  }

  test("semdedupPrune: scaled duplicates collapse to one survivor per direction (higher-id members dropped on centroid-cos ties)") {
    val vecs = ((0 until 4).map(i => (i.toLong, axis(i, 1.0f))) ++
      (0 until 4).map(i => (4L + i, axis(i, -1.0f)))) ++ Seq(
      (8L, axis(0, 2.0f)), (9L, axis(0, 3.0f)), (10L, axis(0, 4.0f)),
      (11L, axis(1, 2.0f)))
    val rows = SimilarityQueries.semdedupPruneOf(embDf(vecs)).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == 12L)
    // e0-direction cell: pairs (0,8)(0,9)(0,10)(8,9)(8,10)(9,10);
    // e1-direction cell: pair (1,11)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == 7L)
    // all centroid-cosines tie at 1.0 within a direction → the
    // higher id of each pair is dropped → survivors are 0 and 1
    assert(rows.map(_.getAs[Long]("n_dropped")).sum == 4L)
    rows.foreach { r =>
      assert(r.getAs[Long]("drop_ppm") ==
        r.getAs[Long]("n_dropped") * 1000000L / r.getAs[Long]("n_members"))
    }
  }

  test("semdedupPrune: corpus invariants — members partition the corpus, drops bounded, deterministic across runs") {
    val emb = Tables(spark, sfDir, "embeddings")
    val r1 = SimilarityQueries.semdedupPrune(spark, sfDir).collect()
    assert(r1.map(_.getAs[Long]("n_members")).sum == emb.count())
    r1.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_pairs"))
    }
    val r2 = SimilarityQueries.semdedupPrune(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  // -------------------------------- graph diameter

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  test("graphDiameter: a 5-chain reports ecc 4 from both endpoints") {
    val r = SimilarityQueries.graphDiameterOnEdges(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))).collect().head
    assert(r.getAs[Long]("seed") == 1L)
    assert(r.getAs[Long]("ecc_seed") == 4L)
    assert(r.getAs[Long]("far_node") == 5L)
    assert(r.getAs[Long]("diam_lb") == 4L)
    assert(r.getAs[Long]("n_reached_seed") == 5L)
    assert(r.getAs[Long]("n_reached_far") == 5L)
  }

  test("graphDiameter: star pivot tie-breaks to the smallest far node and finds diameter 2") {
    val r = SimilarityQueries.graphDiameterOnEdges(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).collect().head
    assert(r.getAs[Long]("seed") == 1L)
    assert(r.getAs[Long]("ecc_seed") == 1L)
    assert(r.getAs[Long]("far_node") == 2L) // all leaves at dist 1 → min id
    assert(r.getAs[Long]("diam_lb") == 2L)
  }

  test("graphDiameter: the fixed 6-round horizon caps the first sweep but the second still reaches everything within range") {
    // 9-chain: sweep 1 from node 1 reaches only nodes ≤ 7 (dist 6);
    // pivot = 7; sweep 2 from 7 reaches all 9 (max dist 6 back at node 1)
    val r = SimilarityQueries.graphDiameterOnEdges(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
        (7L, 8L), (8L, 9L))).collect().head
    assert(r.getAs[Long]("ecc_seed") == 6L)
    assert(r.getAs[Long]("far_node") == 7L)
    assert(r.getAs[Long]("diam_lb") == 6L)
    assert(r.getAs[Long]("n_reached_seed") == 7L)
    assert(r.getAs[Long]("n_reached_far") == 9L)
  }

  test("graphDiameter: corpus run returns one consistent row (diam_lb ≥ ecc within horizon, reach counts positive)") {
    val r = SimilarityQueries.graphDiameter(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_reached_seed") > 0L)
    assert(row.getAs[Long]("n_reached_far") > 0L)
    assert(row.getAs[Long]("diam_lb") >= row.getAs[Long]("ecc_seed")
      || row.getAs[Long]("ecc_seed") == 6L) // horizon-capped first sweep
    assert(row.getAs[Long]("diam_lb") <= 6L)
  }
}
