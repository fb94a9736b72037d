package graft

import graft.queries.{SimilarityQueries, TextQueries}

/** Round-7 operators, each against a hand-computable fixture (the
  * oracle run covers the corpus; these pin semantics). */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  test("hybrid retrieve: BM25 winner becomes the probe, shortlist reranks by exact cosine") {
    // doc 0 carries the rare term z (df=1, tf=3) → highest BM25 by idf
    // (the Round6Spec bm25 fixture's winning pattern); docs 1-4 share
    // common terms so all five make the shortlist.
    val docs = Seq(
      (0L, "z z z"),
      (1L, "x x y"),
      (2L, "x y"),
      (3L, "y x"),
      (4L, "x y x")).toDF("doc_id", "text")
    // probe (doc 0) = e1; cosines against it are hand-readable
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f), 0),   // cos  1.0 (scale-invariant)
      (2L, Array(0.6f, 0.8f), 0),   // cos  0.6
      (3L, Array(0.0f, 1.0f), 0),   // cos  0.0
      (4L, Array(-1.0f, 0.0f), 0)   // cos -1.0
    ).toDF("vec_id", "embedding", "label")

    val bm25 = TextQueries.bm25Of(docs).collect()
      .map(r => r.getLong(1) -> (r.getInt(0), r.getDouble(3))).toMap
    assert(bm25(0L)._1 == 1, s"fixture: doc 0 must win BM25, got $bm25")

    val out = SimilarityQueries.hybridRetrieveOn(docs, emb).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L),
      "rerank order must follow cosine, probe excluded")
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val cos = out.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(cos(1L) - 1.0) < 1e-6)
    assert(math.abs(cos(2L) - 0.6) < 1e-6)
    assert(math.abs(cos(3L) - 0.0) < 1e-6)
    assert(math.abs(cos(4L) + 1.0) < 1e-6)
    // the lexical score rides along unchanged from the BM25 stage
    out.foreach { r =>
      assert(r.getDouble(2) == bm25(r.getLong(1))._2,
        s"bm25 column must equal the shortlist score for doc ${r.getLong(1)}")
    }
  }

  test("dedup scratch keys are session-scoped: concurrent sessions on one dir write disjoint paths") {
    import graft.queries.DedupQueries
    val s2 = spark.newSession()
    val k1 = DedupQueries.scratchKey(spark, sfDir)
    val k2 = DedupQueries.scratchKey(s2, sfDir)
    assert(k1 != k2,
      "two sessions over the SAME dir must not share a scratch path (VERDICT r6 #5)")
    // stable within a session (the one-time-write guard depends on it)
    assert(k1 == DedupQueries.scratchKey(spark, sfDir))
    assert(k2 == DedupQueries.scratchKey(s2, sfDir))
    // still keyed by dir: different dirs stay disjoint within a session
    assert(k1 != DedupQueries.scratchKey(spark, "/root/testdata/sf0.01"))
  }

  test("profile approx lane: one scan, sketch within rsd bounds of the exact lane") {
    import graft.queries.ExtensionQueries
    val df = ExtensionQueries.profileApprox(spark, sfDir)
    // both lanes must ride ONE scan of orders (the whole point of the
    // tidy one-pass profile — a per-lane rescan is the 100-TB bug)
    val scans = "Scan parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(scans == 1, s"expected exactly one orders scan, saw $scans")
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(2), r.getLong(3))
      assert(exact > 0)
      // HLL++ at rsd 0.02: allow 5 sigma plus integer slack for the
      // small-cardinality columns (exact small counts are often exact)
      val tol = math.max(5, (0.10 * exact).toLong)
      assert(math.abs(approx - exact) <= tol,
        s"${r.getString(0)}: approx $approx vs exact $exact (tol $tol)")
    }
  }
}
