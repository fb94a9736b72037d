package graft

import org.apache.spark.sql.DataFrame

import graft.queries.SimilarityQueries

/** Round-13 additions: the session-scoped transient pin root (VERDICT
  * r12 "wrong" #1 / ADVICE r12), the shared graph adjacency trunks
  * (VERDICT r12 #1), and the digest-keyed scratch keys (ADVICE r12). */
class Round13Spec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def listTokens(): Set[String] = {
    val d = new java.io.File(s"${Tables.scratchDir}/pins")
    Option(d.list()).map(_.toSet).getOrElse(Set.empty)
  }

  // -------------------------------- cross-session pin isolation (#2)

  test("two isolated sessions interleave graph queries without colliding: distinct token dirs, no cross-wipe, identical answers") {
    val s1 = spark
    val s2 = spark.newSession()
    val before = listTokens()
    val sssp1 = rows(SimilarityQueries.sssp(s1, sfDir))
    val tok1 = (listTokens() -- before).headOption
      .orElse(listTokens().headOption).get
    val pins1 = new java.io.File(s"${Tables.scratchDir}/pins/$tok1")
    val mod1 = pins1.list().map(n =>
      n -> new java.io.File(pins1, n).lastModified()).toMap
    assert(mod1.nonEmpty)
    // the second session runs the SAME query (same transient tags):
    // under the r12 layout (pins/<tag>) this overwrote session 1's
    // live round state; now it lands in its own token dir
    val sssp2 = rows(SimilarityQueries.sssp(s2, sfDir))
    assert(sssp2 == sssp1)
    val toks = listTokens()
    assert(toks.size >= 2, s"expected two session token dirs, found $toks")
    val mod1After = pins1.list().map(n =>
      n -> new java.io.File(pins1, n).lastModified()).toMap
    assert(mod1After == mod1,
      "session 2's run touched session 1's transient pins")
    // and session 1 keeps answering on its own artifacts
    assert(rows(SimilarityQueries.sssp(s1, sfDir)) == sssp1)
  }

  test("startup sweep reaps only dead-session leftovers, never fresh entries") {
    val root = new java.io.File(s"${Tables.scratchDir}/pins")
    root.mkdirs()
    val stale = new java.io.File(root, "deadbeef0000")
    val fresh = new java.io.File(root, "cafe00001111")
    stale.mkdirs(); fresh.mkdirs()
    assert(stale.setLastModified(System.currentTimeMillis() - 13L * 3600 * 1000))
    Tables.sweepStaleScratch(spark)
    assert(!stale.exists(), "13h-old token dir survived the sweep")
    assert(fresh.exists(), "fresh token dir was reaped (live-sibling hazard)")
    fresh.delete()
  }

  test("sessionKey separates dirs whose String.hashCode collides (ADVICE r12: digest keys)") {
    // "Aa" and "BB" have identical 32-bit String.hashCode — under the
    // r12 hashCode keys these aliased readiness flags and pin paths
    assert("Aa".hashCode == "BB".hashCode)
    val kA = Tables.sessionKey(spark, "Aa")
    val kB = Tables.sessionKey(spark, "BB")
    assert(kA != kB, s"sessionKey aliased hashCode-colliding dirs: $kA")
  }

  // -------------------------------- full-string feature hash (#5)

  test("feature hash separates same-length same-first-char tokens (VERDICT r12 #5)") {
    val s = spark
    import s.implicits._
    // under the r12 (length·31 + first-codepoint) hash these four
    // pairs collided by construction; the full-string fold must not
    val pairs = Seq(("cat", "car"), ("hello", "hells"), ("aa", "ab"),
      ("data", "date"))
    val slots = pairs.flatMap(p => Seq(p._1, p._2)).toDF("t")
      .selectExpr(graft.queries.TextQueries.tokSlotExprOf("t", 64) + " AS slot")
      .collect().map(_.getInt(0))
    pairs.indices.foreach { i =>
      assert(slots(2 * i) != slots(2 * i + 1),
        s"${pairs(i)} still collide at slot ${slots(2 * i)}")
    }
    // and the Spark fold equals the kernel's per-token weight path:
    // single-token docs' logits must rank identically to slot weights
    val docs = pairs.flatMap(p => Seq(p._1, p._2)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernelLogits = graft.queries.TextQueries.qualityClassifierOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val foldW = docs.selectExpr("doc_id",
        s"(${graft.queries.TextQueries.tokSlotExprOf("text", 64)} + 1L) * 2654435761L % 4294967296L % 17 - 8 AS w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernelLogits == foldW, "kernel and portable fold diverge")
  }

  // -------------------------------- shared adjacency trunks (#1)

  test("graph census family shares one keyed und/sym adjacency trunk and no query rewrites it") {
    val t1 = rows(SimilarityQueries.triangleCount(spark, sfDir))
    val keyedRoot = new java.io.File(s"${Tables.scratchDir}/pins-keyed")
    val trunks = keyedRoot.list().filter(n =>
      n.startsWith("undadj-") || n.startsWith("symadj-"))
    assert(trunks.nonEmpty, s"expected keyed undadj trunk, found ${keyedRoot.list().mkString(",")}")
    SimilarityQueries.sssp(spark, sfDir).count() // forces symadj too
    val all = keyedRoot.list().filter(n =>
      n.startsWith("undadj-") || n.startsWith("symadj-"))
    assert(all.length >= 2, s"expected undadj+symadj, found ${all.mkString(",")}")
    val mod1 = all.map(n =>
      n -> new java.io.File(keyedRoot, n).lastModified()).toMap
    // five more family members must READ the trunks, not rebuild them
    SimilarityQueries.clusteringCoeff(spark, sfDir).count()
    SimilarityQueries.assortativity(spark, sfDir).count()
    SimilarityQueries.kcore(spark, sfDir).count()
    SimilarityQueries.spectralRadius(spark, sfDir).count()
    SimilarityQueries.richClub(spark, sfDir).count()
    val mod2 = all.map(n =>
      n -> new java.io.File(keyedRoot, n).lastModified()).toMap
    all.foreach { t =>
      assert(mod2(t) == mod1(t), s"keyed trunk $t was rewritten by a family member")
    }
    // and the trunk path agrees with the per-edge-list derivation
    val edges = SimilarityQueries.knnGraph(spark, sfDir).select("src", "dst", "cos")
    assert(t1 == rows(SimilarityQueries.triangleCountOnEdges(edges)))
  }
}
