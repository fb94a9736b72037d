package graft

import org.apache.spark.sql.functions._
import graft.queries.{ExtensionQueries, MultimodalQueries, SimilarityQueries}

/** Round-7c operators: k-NN graph construction, media dedup clusters,
  * and the Poisson-bootstrap CI — each checked against an independent
  * plain-Scala replay or a structural contract the oracle can't see
  * (the oracle hash-checks the output; these pin WHY it's right). */
class Round7cSpec extends SparkSpec {
  import spark.implicits._

  test("knn graph equals a plain-Scala rerank of the LSH candidate pairs") {
    val emb = Tables(spark, sfDir, "embeddings")
    // reference: collect the candidate relation and the vectors, then
    // replay symmetrize → exact cosine → top-5 (desc cos, asc dst) in
    // plain Scala with no Spark expression in the loop
    val cand = SimilarityQueries.lshCandidatePairs(emb, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na * nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (cand ++ cand.map(p => (p._2, p._1))).toSeq
      .groupBy(_._1).toSeq.flatMap { case (src, es) =>
        es.map { case (_, dst) => (src, dst, cos(vecs(src), vecs(dst))) }
          .sortBy { case (_, dst, c) => (-c, dst) }
          .take(5).zipWithIndex
          .map { case ((s, d, c), i) =>
            (s, d, math.floor(c * 1e6 + 0.5) / 1e6, i + 1) }
      }.toSet
    val got = SimilarityQueries.knnGraphOn(emb, 8, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // every node has consecutive ranks starting at 1 (bounded out-degree)
    val bysrc = got.groupBy(_._1)
    assert(bysrc.forall { case (_, rows) =>
      rows.map(_._4).toSeq.sorted == (1 to rows.size) })
  }

  test("media clusters: every near-dup pair lands in one cluster, canonical is the min member") {
    val pairs = MultimodalQueries.mediaNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty, "fixture should contain media near-dup pairs")
    val clusters = MultimodalQueries.mediaClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val root = clusters.map(c => c._1 -> c._2).toMap
    // exactly the pair-covered ids, no more
    assert(root.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every verified pair share a root
    assert(pairs.forall(p => root(p._1) == root(p._2)))
    // canonical = min member of its component; is_canonical consistent
    val members = root.keys.groupBy(root)
    assert(members.forall { case (r, ms) => ms.min == r })
    assert(clusters.forall(c => c._3 == (c._1 == c._2)))
  }

  test("semantic clusters are the components of the MUTUAL knn edges, and only those") {
    val emb = Tables(spark, sfDir, "embeddings")
    val g = SimilarityQueries.knnGraphOn(emb, 8, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference mutual pairs + plain-Scala union-find over them
    val mut = g.filter { case (a, b) => a < b && g.contains((b, a)) }
    assume(mut.nonEmpty, "fixture should contain mutual knn pairs")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mut.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = mut.flatMap(p => Seq(p._1, p._2))
    val expected = ids.map(i => (i, find(i))).toSet
    val got = SimilarityQueries.semanticClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // a one-directional (hub) edge must never merge clusters on its own:
    // any graph edge between two DIFFERENT clusters must be non-mutual
    val root = got.toMap
    g.foreach { case (a, b) =>
      if (root.contains(a) && root.contains(b) && root(a) != root(b))
        assert(!g.contains((b, a)), s"mutual edge ($a,$b) crosses clusters")
    }
  }

  test("bootstrap CI equals a plain-Scala replay of the Poisson-weight pipeline") {
    val docs = Seq.tabulate(40)(i => (i.toLong, 50L + 13 * i)).toDF("doc_id", "n_chars")
    val out = ExtensionQueries.bootstrapCiOf(docs).collect().head
    // plain-Scala replay: same modmul ring, same inverse-CDF branches
    val b = 200
    def u(key: Long): Double =
      ((((key % 4294967296L) * 40503 % 65536) * 65536
        + (key % 4294967296L) * 31153) % 4294967296L) / 4294967296.0
    def w(uu: Double): Int =
      if (uu < 0.36787944117144233) 0 else if (uu < 0.7357588823428847) 1
      else if (uu < 0.9196986029286058) 2 else if (uu < 0.9810118431238462) 3
      else if (uu < 0.9963401531726563) 4 else 5
    val data = Seq.tabulate(40)(i => (i.toLong, 50L + 13 * i))
    val means = (0 until b).map { bb =>
      val ws = data.map { case (id, x) => (w(u(id * b + bb + 1)), x) }
      (ws.map { case (wt, x) => wt.toLong * x }.sum.toDouble /
        ws.map(_._1.toLong).sum, bb)
    }.sortBy(identity)
    assert(out.getLong(0) == 40)
    assert(out.getDouble(1) == data.map(_._2).sum.toDouble / 40)
    assert(out.getDouble(2) == means(4)._1, "ci_lo = 5th smallest resample mean")
    assert(out.getDouble(3) == means(194)._1, "ci_hi = 195th smallest resample mean")
    assert(out.getDouble(2) <= out.getDouble(1) && out.getDouble(1) <= out.getDouble(3),
      "CI must bracket the point estimate on a well-behaved fixture")
  }
}
