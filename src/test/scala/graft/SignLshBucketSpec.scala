package graft

import org.apache.spark.sql.functions._
import graft.functions.SignLshBucket

/** The codegen'd sign-LSH bucket expression must be BIT-IDENTICAL to
  * the interpreted HOF formulation (which is what the DuckDB oracle
  * replays) — same weights, same ascending-index double summation. */
class SignLshBucketSpec extends SparkSpec {

  private def hofBucket(scheme: Int, nPlanes: Int): String = {
    val planeW = (p: Int) =>
      if (scheme == 0)
        s"transform(sequence(0, size(embedding) - 1), i -> CASE WHEN (shiftright((CAST($p * 64 + i + 1 AS BIGINT) * 2654435761L) % 4294967296L, ${8 + 5 * p}) & 1) = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
      else
        s"transform(sequence(0, size(embedding) - 1), i -> CASE WHEN (shiftright((CAST(i + 1 AS BIGINT) * ${2654435761L + 4096L * p + 2L * p * p}L) % 4294967296L, 15) & 1) = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
    (0 until nPlanes).map { p =>
      s"(CASE WHEN aggregate(zip_with(embedding, ${planeW(p)}, (x, w) -> CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  for ((scheme, nPlanes) <- Seq((0, 4), (1, 8)))
    test(s"signlsh_bucket scheme $scheme equals the interpreted HOF formula") {
      SignLshBucket.register(spark)
      val mismatches = Tables(spark, sfDir, "embeddings")
        .select(
          col("vec_id"),
          expr(s"signlsh_bucket(embedding, $scheme, $nPlanes)").as("fast"),
          expr(hofBucket(scheme, nPlanes)).as("hof"))
        .filter(col("fast") =!= col("hof"))
        .count()
      assert(mismatches == 0)
    }

  test("plane dot products carry a sign margin far above summation-order noise") {
    // ADVICE r3: the oracle recomputes the plane dots with an unordered
    // SQL sum, so 'bit-identical' bucketing relies on no dot sitting
    // within float-summation reordering error (~1e-13 for 64 dims) of
    // zero. Assert a ≥1e-6 margin on every (vector, plane) dot at the
    // test, oracle and bench SFs — seven orders of headroom.
    def weight(scheme: Int, p: Int, i: Int): Double = {
      val bit =
        if (scheme == 0) ((((p * 64 + i + 1).toLong * 2654435761L) & 0xffffffffL) >> (8 + 5 * p)) & 1L
        else (((i + 1).toLong * (2654435761L + 4096L * p + 2L * p * p) & 0xffffffffL) >> 15) & 1L
      if (bit == 1L) 1.0 else -1.0
    }
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val vecs = Tables(spark, dir, "embeddings")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      for ((scheme, nPlanes) <- Seq((0, 4), (1, 8))) {
        var minAbs = Double.MaxValue
        vecs.foreach { v =>
          var p = 0
          while (p < nPlanes) {
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += v(i).toDouble * weight(scheme, p, i); i += 1 }
            if (math.abs(dot) < minAbs) minAbs = math.abs(dot)
            p += 1
          }
        }
        assert(minAbs > 1e-6, s"$dir scheme $scheme: min |dot| = $minAbs under margin")
      }
    }
  }
}
