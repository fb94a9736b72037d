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
}
