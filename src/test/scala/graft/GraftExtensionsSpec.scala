package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` hook is the OUT-OF-CODEBASE API surface:
  * a user who sets `spark.sql.extensions=graft.functions.GraftExtensions`
  * must get the complete custom-expression surface with no calls into
  * graft code. Built on a FRESH SparkSession (extensions apply at
  * session construction; the shared test session would be silently
  * reused by getOrCreate, testing nothing). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("every custom expression resolves and evaluates through spark.sql.extensions alone") {
    val shared = SparkSpec.session // ensure the context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf, read from the
      // SparkContext at its creation — unavailable to a test that
      // shares the suite-wide context. `withExtensions` feeds the same
      // object through the identical injection path, so this exercises
      // everything except Spark's own class-name loading.
      val s = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      assert(s ne shared, "got the shared session back — extensions never applied")
      def one(sql: String) = s.sql(sql).head().get(0)
      assert(one("SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F))") == 1.0)
      assert(one("SELECT signlsh_bucket(array(1.0F, -1.0F, 0.5F, 2.0F), 0, 4)")
        .isInstanceOf[Int])
      assert(one("SELECT size(shingles('abcdef', 3))") == 4)
      assert(one("SELECT size(minhash_sig('abcdef', 12, 16))") == 16)
      assert(one("SELECT simhash64('abcdef', 12)").isInstanceOf[Long])
      assert(one("SELECT size(shingle_stats('abcdef', 12))") == 3)
      assert(one("SELECT size(media_hist(encode('abcdef', 'UTF-8')))") == 129)
      assert(one("SELECT sqdist_q(array(3L, -5L), array(1L, 2L))") == 53L)
      assert(one(
        "SELECT graft_might_contain(" +
          "(SELECT graft_bloom_agg(xxhash64(s), CAST(100 AS BIGINT), CAST(800 AS BIGINT))" +
          " FROM VALUES ('a'), ('b') AS t(s)), xxhash64('a'))") == true)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
