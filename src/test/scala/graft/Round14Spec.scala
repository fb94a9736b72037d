package graft

import java.util.concurrent.TimeUnit

import graft.queries.SimilarityQueries

/** Round-14 closures: the two-PROCESS pin-lifecycle chaos test
  * (VERDICT r13 #7 — Round13Spec covers two isolated sessions in ONE
  * JVM; the original r12 finding was about two JVMs sharing the
  * scratch root). */
class Round14Spec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("two JVMs share the scratch root: both green, distinct tokens, child reclaims only its own pins") {
    val here = rows(SimilarityQueries.sssp(spark, sfDir))
    val myTok = Tables.sessionToken(spark)
    val myMd5 = md5(here.mkString("|"))
    // fork a REAL second JVM running the same graph query against the
    // same data dir and scratch root (graft.PinProbe). Same JDK17
    // add-opens the build injects for any forked Spark JVM.
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq("java") ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.PinProbe")).toArray
    val outF = java.io.File.createTempFile("pinprobe", ".out")
    val errF = java.io.File.createTempFile("pinprobe", ".err")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.redirectOutput(outF)
    pb.redirectError(errF)
    val proc = pb.start()
    // interleave: OUR session keeps answering on its own pins while
    // the child JVM builds and reads its own trunks
    val during = rows(SimilarityQueries.sssp(spark, sfDir))
    assert(during == here, "own-session answer changed while child JVM ran")
    assert(proc.waitFor(10, TimeUnit.MINUTES), "probe JVM timed out")
    val out = new String(java.nio.file.Files.readAllBytes(outF.toPath), "UTF-8")
    assert(proc.exitValue() == 0,
      s"probe JVM rc=${proc.exitValue()}\n$out\n" +
        new String(java.nio.file.Files.readAllBytes(errF.toPath), "UTF-8").takeRight(2000))
    val childTok = "PINPROBE_TOKEN=([0-9a-f]+)".r
      .findFirstMatchIn(out).map(_.group(1))
    val childMd5 = "PINPROBE_MD5=([0-9a-f]+)".r
      .findFirstMatchIn(out).map(_.group(1))
    assert(childTok.nonEmpty && childMd5.nonEmpty, s"probe output malformed:\n$out")
    assert(childTok.get != myTok, "child JVM minted the SAME session token")
    assert(childMd5.get == myMd5, "child JVM's answer diverges")
    assert(out.contains("PINPROBE_DONE=1"))
    // the child's exit hook reclaimed ITS scratch (token dir + keyed
    // trunks carrying its token) — and left OURS alone
    val pins = new java.io.File(s"${Tables.scratchDir}/pins")
    assert(!new java.io.File(pins, childTok.get).exists(),
      "child token dir survived its shutdown hook")
    val keyed = new java.io.File(s"${Tables.scratchDir}/pins-keyed")
    val leftovers = Option(keyed.list()).getOrElse(Array.empty[String])
      .filter(_.contains(s"-${childTok.get}-"))
    assert(leftovers.isEmpty, s"child keyed pins survived: ${leftovers.toSeq}")
    // our own artifacts still answer bit-identically after the child died
    assert(rows(SimilarityQueries.sssp(spark, sfDir)) == here)
  }
}
