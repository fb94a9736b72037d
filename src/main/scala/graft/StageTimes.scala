package graft

/** Wall-clock accumulator for trunk/pin build stages (guide §1
  * "measure first"): every scratch-pin write and every explicitly
  * wrapped trunk stage records its seconds under a stable name, so
  * [[StageProbe]] can print a per-stage breakdown of the `_setup_*`
  * bench labels without duplicating any pipeline code. Purely
  * observational — nanoTime around writes that already happen; the
  * map is tiny (one entry per distinct stage name, times accumulate
  * on repeats). */
object StageTimes {
  private val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]

  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    synchronized { times(name) = times.getOrElse(name, 0.0) + sec }
    r
  }

  /** Accumulate an arbitrary value (e.g. a round counter). */
  def bump(name: String, v: Double): Unit =
    synchronized { times(name) = times.getOrElse(name, 0.0) + v }

  def snapshot(): Seq[(String, Double)] = synchronized { times.toSeq }

  def reset(): Unit = synchronized { times.clear() }
}
