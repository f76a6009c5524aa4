package graft.ops

/** Per-leg wall attribution for LIFECYCLE queries (r11 VERDICT item 6).
  *
  * The bench's heaviest cells — `t_selfdedup_incremental`,
  * `d_ngram_incremental`, `d_incremental_admit` — book a whole
  * build + upsert + serve lifecycle as one number, so a serve-path
  * regression can hide inside build drift for rounds. The lifecycle
  * functions wrap their EAGER phases in [[time]]; the bench drains the
  * recorded legs after each run and publishes them next to the query's
  * total in `BENCH.json` (the lazy serve tail = total − Σ eager legs,
  * computed by the reader; the functions return lazy frames by
  * contract, so the serve leg cannot be clocked here without forcing a
  * second execution).
  *
  * Thread-local by design: the bench runs queries sequentially on one
  * thread, while Verify's pooled runners each record into their own
  * slot — recording is always correct, draining is per-thread, and a
  * caller that never drains costs two map writes per leg. */
object Legs {

  private val tl = new ThreadLocal[
      scala.collection.mutable.LinkedHashMap[String, Double]] {
    override def initialValue() =
      scala.collection.mutable.LinkedHashMap.empty[String, Double]
  }

  /** Clock `body` into this thread's leg map under `query.leg`. Legs of
    * a repeated query accumulate until [[drain]] — the bench drains
    * after every run. */
  def time[T](query: String, leg: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      val m = tl.get()
      m.update(s"$query.$leg", m.getOrElse(s"$query.$leg", 0.0) + dt)
    }
  }

  /** Record an externally-measured duration under `query.leg` —
    * for legs computed as a difference (the bucketed serve-path
    * overhead is "whole call minus the build leg", which no single
    * `time` block brackets). Accumulates like [[time]]. */
  def add(query: String, leg: String, seconds: Double): Unit = {
    val m = tl.get()
    m.update(s"$query.$leg", m.getOrElse(s"$query.$leg", 0.0) + seconds)
  }

  /** Return and clear this thread's recorded legs. */
  def drain(): Map[String, Double] = {
    val m = tl.get()
    val out = m.toMap
    m.clear()
    out
  }
}
