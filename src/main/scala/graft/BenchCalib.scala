package graft

/** Pinned calibration constants + shuffle-class membership for the bench's
  * cross-session statistics (r15 VERDICT findings 1 and 2).
  *
  * == Why a PINNED class list ==
  * The two-class statistic splits the suite by a plan property
  * (`Bench.shuffleHeavy`: shuffle_write_bytes > input_bytes). The bytes
  * reproduce bit-for-bit across machine states, but a query sitting AT the
  * boundary (the shingle-persisting dedup family reads cached data, which
  * deflates input_bytes) can flip class between sessions — r15 published
  * n_shuffle_class = 118 in both BENCH files but 117 in CALIB_r15's idle
  * run, so the two-class statistic silently compared slightly different
  * populations. The membership is therefore derived ONCE from a pinned
  * idle run at sf0.1 under the driver bench's exact session bootstrap
  * (graft.scale.PinClasses — byte pairs are conf-dependent) and committed as
  * `src/main/resources/graft/bench_classes.tsv` WITH each query's measured
  * byte pair, so a session that disagrees is detectable (Bench publishes
  * `class_flips`) without moving the statistic. BenchCalibSpec guards that
  * every registered query declares a class and no stale rows remain.
  *
  * == Why DAMPENED denominators ==
  * CALIB_r15 measured, under two induced machine states, that the fixed
  * probes do not move 1:1 with their query class:
  *
  *   - scan probe OVER-reacts: probe shift 2.367 vs scan-class shift
  *     1.859 (cpu_spin), 1.804 vs 1.348 (alloc_churn) — the probe is
  *     nearly pure execution while the class carries planning/driver
  *     overhead that contention taxes less;
  *   - shuffle probe UNDER-reacts: 1.766 vs 1.907 (cpu_spin),
  *     1.269 vs 1.411 (alloc_churn).
  *
  * Dividing a class by its probe wall therefore OVERCORRECTS (scan) or
  * undercorrects (shuffle): the r15 builder/driver session pair's 9% raw
  * gap read as ~21% normalized. The fix the r15 verdict asked to measure:
  * dampen the denominator to `probe_shift^lambda`, with lambda fitted on
  * CALIB_r15's two induced states as the equal-|log-residual| solution
  * (pre-registered HERE, before CALIB_r16's fresh sessions validate it):
  *
  *   lambda_scan    = (ln 1.859 + ln 1.348) / (ln 2.367 + ln 1.804)
  *                  = 0.9187 / 1.4516 = 0.633
  *       → in-sample residuals +7.8% (spin) / −7.2% (churn)
  *   lambda_shuffle = (ln 1.907 + ln 1.411) / (ln 1.766 + ln 1.269)
  *                  = 0.9898 / 0.8074 = 1.226
  *       → in-sample residuals −5.0% (spin) / +5.3% (churn)
  *
  * `probe_shift` = session probe wall / the REFERENCE walls below (the
  * r15 DRIVER bench session's published medians), so the dampened
  * statistics read as "class seconds adjusted to the r15-driver machine
  * state". The reference choice cancels in any cross-session ratio;
  * it only anchors the absolute scale. CALIB_r16 re-runs both induced
  * states in fresh sessions and reports the dampened per-class residuals
  * — the claim is ≤10% in both states; if a fresh session misses that
  * band, the artifact says so (the undampened per-class shifts are
  * published alongside either way).
  *
  * == r16 validation OUTCOME (CALIB_r16.json) ==
  * The fit did NOT transfer. Under a fresh cpu_spin the scan probe —
  * which over-reacted 1.27× relative to its class in r15 — slightly
  * UNDER-reacted (probe 1.538× vs class 1.601×), so the raw residual was
  * already +4.1% and dampening overshot it to +21.9% (shuffle: dampening
  * helped, +6.7% vs +15.2% raw); and the identical induced alloc_churn
  * load that shifted r15's session 1.382× shifted the r16 session 1.000×
  * while the probe walls scattered 1.147×/0.857× — probe sampling noise
  * at a no-shift state. Measured conclusion: the probe-vs-class response
  * ratio is itself session state, so no fixed exponent holds per-class
  * residuals inside 10%; any probe-normalized cross-session statistic
  * from these sub-second probes carries ~±20%. The dampened fields stay
  * published under these pre-registered constants (changing them
  * per-session would destroy comparability — the whole point of
  * pre-registration), and the README reading rule carries the ±20% band.
  */
object BenchCalib {

  /** Reference probe walls: the r15 driver bench session's medians
    * (BENCH_r15.json: calib_sec 0.362, calib_shuffle_sec 1.117). */
  val RefScanWall = 0.362
  val RefShuffleWall = 1.117

  /** Dampening exponents fitted on CALIB_r15 (derivation in the object
    * scaladoc). Pre-registered before CALIB_r16 validates them. */
  val LambdaScan = 0.633
  val LambdaShuffle = 1.226

  /** One pinned row: class + the byte pair that decided it (published so
    * a session whose measured bytes disagree is detectable — r15 ADVICE). */
  final case class PinnedClass(shuffle: Boolean, shuffleWriteBytes: Long,
                               inputBytes: Long)

  /** The committed membership, keyed by query id. Fails loudly if the
    * resource is missing — a silent empty map would quietly turn the
    * two-class statistic into the one-class one. */
  lazy val pinned: Map[String, PinnedClass] = {
    val in = getClass.getResourceAsStream("/graft/bench_classes.tsv")
    require(in != null, "graft/bench_classes.tsv missing from classpath " +
      "(regenerate with graft.scale.PinClasses)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .map(_.trim).filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l =>
        val f = l.split("\t")
        require(f.length == 4, s"bad bench_classes.tsv row: $l")
        f(0) -> PinnedClass(f(1) == "shuffle", f(2).toLong, f(3).toLong)
      }.toMap
    finally src.close()
  }

  /** Query ids pinned as shuffle-class. */
  lazy val shuffleClass: Set[String] =
    pinned.collect { case (n, p) if p.shuffle => n }.toSet
}
