package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation/ranking analytics over kernel outputs (SURVEY §3.3;
  * reference `analysis/eppa_analysis.ipynb` /
  * `eppa_analysis_all_plays.ipynb`): per-play summaries, player/team
  * rankings, and EPPA-vs-EPA calibration.
  *
  * All plain DataFrame ops — partition discovery over the kernel's
  * output/{game} tree replaces the reference's recursive pickle walk (S6),
  * windows replace nlargest/tail(1) (W4/W5), and the plays join uses the
  * J9 filtered-join shape.
  */
object Rankings {

  /** Per-play summary: frame of max total EPPA + last-frame snapshot
    * (eppa_analysis cells 5,12). */
  def playSummary(passes: DataFrame): DataFrame = {
    val byVal = Window.partitionBy("gameId", "playId")
      .orderBy(col("eppa1Tot").desc, col("frameId"))
    val byFrame = Window.partitionBy("gameId", "playId")
      .orderBy(col("frameId").desc)
    passes
      .withColumn("rn_val", row_number().over(byVal))
      .withColumn("rn_last", row_number().over(byFrame))
      .filter(col("rn_val") === 1 || col("rn_last") === 1)
      .groupBy("gameId", "playId")
      .agg(
        max(when(col("rn_val") === 1, col("eppa1Tot"))).as("best_eppa1_tot"),
        max(when(col("rn_val") === 1, col("frameId"))).as("best_frame"),
        max(when(col("rn_last") === 1, col("eppa1Tot"))).as("last_eppa1_tot"),
        max(when(col("rn_last") === 1, col("maxPpcOff"))).as("last_max_ppc_off"))
  }

  /** J9: attach play metadata, dropping penalties and intercepted passes
    * (eppa_analysis cell 14). */
  def withPlayMeta(summary: DataFrame, plays: DataFrame): DataFrame =
    summary.join(
      plays.filter(col("penaltyCodes").isNull && col("passResult") =!= "IN")
        .select("gameId", "playId", "epa", "passResult"),
      Seq("gameId", "playId"))

  /** Calibration: EPPA vs observed EPA correlation plus completion-rate
    * by predicted-probability bins (Calibration Viz pattern). */
  def calibration(joined: DataFrame): DataFrame = {
    val binned = joined
      .withColumn("ppc_bin", floor(col("last_max_ppc_off") * 10).cast("int"))
      .withColumn("completed", when(col("passResult") === "C", 1.0).otherwise(0.0))
    binned.groupBy("ppc_bin")
      .agg(count(lit(1)).as("n_plays"),
           avg("completed").as("completion_rate"),
           avg("epa").as("mean_epa"),
           avg("best_eppa1_tot").as("mean_eppa"))
      .orderBy("ppc_bin")
  }

  /** Player ranking: total individual EPPA, min-plays floor
    * (all_plays cells 11-16's count-filter ≥ 300 pattern). */
  def playerRanking(playerStats: DataFrame, minFrames: Int = 2): DataFrame =
    playerStats.groupBy("nflId", "displayName", "teamPos")
      .agg(sum("indEppa1").as("total_ind_eppa1"),
           avg("indEppa1").as("mean_ind_eppa1"),
           count(lit(1)).as("n_frames"))
      .filter(col("n_frames") >= minFrames)
      .orderBy(col("total_ind_eppa1").desc, col("nflId"))

  /** Team-level ranking by mean per-frame EPPA. */
  def teamRanking(playerStats: DataFrame): DataFrame =
    playerStats.groupBy("teamPos")
      .agg(avg("indEppa1").as("mean_ind_eppa1"),
           sum("indEppa1").as("total_ind_eppa1"),
           countDistinct("nflId").as("n_players"))
      .orderBy(col("mean_ind_eppa1").desc)
}
