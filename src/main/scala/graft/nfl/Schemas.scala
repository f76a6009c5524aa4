package graft.nfl

import org.apache.spark.sql.types._

/** Explicit schemas for the NFL-tracking data model (FIXTURES.md §A).
  *
  * The reference infers these from CSV (`data_processing/normalize.py:13-15`);
  * we declare them so scans are schema-checked and prunable. Raw tracking is
  * one row per (gameId, playId, frameId, actor) at 10 Hz
  * (`normalize.py:59`: deltaT = 0.1 s).
  */
object Schemas {

  /** Raw per-frame tracking rows (`week{N}.csv` — FIXTURES A1). */
  val trackingRaw = StructType(Seq(
    StructField("time", StringType),
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("s", DoubleType),
    StructField("a", DoubleType),
    StructField("dis", DoubleType),
    StructField("o", DoubleType),
    StructField("dir", DoubleType),
    StructField("event", StringType),
    StructField("nflId", LongType),
    StructField("displayName", StringType),
    StructField("jerseyNumber", IntegerType),
    StructField("position", StringType),
    StructField("frameId", IntegerType),
    StructField("team", StringType),
    StructField("gameId", LongType),
    StructField("playId", LongType),
    StructField("playDirection", StringType),
    StructField("route", StringType)))

  /** games.csv (FIXTURES A2). */
  val games = StructType(Seq(
    StructField("gameId", LongType),
    StructField("week", IntegerType),
    StructField("homeTeamAbbr", StringType),
    StructField("visitorTeamAbbr", StringType)))

  /** plays.csv — consumed columns only (FIXTURES A3). */
  val plays = StructType(Seq(
    StructField("gameId", LongType),
    StructField("playId", LongType),
    StructField("possessionTeam", StringType),
    StructField("epa", DoubleType),
    StructField("passResult", StringType),
    StructField("penaltyCodes", StringType)))

  /** players.csv (FIXTURES A4). */
  val players = StructType(Seq(
    StructField("nflId", LongType),
    StructField("displayName", StringType),
    StructField("position", StringType)))

  /** Position → position-group map (`normalize.py:87-90`). */
  val positionGeneral: Map[String, String] = Map(
    "CB" -> "DB", "DB" -> "DB", "S" -> "DB", "FS" -> "DB", "SS" -> "DB",
    "OLB" -> "LB", "ILB" -> "LB", "MLB" -> "LB", "LB" -> "LB",
    "DE" -> "DL", "DT" -> "DL", "NT" -> "DL",
    "T" -> "OL", "G" -> "OL", "C" -> "OL", "OT" -> "OL", "OG" -> "OL",
    "QB" -> "QB", "RB" -> "RB", "FB" -> "RB", "HB" -> "RB",
    "WR" -> "WR", "TE" -> "TE")

  /** Field constants (reference `analysis/models/consts.py:5-11`): the
    * candidate-pass grid is 120 × 55 → 6600 cells, T ∈ [0.1, 4.0] s in
    * 0.1 s steps → 40 flight times. */
  val FieldXMax = 120.0
  val FieldYMax = 160.0 / 3.0 // 53.33 yards
  val GridNx = 120
  val GridNy = 55
  val NumT = 40
  val DeltaT = 0.1
}
