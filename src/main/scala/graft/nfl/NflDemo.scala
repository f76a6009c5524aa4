package graft.nfl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the NFL domain pipeline over the toy week:
  * normalize → movement stats → EPA table (stub EP scorer). Run with
  * `sbt "runMain graft.nfl.NflDemo"`. Doubles as living documentation of
  * the domain API surface.
  */
object NflDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val norm = Normalize(ToyData.tracking(spark), ToyData.games(spark),
      ToyData.plays(spark)).cache()
    println(s"NORM_ROWS=${norm.count()}")

    val top = MovementStats.topSpeedByPosition(norm, 3)
    println("TOP_SPEED:")
    top.show(10, false)

    val pre = Seq((1L, 100L, 1, 60.0, 10.0), (1L, 200L, 3, 40.0, 5.0))
      .toDF("gameId", "playId", "down_x", "yardline_100", "ydstogo")
    val stubEp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("xep", (lit(100.0) - col("yardline_100_post")) / 20.0)
    val epa = EpaModel.epaTable(pre, stubEp)
    println(s"EPA_ROWS=${epa.count()}")
    epa.filter($"play_endpoint_x".isin(0.5, 60.5, 110.5)).orderBy("playId", "play_endpoint_x")
      .show(10, false)

    spark.stop()
  }
}
