package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure-JVM GBDT (XGBoost text-dump) parser + scorer — the Spark-side
  * replacement for the reference's joblib/treelite model loading (S5,
  * `analysis/models/play_eppa_cpu.py:80-87`; dump format as in
  * `analysis/models/in/xyac_model.raw.txt`).
  *
  * Dump grammar per booster:
  * {{{
  * booster[i]:
  * 0:[feature<threshold] yes=1,no=2,missing=1
  *   1:leaf=0.146
  *   ...
  * }}}
  * Booster i contributes to class (i % numClasses); margins are summed
  * leaf values; multi:softprob applies softmax plus the 0.5 base margin
  * (which cancels in softmax, so it is omitted).
  *
  * Scoring is exposed as a deterministic Scala function used from a UDF
  * (model broadcast via closure). At 100 TB the upgrade path is a codegen
  * `Expression`; the tree walk itself is already branch-local and
  * allocation-free.
  */
object GbdtScorer {

  /** Flat tree: parallel arrays indexed by node id; feat = -1 → leaf. */
  final case class Tree(feat: Array[Int], thr: Array[Double],
                        yes: Array[Int], no: Array[Int], miss: Array[Int],
                        leaf: Array[Double]) {
    def score(x: Array[Double]): Double = {
      var n = 0
      while (feat(n) >= 0) {
        val v = x(feat(n))
        n = if (v.isNaN) miss(n) else if (v < thr(n)) yes(n) else no(n)
      }
      leaf(n)
    }
  }

  /** `treeClass(i)` = class tree i contributes to. Text dumps don't carry
    * it → round-robin `i % numClasses` (XGBoost's layout); the binary
    * format stores it explicitly (`tree_info`). */
  final case class Model(trees: Array[Tree], numClasses: Int,
                         featureIndex: Map[String, Int],
                         treeClass: Array[Int] = null) {
    private def classOf(i: Int): Int =
      if (treeClass == null) i % numClasses else treeClass(i)
    // Constant-fold single-leaf boosters into a per-class base margin: a
    // converged multiclass dump is mostly pure-leaf trees (89% of the
    // reference xyac raw dump's boosters), so scoring walks only the
    // real trees. Exact — addition is the same, just reordered per class.
    private val baseMargin: Array[Double] = {
      val m = new Array[Double](numClasses)
      var i = 0
      while (i < trees.length) {
        if (trees(i).feat(0) < 0) m(classOf(i)) += trees(i).leaf(0)
        i += 1
      }
      m
    }
    private val activeIdx: Array[Int] =
      trees.indices.filter(i => trees(i).feat(0) >= 0).toArray
    private val activeTrees: Array[Tree] = activeIdx.map(trees(_))
    private val activeClass: Array[Int] = activeIdx.map(classOf)

    def margins(x: Array[Double]): Array[Double] = {
      val m = java.util.Arrays.copyOf(baseMargin, numClasses)
      var i = 0
      while (i < activeTrees.length) {
        m(activeClass(i)) += activeTrees(i).score(x)
        i += 1
      }
      m
    }

    def softprob(x: Array[Double]): Array[Double] = {
      val m = margins(x)
      val mx = m.max
      val e = m.map(v => math.exp(v - mx))
      val s = e.sum
      e.map(_ / s)
    }

    /** Class-value expectation: Σ p_i · values(i) (e.g. xyac yards,
      * EP points — `play_eppa_cpu.py:136,149,424`). */
    def expectation(x: Array[Double], values: Array[Double]): Double = {
      val p = softprob(x)
      var s = 0.0
      var i = 0
      while (i < p.length) { s += p(i) * values(i); i += 1 }
      s
    }
  }

  private val NodeRe =
    """\s*(\d+):\[(.+?)<(-?[\d.eE+-]+)\]\s+yes=(\d+),no=(\d+),missing=(\d+).*""".r
  private val LeafRe = """\s*(\d+):leaf=(-?[\d.eE+-]+).*""".r
  private val BoosterRe = """booster\[(\d+)\]:""".r

  def parse(lines: Iterator[String], featureNames: Seq[String],
            numClasses: Int): Model = {
    val fIdx = featureNames.zipWithIndex.toMap
    val trees = scala.collection.mutable.ArrayBuffer.empty[Tree]
    // accumulate nodes of the current booster as (id -> fields)
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Int, Int, Int, Double)]

    def flush(): Unit = if (cur.nonEmpty) {
      val maxId = cur.map(_._1).max
      val t = Tree(Array.fill(maxId + 1)(-1), new Array(maxId + 1),
        new Array(maxId + 1), new Array(maxId + 1), new Array(maxId + 1),
        new Array(maxId + 1))
      cur.foreach { case (id, f, th, y, n, m, lf) =>
        t.feat(id) = f; t.thr(id) = th; t.yes(id) = y; t.no(id) = n
        t.miss(id) = m; t.leaf(id) = lf
      }
      trees += t
      cur = scala.collection.mutable.ArrayBuffer.empty
    }

    lines.foreach {
      case BoosterRe(_) => flush()
      case NodeRe(id, feat, thr, y, n, m) =>
        val f = fIdx.getOrElse(feat,
          throw new IllegalArgumentException(s"unknown feature '$feat'"))
        cur += ((id.toInt, f, thr.toDouble, y.toInt, n.toInt, m.toInt, 0.0))
      case LeafRe(id, v) =>
        cur += ((id.toInt, -1, 0.0, 0, 0, 0, v.toDouble))
      case _ => // blank / header noise
    }
    flush()
    require(trees.nonEmpty, "empty GBDT dump")
    Model(trees.toArray, numClasses, fIdx)
  }

  def parseFile(path: String, featureNames: Seq[String], numClasses: Int): Model = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.getLines(), featureNames, numClasses) finally src.close()
  }

  /** Column API: expectation over an array-typed feature column. The model
    * rides the closure (broadcast by Spark's task serializer — small,
    * read-only). */
  def expectationColumn(model: Model, values: Array[Double])(features: Column): Column = {
    val f = udf { xs: Seq[Double] =>
      model.expectation(xs.toArray, values)
    }
    f(features)
  }

  /** DataFrame helper: append `outCol` = expectation over named feature
    * columns (NaN-filled nulls keep XGBoost missing-branch semantics). */
  def withExpectation(df: DataFrame, model: Model, values: Array[Double],
                      featureCols: Seq[String], outCol: String): DataFrame = {
    val arr = array(featureCols.map(c =>
      coalesce(col(c).cast("double"), lit(Double.NaN))): _*)
    df.withColumn(outCol, expectationColumn(model, values)(arr))
  }
}
