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
    private val activeClass: Array[Int] = activeIdx.map(classOf)

    // Flat layout for the scoring walk: all active trees' nodes in four
    // contiguous parallel arrays with ABSOLUTE child indices. Scoring a
    // 3,200-tree model touches ~50k sequential ints/doubles instead of
    // hopping across 3,200 small object graphs — the difference between
    // cache lines streaming and pointer chasing in the kernel's hot loop.
    private val treeRoot = new Array[Int](activeIdx.length)
    private val (flatFeat, flatThr, flatKid, flatLeaf) = {
      var total = 0
      activeIdx.foreach(i => total += trees(i).feat.length)
      val ff = new Array[Int](total)
      val ft = new Array[Double](total)
      // yes/miss/no packed as (kid << 1 | takeMissBranch): children stored
      // relative to this tree's base, made absolute below
      val fy = new Array[Int](2 * total)
      val fl = new Array[Double](total)
      var base = 0
      var t = 0
      while (t < activeIdx.length) {
        val tr = trees(activeIdx(t))
        treeRoot(t) = base
        var n = 0
        while (n < tr.feat.length) {
          ff(base + n) = tr.feat(n)
          ft(base + n) = tr.thr(n)
          fl(base + n) = tr.leaf(n)
          fy(2 * (base + n)) = base + tr.yes(n)      // v < thr
          fy(2 * (base + n) + 1) = base + tr.no(n)   // v >= thr
          n += 1
        }
        base += tr.feat.length
        t += 1
      }
      (ff, ft, fy, fl)
    }
    private val flatMiss: Array[Int] = {
      val fm = new Array[Int](flatFeat.length)
      var base = 0
      var t = 0
      while (t < activeIdx.length) {
        val tr = trees(activeIdx(t))
        var n = 0
        while (n < tr.feat.length) {
          fm(base + n) = base + tr.miss(n)
          n += 1
        }
        base += tr.feat.length
        t += 1
      }
      fm
    }

    def margins(x: Array[Double]): Array[Double] = {
      val m = java.util.Arrays.copyOf(baseMargin, numClasses)
      val ff = flatFeat; val ft = flatThr; val fk = flatKid
      val fm = flatMiss; val fl = flatLeaf
      val roots = treeRoot; val cls = activeClass
      var i = 0
      while (i < roots.length) {
        var n = roots(i)
        var f = ff(n)
        while (f >= 0) {
          val v = x(f)
          n = if (v != v) fm(n)
              else fk(2 * n + (if (v < ft(n)) 0 else 1))
          f = ff(n)
        }
        m(cls(i)) += fl(n)
        i += 1
      }
      m
    }

    // Cache-line node pack for the batch walk: 4 longs per node =
    // [feature (pre-mapped through nothing; -1 = leaf),
    //  raw bits of threshold-or-leaf,
    //  children: yes | no<<21 | miss<<42 (20-bit absolute indices),
    //  pad] — one node visit touches one 32-byte span instead of 3-4
    // scattered parallel-array lines.
    private lazy val packedNodes: Array[Long] = {
      require(flatFeat.length < (1 << 20), "packed layout caps at 2^20 nodes")
      val pk = new Array[Long](flatFeat.length * 4)
      var nd = 0
      while (nd < flatFeat.length) {
        pk(nd * 4) = flatFeat(nd)
        pk(nd * 4 + 1) = java.lang.Double.doubleToRawLongBits(
          if (flatFeat(nd) < 0) flatLeaf(nd) else flatThr(nd))
        pk(nd * 4 + 2) = flatKid(2 * nd).toLong |
          (flatKid(2 * nd + 1).toLong << 21) | (flatMiss(nd).toLong << 42)
        nd += 1
      }
      pk
    }

    /** Batch expectation over `n` feature rows (row-major, `stride` wide;
      * `slots(i)` = column of model feature i, letting callers keep their
      * own layout). Trees outer, cells inner per block: one tree's ~15
      * nodes stay hot while the block's walks run as INDEPENDENT load
      * chains the CPU overlaps — the per-call path is one serial
      * pointer-chase per tree and bounds at ~30 µs/row on a 3,200-tree
      * model (same trick as treelite's block prediction). */
    def expectationBatch(x: Array[Double], n: Int, stride: Int,
                         slots: Array[Int], values: Array[Double],
                         out: Array[Double]): Unit = {
      val B = 128
      val nc = numClasses
      val m = new Array[Double](B * nc)
      val pk = packedNodes
      val roots = treeRoot; val cls = activeClass
      var b0 = 0
      while (b0 < n) {
        val bn = math.min(B, n - b0)
        var c = 0
        while (c < bn) {
          System.arraycopy(baseMargin, 0, m, c * nc, nc)
          c += 1
        }
        var i = 0
        while (i < roots.length) {
          val root = roots(i)
          val mOff = cls(i)
          c = 0
          while (c < bn) {
            val off = (b0 + c) * stride
            var nd = root
            var f = pk(nd << 2).toInt
            while (f >= 0) {
              val v = x(off + slots(f))
              val kids = pk((nd << 2) + 2)
              nd = if (v != v) ((kids >>> 42) & 0xFFFFF).toInt
                   else if (v < java.lang.Double.longBitsToDouble(pk((nd << 2) + 1)))
                     (kids & 0xFFFFF).toInt
                   else ((kids >>> 21) & 0xFFFFF).toInt
              f = pk(nd << 2).toInt
            }
            m(c * nc + mOff) +=
              java.lang.Double.longBitsToDouble(pk((nd << 2) + 1))
            c += 1
          }
          i += 1
        }
        c = 0
        while (c < bn) {
          var mx = Double.NegativeInfinity
          var j = 0
          while (j < nc) { if (m(c * nc + j) > mx) mx = m(c * nc + j); j += 1 }
          var den = 0.0; var num = 0.0
          j = 0
          while (j < nc) {
            val e = math.exp(m(c * nc + j) - mx)
            den += e; num += e * values(j)
            j += 1
          }
          out(b0 + c) = num / den
          c += 1
        }
        b0 += B
      }
    }

    def softprob(x: Array[Double]): Array[Double] = {
      val m = margins(x)
      val mx = m.max
      val e = m.map(v => math.exp(v - mx))
      val s = e.sum
      e.map(_ / s)
    }

    /** Class-value expectation: Σ p_i · values(i) (e.g. xyac yards,
      * EP points — `play_eppa_cpu.py:136,149,424`). Accumulated as
      * (Σ e·v)/(Σ e) in class order — the same FP sequence as
      * expectationBatch, so the two paths agree bit for bit. */
    def expectation(x: Array[Double], values: Array[Double]): Double = {
      val m = margins(x)
      var mx = Double.NegativeInfinity
      var i = 0
      while (i < m.length) { if (m(i) > mx) mx = m(i); i += 1 }
      var den = 0.0; var num = 0.0
      i = 0
      while (i < m.length) {
        val e = math.exp(m(i) - mx)
        den += e; num += e * values(i)
        i += 1
      }
      num / den
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

  /** Column API: expectation over an array-typed feature column as a
    * NATIVE expression (GbdtExpectation — no ScalaUDF, no per-row boxed
    * Seq conversion; the model rides the serialized plan as a codegen
    * reference object). The model is baked into a session-registered
    * function because expression trees are built from column names only. */
  def expectationColumn(model: Model, values: Array[Double])(features: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val name = s"graft_gbdt_${Integer.toHexString(System.identityHashCode(model))}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => GbdtExpectation(exprs.head, model, values),
      "built-in")
    org.apache.spark.sql.functions.call_function(name, features)
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
