package graft.ml

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM reader for the XGBoost 1.x binary model format ("binf" magic)
  * — the real S5: the reference loads exactly this artifact
  * (`analysis/models/play_eppa_cpu.py:80`, joblib-pickled Booster at
  * `analysis/models/in/xyac_model.model`). The pickle is just a container;
  * the Booster's raw buffer sits inside verbatim, so we scan for the magic
  * and parse from there — no Python anywhere.
  *
  * Layout (xgboost 1.2 `learner.cc` / `gbtree.cc` / `tree_model.h`, all
  * little-endian):
  * {{{
  * "binf"
  * LearnerModelParam  { f32 base_score; u32 num_feature; i32 num_class;
  *                      i32 contain_extra_attrs; i32 contain_eval_metrics;
  *                      u32 major; u32 minor; u32 reserved[27] }
  * u64 len, bytes     name_obj   (e.g. "multi:softprob")
  * u64 len, bytes     name_gbm   (e.g. "gbtree")
  * GBTreeModelParam   { i32 num_trees; i32 num_roots; i32 num_feature;
  *                      i32 pad; i64 num_pbuffer; i32 num_output_group;
  *                      i32 size_leaf_vector; i32 reserved[32] }
  * per tree:
  *   TreeParam        { i32 num_roots; i32 num_nodes; i32 num_deleted;
  *                      i32 max_depth; i32 num_feature;
  *                      i32 size_leaf_vector; i32 reserved[31] }
  *   Node[num_nodes]  { i32 parent; i32 cleft; i32 cright; u32 sindex;
  *                      f32 info }   // cleft == -1 → leaf, info = value;
  *                                   // else split: feat = sindex & 0x7fffffff,
  *                                   // default-left = sindex >> 31, thr = info
  *   Stat[num_nodes]  { f32 loss_chg; f32 sum_hess; f32 base_weight;
  *                      i32 leaf_child_cnt }            // skipped
  *   f32[size_leaf_vector * num_nodes]                  // skipped
  * i32 tree_info[num_trees]                             // class per tree
  * }}}
  *
  * base_score cancels in softmax (same constant on every class margin), so
  * it is not folded into the returned model.
  */
object XgbBinary {

  private val Magic = "binf".getBytes("US-ASCII")

  def parseFile(path: String, featureNames: Seq[String]): GbdtScorer.Model =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      featureNames)

  /** True if the bytes contain an XGBoost binary model (possibly inside a
    * pickle/joblib wrapper). */
  def looksBinary(bytes: Array[Byte]): Boolean = indexOfMagic(bytes) >= 0

  def parse(bytes: Array[Byte], featureNames: Seq[String]): GbdtScorer.Model =
    try parseUnsafe(bytes, featureNames)
    catch {
      // a cut-off buffer surfaces as underflow (relative reads) or as
      // position-past-limit (the skip-ahead positioning calls)
      case e: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException(
          "truncated or corrupt XGBoost binary model (buffer underflow " +
            "while parsing past the 'binf' header)", e)
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("newPosition") =>
        throw new IllegalArgumentException(
          "truncated or corrupt XGBoost binary model (ran past the end " +
            "while parsing past the 'binf' header)", e)
    }

  private def parseUnsafe(bytes: Array[Byte],
                          featureNames: Seq[String]): GbdtScorer.Model = {
    val start = indexOfMagic(bytes)
    require(start >= 0, "no 'binf' XGBoost binary magic found")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(start + Magic.length)

    buf.getFloat // base_score — cancels in softmax
    val numFeature = buf.getInt
    val numClass = math.max(1, buf.getInt)
    buf.position(buf.position() + 4 * 31) // attr flags + version + reserved

    val nameObj = readStr(buf)
    val nameGbm = readStr(buf)
    require(nameGbm == "gbtree" || nameGbm == "dart",
      s"unsupported gbm '$nameGbm'")
    require(featureNames.size == numFeature,
      s"model has $numFeature features, caller supplied ${featureNames.size}")

    val numTrees = buf.getInt
    buf.position(buf.position() + 4 * 3 + 8 + 4 * 2 + 4 * 32) // rest of GBTreeModelParam

    val trees = new Array[GbdtScorer.Tree](numTrees)
    var t = 0
    while (t < numTrees) {
      buf.position(buf.position() + 4) // num_roots
      val numNodes = buf.getInt
      buf.position(buf.position() + 4 * 3) // num_deleted, max_depth, num_feature
      val sizeLeafVector = buf.getInt
      buf.position(buf.position() + 4 * 31) // reserved

      val feat = new Array[Int](numNodes)
      val thr = new Array[Double](numNodes)
      val yes = new Array[Int](numNodes)
      val no = new Array[Int](numNodes)
      val miss = new Array[Int](numNodes)
      val leaf = new Array[Double](numNodes)
      var n = 0
      while (n < numNodes) {
        buf.getInt // parent
        val cleft = buf.getInt
        val cright = buf.getInt
        val sindex = buf.getInt
        val info = buf.getFloat
        if (cleft == -1) { feat(n) = -1; leaf(n) = info.toDouble }
        else {
          feat(n) = sindex & 0x7fffffff
          thr(n) = info.toDouble
          yes(n) = cleft; no(n) = cright
          miss(n) = if ((sindex >>> 31) == 1) cleft else cright
        }
        n += 1
      }
      buf.position(buf.position() + 16 * numNodes) // stats
      buf.position(buf.position() + 4 * sizeLeafVector * numNodes)
      trees(t) = GbdtScorer.Tree(feat, thr, yes, no, miss, leaf)
      t += 1
    }

    val treeClass = new Array[Int](numTrees)
    t = 0
    while (t < numTrees) { treeClass(t) = buf.getInt; t += 1 }
    require(nameObj != null) // objective kept only for diagnostics

    GbdtScorer.Model(trees, numClass,
      featureNames.zipWithIndex.toMap, treeClass)
  }

  private def readStr(buf: ByteBuffer): String = {
    val len = buf.getLong.toInt
    val b = new Array[Byte](len)
    buf.get(b)
    new String(b, "UTF-8")
  }

  private def indexOfMagic(bytes: Array[Byte]): Int = {
    var i = 0
    val limit = bytes.length - Magic.length
    while (i <= limit) {
      if (bytes(i) == Magic(0) && bytes(i + 1) == Magic(1) &&
        bytes(i + 2) == Magic(2) && bytes(i + 3) == Magic(3)) return i
      i += 1
    }
    -1
  }
}
