package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{PngCodec, PpmCodec, WavCodec, Y4mCodec}

/** Seeded randomized property tests — hundreds of adversarial inputs per
  * run, fully deterministic (fixed seeds), no Spark session needed. These
  * drive the REAL code paths: the codecs byte-for-byte, and the
  * Misra–Gries aggregate through the same update/serialize/merge calls
  * the Tungsten aggregation pipeline makes, under random partitionings
  * and merge orders.
  */
class PropertySpec extends AnyFunSuite {

  test("PNG round-trips random images exactly (200 trials)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val w = 1 + rng.nextInt(24); val h = 1 + rng.nextInt(24)
      val rgb = new Array[Byte](w * h * 3)
      rng.nextBytes(rgb)
      val Some((dw, dh, back)) = PngCodec.decode(PngCodec.encode(w, h, rgb))
      assert(dw == w && dh == h && java.util.Arrays.equals(back, rgb))
    }
  }

  test("PPM round-trips random images exactly (200 trials)") {
    val rng = new scala.util.Random(43)
    for (_ <- 1 to 200) {
      val w = 1 + rng.nextInt(24); val h = 1 + rng.nextInt(24)
      val rgb = new Array[Byte](w * h * 3)
      rng.nextBytes(rgb)
      val Some((dw, dh, back)) = PpmCodec.decode(PpmCodec.encode(w, h, rgb))
      assert(dw == w && dh == h && java.util.Arrays.equals(back, rgb))
    }
  }

  test("WAV round-trips random sample buffers exactly (100 trials)") {
    val rng = new scala.util.Random(44)
    for (_ <- 1 to 100) {
      val n = 1 + rng.nextInt(4000)
      val samples = Array.fill(n)(rng.nextInt().toShort)
      val rate = 8000 + rng.nextInt(40000)
      val Some((dr, back)) = WavCodec.decode(WavCodec.encode(rate, samples))
      assert(dr == rate && back.sameElements(samples))
    }
  }

  test("Y4M round-trips random frame stacks exactly (100 trials)") {
    val rng = new scala.util.Random(45)
    for (_ <- 1 to 100) {
      val w = 1 + rng.nextInt(16); val h = 1 + rng.nextInt(16)
      val frames = Array.fill(1 + rng.nextInt(6)) {
        val f = new Array[Byte](3 * w * h); rng.nextBytes(f); f
      }
      val v = Y4mCodec.Video(w, h, 1 + rng.nextInt(60), 1 + rng.nextInt(2), frames)
      val Some(back) = Y4mCodec.decode(Y4mCodec.encode(v))
      assert(back.width == w && back.height == h)
      assert(back.frames.length == frames.length)
      back.frames.zip(frames).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b))
      }
    }
  }

  // ---- custom codegen kernels vs independent naive references ----

  private def md5 = java.security.MessageDigest.getInstance("MD5")

  /** Independent md5-prefix reference: hex-string path (the oracle-SQL
    * semantics, `conv(substring(md5(s),1,15),16,10)`), not the byte fold
    * the kernel uses. */
  private def refMd5Prefix60(s: String): Long = {
    val hex = md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Random strings over an alphabet with 1-, 2-, and 3-byte UTF-8 chars —
    * shingle windows are CHARACTER windows, so multibyte offsets are
    * exactly what the kernel's code-point bookkeeping must get right. */
  private def randomText(rng: scala.util.Random, maxLen: Int): String = {
    val alphabet = "abc déé中文 xyz!"
    val n = rng.nextInt(maxLen + 1)
    (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
  }

  test("shingle-set kernel matches the hex-string md5 oracle path (300 trials)") {
    import graft.functions.ShingleUtil
    val rng = new scala.util.Random(47)
    val P = 2147483647L
    for (trial <- 1 to 300) {
      val s = randomText(rng, 40)
      val k = 1 + rng.nextInt(9)
      val cps = s.codePoints().toArray
      val count = math.max(cps.length - k + 1, 1)
      val expected = (0 until count).map { i =>
        val sh = new String(cps, i, math.min(k, cps.length - i).max(0))
        refMd5Prefix60(sh) % P
      }.distinct.sorted
      val got = ShingleUtil.md5ShingleSet(UTF8String.fromString(s), k, 60, P)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      assert(gotSeq == expected, s"trial $trial k=$k s='$s'")
    }
  }

  test("minhash signature kernel matches a BigInt reference (200 trials)") {
    import graft.functions.ShingleUtil
    val rng = new scala.util.Random(48)
    val P = 2147483647L
    for (_ <- 1 to 200) {
      val hs = Array.fill(1 + rng.nextInt(50))(rng.nextLong().abs % P)
      val m = 1 + rng.nextInt(16)
      val expected = (0 until m).map { j =>
        hs.map(h => ((BigInt(h) * (2 * j + 1) + (101 * j + 7)) mod BigInt(P)).toLong).min
      }
      val arr = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(hs)
      val got = ShingleUtil.minhashSig(arr, m, P)
      assert((0 until m).map(got.getLong) == expected)
    }
  }

  test("sorted-intersect kernel equals set intersection (300 trials)") {
    import graft.functions.ShingleUtil
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val rng = new scala.util.Random(49)
    for (_ <- 1 to 300) {
      val a = Array.fill(rng.nextInt(60))(rng.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(rng.nextInt(60))(rng.nextInt(40).toLong).distinct.sorted
      val got = ShingleUtil.sortedIntersectCount(
        UnsafeArrayData.fromPrimitiveArray(a), UnsafeArrayData.fromPrimitiveArray(b))
      assert(got == (a.toSet intersect b.toSet).size.toLong)
    }
  }

  test("simhash kernel matches a naive bit-vote reference (200 trials)") {
    import graft.functions.ShingleUtil
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rng = new scala.util.Random(50)
    for (_ <- 1 to 200) {
      val toks = Array.fill(rng.nextInt(30))(randomText(rng, 8))
      val nBits = 32
      val bal = new Array[Int](nBits)
      toks.foreach { t =>
        // 32-bit prefix = top 8 hex digits of the md5
        val hex = md5.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        for (i <- 0 until nBits)
          if (((h >> i) & 1L) == 1L) bal(i) += 1 else bal(i) -= 1
      }
      val expected = (0 until nBits)
        .map(i => if (bal(i) > 0) 1L << i else 0L).sum
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      assert(ShingleUtil.simhashFromTokens(arr, nBits) == expected)
    }
  }

  test("TopKOrdered equals exact sort under random partitionings and merges (100 trials)") {
    import org.apache.spark.sql.types._
    val rng = new scala.util.Random(51)
    val itemType = StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("id", LongType, nullable = false)))
    for (trial <- 1 to 100) {
      val k = 1 + rng.nextInt(12)
      // value DESC, id ASC — the mixed-direction shape the rewrite targets
      val agg = graft.functions.TopKOrdered(
        BoundReference(0, itemType, nullable = false), k, Seq(false, true))
      val items = Array.fill(rng.nextInt(300)) {
        (rng.nextInt(40).toLong, rng.nextInt(1000).toLong)
      }
      val P = 1 + rng.nextInt(5)
      val states = Array.fill(P)(agg.createAggregationBuffer())
      items.foreach { case (v, id) =>
        agg.update(states(rng.nextInt(P)),
          InternalRow(InternalRow(v, id)))
      }
      val thawed = states.map(s => agg.deserialize(agg.serialize(s)))
      val merged = rng.shuffle(thawed.toList)
        .reduce((a, b) => agg.merge(a, b))
      val out = agg.eval(merged).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      val expected = items.sortBy { case (v, id) => (-v, id) }.take(k).toSeq
      assert(got == expected,
        s"trial $trial k=$k P=$P:\n  got      $got\n  expected $expected")
    }
  }

  test("Misra–Gries guarantees survive random partitionings and merge orders") {
    val rng = new scala.util.Random(46)
    for (trial <- 1 to 60) {
      val k = 2 + rng.nextInt(12)
      val agg = graft.functions.FreqItems(BoundReference(0, StringType, true), k)
      // zipf-ish stream over a small vocabulary → real heavy hitters
      val vocab = Array.tabulate(4 + rng.nextInt(40))(i => s"tok$i")
      val stream = Array.fill(200 + rng.nextInt(2000)) {
        vocab((math.pow(rng.nextDouble(), 3.0) * vocab.length).toInt.min(vocab.length - 1))
      }
      // random partitioning: each element lands in one of P states
      val P = 1 + rng.nextInt(6)
      val states = Array.fill(P)(agg.createAggregationBuffer())
      stream.foreach { tok =>
        agg.update(states(rng.nextInt(P)),
          InternalRow(UTF8String.fromString(tok)))
      }
      // serialize round-trip (what the shuffle does), merge in random order
      val thawed = states.map(s => agg.deserialize(agg.serialize(s)))
      val order = rng.shuffle(thawed.toList)
      val merged = order.reduce(agg.merge)
      val out = agg.eval(merged).asInstanceOf[ArrayData]
      val n = stream.length
      val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val reported = (0 until out.numElements()).map { i =>
        val row = out.getStruct(i, 3)
        (row.getUTF8String(0).toString, row.getLong(1), row.getLong(2))
      }
      assert(reported.size <= k, s"trial $trial: ${reported.size} > k=$k")
      reported.foreach { case (item, est, err) =>
        val truth = exact(item)
        assert(est <= truth && truth <= est + err,
          s"trial $trial: $item est=$est err=$err truth=$truth")
      }
      val present = reported.map(_._1).toSet
      exact.foreach { case (item, c) =>
        if (c > n.toLong / (k + 1))
          assert(present(item),
            s"trial $trial: heavy hitter $item (freq $c, n=$n, k=$k) missing")
      }
    }
  }
}
