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
