package graft.multimodal

import graft.SparkTestBase

/** Frequency-domain audio features + bilinear resize semantics. */
class MultimodalOpsSpec extends SparkTestBase {

  test("goertzel recovers every synthesized tone to within one probe") {
    import spark.implicits._
    val items = Multimodal.synthesize(spark, sfDir)
      .filter(_.kind == "audio")
    val feats = Multimodal.extractSpectralFeatures(items)
      .collect().map(f => f.mediaId -> f).toMap
    assert(feats.nonEmpty)
    // independent reference for the synthesized frequency: md5(text)
    val docs = graft.Tables.documents(spark, sfDir)
      .filter($"doc_id" % 3 === 1)
      .select("doc_id", "text").collect()
    assert(docs.length == feats.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.foreach { r =>
      val docId = r.getLong(0)
      val digest = md.digest(r.getString(1).getBytes("UTF-8"))
      val freq = 200.0 + (digest(0) & 0xff) * 8.0
      val f = feats(docId)
      assert(math.abs(f.peakHz - freq) <= Multimodal.ProbeHz,
        s"doc $docId: peak ${f.peakHz} vs tone $freq")
      // the centroid sits near the tone too (dither pulls it slightly)
      assert(math.abs(f.centroidHz - freq) <= 8 * Multimodal.ProbeHz,
        s"doc $docId: centroid ${f.centroidHz} vs tone $freq")
      // band energies are a normalized distribution concentrated at the
      // tone's band
      val sum = f.bandEnergyMilli.sum
      assert(sum > 800 && sum <= 1100, s"doc $docId: band mass $sum")
      val toneBand = ((freq / Multimodal.ProbeHz).round.toInt - 1) /
        Multimodal.BandProbes
      val top = f.bandEnergyMilli.indices.maxBy(f.bandEnergyMilli(_))
      assert(math.abs(top - toneBand) <= 1,
        s"doc $docId: top band $top vs tone band $toneBand")
    }
  }

  test("bilinear resize is exact on constant images") {
    val rgb = Array.fill[Byte](7 * 5 * 3)(113.toByte)
    val out = PpmCodec.resizeBilinear(7, 5, rgb, 13, 3)
    assert(out.length == 13 * 3 * 3)
    assert(out.forall(_ == 113.toByte))
  }

  test("bilinear upscale interpolates between neighbors; downsample stays monotone") {
    // 2x1 black/white -> 8x1: interior pixels must be strictly between
    val bw = Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte)
    val up = PpmCodec.resizeBilinear(2, 1, bw, 8, 1).map(_ & 0xff)
    assert(up(0) == 0 && up(7 * 3) == 255)
    assert(up.exists(v => v > 20 && v < 235), s"no interpolated value: ${up.toSeq}")
    // monotone nondecreasing along x for a horizontal ramp
    val ramp = Array.tabulate[Byte](16 * 1 * 3)(i => ((i / 3) * 16).toByte)
    val down = PpmCodec.resizeBilinear(16, 1, ramp, 5, 1).map(_ & 0xff)
    (1 until 5).foreach(x => assert(down(x * 3) >= down((x - 1) * 3),
      s"not monotone: ${down.toSeq}"))
  }

  test("center crop picks the exact central window") {
    val rgb = Array.tabulate[Byte](6 * 4 * 3) { i =>
      val px = i / 3
      ((px % 6) * 10 + (px / 6)).toByte
    }
    val (cw, ch, out) = PpmCodec.centerCrop(6, 4, rgb, 2, 2)
    assert(cw == 2 && ch == 2)
    // center of 6x4 with 2x2 crop: x in {2,3}, y in {1,2}
    val expected = for (y <- 1 to 2; x <- 2 to 3) yield (x * 10 + y).toByte
    val got = (0 until 4).map(i => out(i * 3))
    assert(got == expected, s"$got vs $expected")
    // crop larger than source clamps
    val (fw, fh, full) = PpmCodec.centerCrop(6, 4, rgb, 100, 100)
    assert(fw == 6 && fh == 4 && full.sameElements(rgb))
  }

  test("resizeBilinear dataset op preserves format and new dimensions") {
    import spark.implicits._
    val items = Multimodal.synthesize(spark, sfDir).filter(_.kind == "image")
    val resized = Multimodal.resizeBilinear(items, 4, 4).collect()
    assert(resized.nonEmpty)
    resized.foreach { m =>
      assert(m.meta.width == 4 && m.meta.height == 4)
      val dec = Multimodal.decodeImage(m.payload)
      assert(dec.isDefined, s"media ${m.mediaId} not decodable after resize")
      val (w, h, _) = dec.get
      assert(w == 4 && h == 4)
    }
  }
}
