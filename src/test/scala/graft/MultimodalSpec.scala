package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.{FrameSample, MediaMeta}

/** Real-codec checks for the multimodal pipelines: the payloads are
  * genuine PNGs and the metadata comes from `ImageIO.read`, not from
  * arithmetic on the payload bytes. */
class MultimodalSpec extends SparkSpec {

  test("M001 synthPng emits a genuine PNG container") {
    val png = Multimodal.synthPng(42L)
    // PNG signature \x89PNG\r\n\x1a\n + IHDR chunk
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    assert(Multimodal.sniffFormat(png) == "png")
  }

  test("M002 decodeImage recovers exact dims and per-pixel gradient checksum") {
    for (id <- Seq(0L, 7L, 42L, 223L, 499L)) {
      val m = Multimodal.decodeImage(id, Multimodal.synthPng(id))
      val w = Multimodal.widthOf(id).toLong
      val h = Multimodal.heightOf(id).toLong
      assert(m.width == w && m.height == h, s"dims for $id")
      assert(m.resized_w == 224L && m.resized_h == math.max(1L, h * 224L / w))
      val expectSum = h * (w * Multimodal.baseR(id) + w * (w - 1) / 2) +
        w * (h * Multimodal.baseG(id) + h * (h - 1) / 2) +
        w * h * Multimodal.baseB(id)
      assert(m.pix_sum == expectSum, s"pix_sum for $id")
      assert(m.format == "png")
    }
  }

  test("M003 decodeImage rejects a non-image payload") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(1L, Array[Byte](1, 2, 3, 4))
    }
  }

  test("M004 decodePipeline matches the closed form at sf0.001") {
    val got = Multimodal.decodePipeline(spark, sf001).collect()
    assert(got.length > 0)
    got.foreach { r =>
      val id = r.getLong(0)
      val expect = Multimodal.decodeImage(id, Multimodal.synthPng(id))
      assert(r.getLong(1) == expect.width && r.getLong(2) == expect.height)
      assert(r.getLong(5) == expect.pix_sum)
      assert(r.getString(6) == "png")
    }
  }

  test("M005 framePipeline row sums match direct per-row decode") {
    val got = Multimodal.framePipeline(spark, sf001).collect()
    assert(got.length > 0)
    got.take(25).foreach { r =>
      val id = r.getLong(0)
      val f = Multimodal.sampleFrames(id, Multimodal.synthPng(id))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((f.f0, f.f1, f.f2, f.f3)))
    }
  }

  test("M006 media-lake round trip: binaryFile read-back decodes identically to in-memory") {
    val lake = SparkEntry.queries("q_multimodal_lake")(spark, sf001).collect()
    val direct = Multimodal.decodePipeline(spark, sf001).collect()
    assert(lake.length == direct.length && lake.length > 0)
    assert(lake.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
    // the staging dir really contains one .png file per document
    val out = java.nio.file.Paths.get(
      Staging.dir(spark, "graft_media_lake"))
    val files = java.nio.file.Files.list(out).iterator()
    var n = 0
    while (files.hasNext) { assert(files.next().toString.endsWith(".png")); n += 1 }
    assert(n == lake.length)
  }

  test("WAV round trip: parse equals the direct waveform formula") {
    for (id <- Seq(0L, 1L, 127L, 4999L)) {
      val m = Multimodal.decodeWav(id, Multimodal.synthWav(id))
      val n = Multimodal.nSamplesOf(id)
      assert(m.n_samples == n && m.sample_rate == 16000L)
      val samples = (0 until n).map(i => Multimodal.sampleOf(id, i).toLong)
      val frame = n / 4
      for (k <- 0 until 4) {
        val e = samples.slice(k * frame, (k + 1) * frame).map(s => s * s).sum
        assert(Seq(m.e0, m.e1, m.e2, m.e3)(k) == e, s"doc $id frame $k")
      }
      assert(m.peak == samples.map(math.abs).max)
    }
  }

  test("WAV parser rejects corrupted headers instead of mis-decoding") {
    val good = Multimodal.synthWav(42L)
    val bad = good.clone(); bad(8) = 'X'.toByte // break the WAVE tag
    intercept[IllegalArgumentException] { Multimodal.decodeWav(42L, bad) }
  }

  test("pHash: deterministic, identical on byte copies, near on perturbed re-encodes") {
    import graft.llm.Multimodal._
    val ids = Seq(3L, 17L, 99L, 1234L)
    for (id <- ids) {
      val png = synthTexturedPng(id, perturb = false)
      assert(phashOf(png) == phashOf(synthTexturedPng(id, perturb = false)),
        s"pHash not deterministic for $id")
      val d = java.lang.Long.bitCount(
        phashOf(png) ^ phashOf(synthTexturedPng(id, perturb = true)))
      assert(d <= 16, s"perturbed copy of $id drifted $d bits")
    }
    // distinct textures are far apart: avg pairwise distance near 32
    val hashes = ids.map(id => phashOf(synthTexturedPng(id, perturb = false)))
    val dists = for (a <- hashes; b <- hashes if a != b)
      yield java.lang.Long.bitCount(a ^ b)
    assert(dists.min > 16, s"unrelated textures too close: ${dists.min}")
  }

  test("q_multimodal_phash finds every planted copy, emits no self-pairs") {
    val out = SparkEntry.queries("q_multimodal_phash")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (id <- 0L until 5L)
      assert(out.exists(p => p._1 == id && p._2 == id + 1000000L && p._3 == 0L),
        s"planted exact copy of $id missing or nonzero-distance")
    assert(out.forall(p => p._1 < p._2), "pair order violated")
    assert(out.forall(_._3 <= 16), "hamming cap violated")
  }
}
