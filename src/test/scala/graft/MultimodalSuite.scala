package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Container round-trip edges for the multimodal codecs, including the
  * layouts the fixture-driven gate queries cannot reach (the gate's
  * deterministic widths are multiples of 4, so stride == width there;
  * here the padded-row path is driven directly). */
class MultimodalSuite extends AnyFunSuite {

  test("BMP round trip with row padding (width not a multiple of 4)") {
    val pixels = Array.tabulate(40)(i => (i + 10).toByte) // 3 rows of 17 + pad
    val bmp = Multimodal.synthesizeBmp(17, pixels)
    val (_, w, h, nPix, stride, maxPix) = Multimodal.parseBmp(7L, bmp)
    assert(w === 17)
    assert(h === 3) // ceil(40 / 17)
    assert(nPix === 51L)
    assert(stride === 20) // 17 rounded up to the next multiple of 4
    assert(maxPix === 49) // 40 pixels valued 10..49; pad bytes are zero
  }

  test("BMP round trip with a single partial row") {
    val bmp = Multimodal.synthesizeBmp(16, Array[Byte](5, 9, 3))
    val (_, w, h, nPix, stride, maxPix) = Multimodal.parseBmp(1L, bmp)
    assert(w === 16 && h === 1 && nPix === 16L && stride === 16 && maxPix === 9)
  }

  test("nearest-neighbor resize samples the exact grid through row padding") {
    // 17 wide (stride 20: pad bytes in play), 16 rows => sr = tr*16/8 = 2*tr,
    // sc = tc*17/8; pixel (r, c) = r*17 + c + 1 (values 1..255 fit a byte
    // for the sampled positions), so every sampled value is predictable
    val w = 17
    val rows = 16
    val pixels = Array.tabulate(w * rows)(i => ((i + 1) % 251).toByte)
    val bmp = Multimodal.synthesizeBmp(w, pixels)
    val (_, gotW, gotH, sum, chk) = Multimodal.resizeBmp(5L, bmp)
    assert(gotW === w && gotH === rows)
    var expSum = 0L
    var expChk = 0L
    for (i <- 0 until 64) {
      val sr = (i / 8) * rows / 8
      val sc = (i % 8) * w / 8
      val u = (sr * w + sc + 1) % 251
      expSum += u
      expChk += (i + 1).toLong * u
    }
    assert(sum === expSum, "thumbnail pixel sum must match the sampled grid")
    assert(chk === expChk, "position-weighted checksum must pin pixel order")
  }

  test("WAV round trip preserves fmt fields and peak amplitude") {
    val samples = "abcXYZ".getBytes("US-ASCII")
    val wav = Multimodal.synthesizeWav(11000, samples)
    val (_, rate, ch, bits, n, durMs, amp) = Multimodal.parseWav(3L, wav)
    assert(rate === 11000 && ch === 1 && bits === 8)
    assert(n === 6L && durMs === 6000L / 11000L && amp === 'c'.toInt)
  }

  test("silence detection finds the crafted silent runs") {
    // 5 windows of 64 bytes: loud, silent, silent, loud, silent —
    // clip mean sits between the two levels, so the threshold (98% of
    // mean) separates them exactly: expect 3 silent windows in 2 spans,
    // longest run 2
    val loud = Array.fill(64)(120.toByte)
    val quiet = Array.fill(64)(10.toByte)
    val samples = loud ++ quiet ++ quiet ++ loud ++ quiet
    val wav = Multimodal.synthesizeWav(8000, samples)
    val (_, nWin, nSilent, nSpans, longest) = Multimodal.parseWavSilence(9L, wav)
    assert(nWin === 5L)
    assert(nSilent === 3L)
    assert(nSpans === 2L)
    assert(longest === 2L)
  }

  test("silence detection: uniform clip has no silent windows") {
    // every window's mean equals the clip mean, which is NOT below 98% of
    // itself — the detector must stay quiet on constant input, including
    // the shorter final window (length-normalized comparison)
    val samples = Array.fill(100)(77.toByte) // 1 full window + a 36-byte tail
    val wav = Multimodal.synthesizeWav(8000, samples)
    val (_, nWin, nSilent, nSpans, longest) = Multimodal.parseWavSilence(2L, wav)
    assert(nWin === 2L)
    assert(nSilent === 0L && nSpans === 0L && longest === 0L)
  }

  test("video fingerprint: decoded-content identity, not container identity") {
    // 3 frames (96 luma bytes): ascending, flat, ascending
    val luma = Array.tabulate(96)(i => (i % 97).toByte)
    val y4m = Multimodal.synthesizeY4m(luma)
    val (_, nf, vfp, td) = Multimodal.parseY4mFingerprint(3L, y4m)
    assert(nf === 3L)
    // a container-level variation with identical decoded frames: insert an
    // X-extension token into the header; fingerprints must not change
    val varied = new String(y4m, "US-ASCII")
      .replaceFirst("Cmono", "Cmono XCOMMENT=reencode")
      .getBytes("US-ASCII")
    val (_, nf2, vfp2, td2) = Multimodal.parseY4mFingerprint(4L, varied)
    assert(nf2 === nf && vfp2 === vfp && td2 === td,
      "decoded-equal streams with different container bytes must fingerprint equal")
    // transition bits: frame sums here are s0 < s1 < s2? compute directly
    val sums = luma.grouped(32).map(_.map(_ & 0xff).sum.toLong).toSeq
    val expectTd = sums.sliding(2).zipWithIndex
      .collect { case (Seq(a, b), i) if b > a => 1L << i }.sum
    assert(td === expectTd, "temporal dHash bits must mirror the sum transitions")
  }

  test("video fingerprint: single zero-padded frame and the md5 group key") {
    val (_, nf, vfp, td) = Multimodal.parseY4mFingerprint(5L,
      Multimodal.synthesizeY4m(Array[Byte](10, 20)))
    assert(nf === 1L && td === 0L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("30".getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    assert(vfp === expected, "vfp is md5 of the comma-joined frame-sum sequence")
  }

  test("PNG round trip is pixel-exact and fingerprint-equal to the BMP path") {
    // off-gate width (17: not a multiple of 4) so the BMP padded-row walk
    // and the PNG raster walk cover different physical layouts of the same
    // logical grid — fingerprints must still agree bit-for-bit
    val pixels = Array.tabulate(200)(i => ((i * 7 + 3) % 251).toByte)
    val png = Multimodal.synthesizePng(17, pixels)
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "real PNG magic")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 17 && img.getHeight === 12) // ceil(200/17)
    pixels.zipWithIndex.foreach { case (b, i) =>
      assert(img.getRaster.getSample(i % 17, i / 17, 0) === (b & 0xff),
        s"pixel $i lost in the PNG round trip")
    }
    val (_, pw, ph, phashPng, bandPng) = Multimodal.decodePngPhash(9L, png)
    val (_, bw, bh, phashBmp, bandBmp) =
      Multimodal.parseBmpPhash(9L, Multimodal.synthesizeBmp(17, pixels))
    assert((pw, ph) === (bw, bh))
    assert(phashPng === phashBmp && bandPng === bandBmp,
      "decoded-equal images must fingerprint equal across codecs")
  }
}
