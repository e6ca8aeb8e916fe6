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
}
