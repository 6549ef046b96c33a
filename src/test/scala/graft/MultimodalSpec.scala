package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mm02 image path must be a REAL codec round trip: javax.imageio PNG
  * encode of synthesized payloads, ImageIO.read decode (VERDICT r2 item 8).
  * These tests pin the decode branch against the closed-form properties
  * the DuckDB oracle predicts.
  */
class MultimodalSpec extends AnyFunSuite {
  import graft.operators.Multimodal.{decodePng, encodePng}

  test("png encode/decode round-trips dimensions and pixel sum") {
    val content = "The quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val n = content.length
    val png = encodePng(content)
    // a real PNG, not a stub: magic bytes + IHDR
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "PNG signature")
    val f = decodePng(7L, png)
    assert(f.doc_id == 7L)
    assert(f.width == (n % 64) + 1)
    assert(f.height == (n % 48) + 2)
    val expected = (0 until f.width * f.height)
      .map(i => (content(i % n) & 0xff).toLong).sum
    assert(f.pix_sum == expected, "decoded pixels must equal content bytes (lossless gray)")
  }

  test("empty payload decodes to the degenerate 1x2 black image") {
    val f = decodePng(0L, encodePng(Array.empty[Byte]))
    assert(f.width == 1 && f.height == 2 && f.pix_sum == 0L)
  }

  test("wav encode/decode round-trips sample rate, frame count and amplitudes") {
    import graft.operators.Multimodal.{decodeWav, encodeWav}
    val content = "pack my box with five dozen liquor jugs".getBytes("UTF-8")
    val n = content.length
    val wav = encodeWav(content)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF", "a real WAV container")
    val f = decodeWav(3L, wav)
    val k = (n % 2000) + 100
    assert(f.doc_id == 3L && f.sample_rate == 8000 && f.n_samples == k)
    assert(f.sample_sum == (0 until k).map(i => (content(i % n) & 0xff).toLong).sum)
    assert(f.peak == content.map(_ & 0xff).max)
  }

  test("decode is a genuine ImageIO parse: corrupt payload fails") {
    // a stub would happily hash these bytes; a real decoder rejects them
    // (ImageIO.read yields no image for unrecognizable input)
    intercept[Exception] {
      decodePng(1L, Array.fill[Byte](32)(0x42))
    }
  }

  test("aHash is perceptual: noised copies collapse while payload bytes differ") {
    import graft.operators.Multimodal.{ahashHex, encodePatternPng}
    val bits = java.lang.Long.parseUnsignedLong("a3f09c4412bd77e1", 16)
    // same pattern, three different noise placements/amplitudes → three
    // byte-distinct PNGs, one perceptual hash
    val payloads = Seq((7, 3), (42, 5), (63, 1)).map { case (pos, amt) =>
      encodePatternPng(bits, pos, amt)
    }
    assert(payloads.map(_.toSeq).distinct.size == 3,
      "noise must make the encoded bytes differ")
    val hashes = payloads.zipWithIndex.map { case (p, i) => ahashHex(i.toLong, p) }
    assert(hashes.distinct == Seq("a3f09c4412bd77e1"),
      s"aHash must equal the source pattern for every noised copy: $hashes")
    // a genuinely different pattern hashes differently
    val other = ahashHex(9L, encodePatternPng(bits ^ (1L << 13), 0, 2))
    assert(other != hashes.head)
  }

  test("gif frame sums decode losslessly and a planted scene cut is visible") {
    import graft.operators.Multimodal.{decodeGifFrameSums, encodeGif}
    // three 64-byte "shots": dim, dim, bright — one planted cut
    val content = (Array.fill(128)(40.toByte) ++ Array.fill(64)(120.toByte))
    val sums = decodeGifFrameSums(3L, "s", encodeGif(content)).toSeq
    assert(sums.map(_._3) == Seq(0, 1, 2), "every frame decodes, in order")
    // decoded luminance equals the content bytes exactly (lossless gray)
    assert(sums.map(_._4) == Seq(40L * 64, 40L * 64, 120L * 64))
    val deltas = sums.map(_._4).sliding(2).map { case Seq(a, b) => (b - a).abs }.toSeq
    assert(deltas == Seq(0L, 64L * 80))
    assert(deltas.count(_ >= 300) == 1, "exactly the planted cut fires")
    // no video, no frames
    assert(decodeGifFrameSums(4L, "s", encodeGif(Array.fill(63)(1.toByte))).isEmpty)
  }
}
