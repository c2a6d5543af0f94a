package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RGB-level exactness: Vp8.decodeFrame (fancy upsampler + fixed-point
  * YUV->RGB) against libwebp's own WebPDecodeRGBA dumps of every lossy
  * still fixture (tools/gen_vp8_rgb.py). Vp8Spec already proves the
  * YUV planes bit-exact; this pins the whole pixel pipeline — chroma
  * interpolation rounding included — byte for byte. */
class Vp8RgbSpec extends AnyFunSuite {

  private val fixtures = Seq("flat32", "dbg16", "check32q25",
    "color64x48", "hgrad48x32", "noise35x19", "mixed80x64",
    "photo144x96", "parts8_96x80")

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing test resource /vp8/$name")
    try in.readAllBytes() finally in.close()
  }

  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  fixtures.foreach { name =>
    test(s"$name decodes RGB byte-exact with WebPDecodeRGBA") {
      val webp = resource(s"$name.webp")
      val exp = resource(s"$name.rgba")
      val w = i32be(exp, 0); val h = i32be(exp, 4)
      // the fixture is a plain RIFF/VP8 still: find the chunk payload
      val at = {
        var i = 12
        var found = -1
        while (found < 0 && i + 8 <= webp.length) {
          if (webp(i) == 'V' && webp(i + 1) == 'P' && webp(i + 2) == '8' &&
            webp(i + 3) == ' ') found = i
          else i += 1
        }
        assert(found > 0, "no VP8 chunk")
        found
      }
      val size = (webp(at + 4) & 0xff) | ((webp(at + 5) & 0xff) << 8) |
        ((webp(at + 6) & 0xff) << 16) | ((webp(at + 7) & 0xff) << 24)
      val img = Vp8.decodeFrame(webp, at + 8, size)
        .getOrElse(fail(s"$name did not decode"))
      assert(img.getWidth === w && img.getHeight === h)
      var bad = 0
      var firstMsg = ""
      for (y <- 0 until h; x <- 0 until w) {
        val got = img.getRGB(x, y)
        val at4 = 8 + (y * w + x) * 4
        val want = ((exp(at4) & 0xff) << 16) | ((exp(at4 + 1) & 0xff) << 8) |
          (exp(at4 + 2) & 0xff)
        if ((got & 0xffffff) != want) {
          if (bad == 0) firstMsg =
            f"first mismatch at ($x,$y): got ${got & 0xffffff}%06x " +
              f"want $want%06x"
          bad += 1
        }
      }
      assert(bad === 0, s"$bad mismatched pixels; $firstMsg")
    }
  }

  // the lossy-with-alpha stills go through the FULL container walker
  // (VP8X → ALPH merge → VP8 color): RGBA must match byte for byte,
  // alpha included — except where alpha is 0, where the encoder is
  // free to rewrite color (WebPDecodeRGBA itself reports the coded
  // values, which the pipeline preserves, so in practice these match
  // too; the carve-out documents the semantics, not a slack)
  Seq("alpha64x48", "alphashape32").foreach { name =>
    test(s"$name (VP8X+ALPH) decodes RGBA byte-exact through the " +
      "container walker") {
      val exp = resource(s"$name.rgba")
      val w = i32be(exp, 0); val h = i32be(exp, 4)
      val img = Vp8l.decode(resource(s"$name.webp"))
        .getOrElse(fail(s"$name did not decode"))
      assert(img.getWidth === w && img.getHeight === h)
      var bad = 0
      var firstMsg = ""
      for (y <- 0 until h; x <- 0 until w) {
        val got = img.getRGB(x, y)
        val at4 = 8 + (y * w + x) * 4
        val want = ((exp(at4 + 3) & 0xff) << 24) |
          ((exp(at4) & 0xff) << 16) | ((exp(at4 + 1) & 0xff) << 8) |
          (exp(at4 + 2) & 0xff)
        val ok = got == want ||
          ((want >>> 24) == 0 && (got >>> 24) == 0)
        if (!ok) {
          if (bad == 0) firstMsg =
            f"first mismatch at ($x,$y): got $got%08x want $want%08x"
          bad += 1
        }
      }
      assert(bad === 0, s"$bad mismatched pixels; $firstMsg")
    }
  }
}
