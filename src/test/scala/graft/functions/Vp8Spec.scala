package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The lossy-WebP decoder against REAL encoder output: each fixture
  * pair is a lossy webp produced by libwebp (the VP8 reference
  * implementation) plus the YUV planes libwebp itself decodes from it
  * (tools/gen_vp8_fixtures.py). The Scala decoder must reproduce those
  * planes BIT-EXACTLY — one wrong probability-table entry, predictor
  * pixel, dequant factor, or loop-filter tap desynchronizes the
  * arithmetic decoder or shifts pixels, so exact equality here is an
  * end-to-end proof of the whole keyframe path. */
class Vp8Spec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing test resource /vp8/$name")
    try in.readAllBytes() finally in.close()
  }

  /** (w, h, y, u, v) from the fixture's expected-plane dump. */
  private def expected(name: String)
      : (Int, Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val b = resource(s"$name.yuv")
    val bb = java.nio.ByteBuffer.wrap(b)
    val w = bb.getInt(); val h = bb.getInt()
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = new Array[Byte](w * h)
    val u = new Array[Byte](cw * ch)
    val v = new Array[Byte](cw * ch)
    bb.get(y); bb.get(u); bb.get(v)
    (w, h, y, u, v)
  }

  /** Extract the "VP8 " chunk payload from a webp container. */
  private def vp8Chunk(b: Array[Byte]): (Int, Int) = {
    var off = 12
    while (off + 8 <= b.length) {
      val tag = new String(b, off, 4, "ISO-8859-1")
      val size = (b(off + 4) & 0xff) | ((b(off + 5) & 0xff) << 8) |
        ((b(off + 6) & 0xff) << 16) | ((b(off + 7) & 0xff) << 24)
      if (tag == "VP8 ") return (off + 8, size)
      off += 8 + size + (size & 1)
    }
    fail("no VP8 chunk in fixture")
  }

  private val fixtures = Seq(
    "flat32", // DC-only macroblocks
    "hgrad48x32", // directional 16x16 predictors
    "color64x48", // chroma residuals
    "noise35x19", // B_PRED subblock modes + odd-size cropping
    "check32q25", // coarse quantizers + strong loop filter
    "mixed80x64", // high quality, all token categories
    "dbg16", // single-MB B_PRED (caught the B-mode numbering mismatch)
    "parts8_96x80", // EIGHT token partitions (advanced-API encode)
    "photo144x96") // smooth+edge+texture blend, 54 macroblocks

  for (name <- fixtures)
    test(s"$name decodes bit-exactly to libwebp's YUV planes") {
      val webp = resource(s"$name.webp")
      val (off, len) = vp8Chunk(webp)
      val (w, h, ey, eu, ev) = expected(name)
      val got = Vp8.decodePlanes(webp, off, len)
      assert(got.isDefined, "decodePlanes returned None")
      val (y, u, v, dw, dh, ys, uvs) = got.get
      assert(dw === w && dh === h)
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      var bad = 0
      var firstMsg = ""
      for (j <- 0 until h; i <- 0 until w) {
        val g = y(j * ys + i); val e = ey(j * w + i) & 0xff
        if (g != e) {
          bad += 1
          if (firstMsg.isEmpty) firstMsg = s"Y($i,$j): got $g want $e"
        }
      }
      for (j <- 0 until ch; i <- 0 until cw) {
        val gu = u(j * uvs + i); val euv = eu(j * cw + i) & 0xff
        val gv = v(j * uvs + i); val evv = ev(j * cw + i) & 0xff
        if (gu != euv) {
          bad += 1
          if (firstMsg.isEmpty) firstMsg = s"U($i,$j): got $gu want $euv"
        }
        if (gv != evv) {
          bad += 1
          if (firstMsg.isEmpty) firstMsg = s"V($i,$j): got $gv want $evv"
        }
      }
      assert(bad === 0, s"$bad mismatched samples; first: $firstMsg")
    }

  test("the RGB surface decodes every fixture with plausible colors") {
    for (name <- fixtures) {
      val webp = resource(s"$name.webp")
      val (off, len) = vp8Chunk(webp)
      val (w, h, _, _, _) = expected(name)
      val img = Vp8.decodeFrame(webp, off, len)
      assert(img.isDefined, s"$name RGB decode failed")
      assert(img.get.getWidth === w && img.get.getHeight === h)
    }
    // flat gray fixture must come back gray everywhere
    val webp = resource("flat32.webp")
    val (off, len) = vp8Chunk(webp)
    val img = Vp8.decodeFrame(webp, off, len).get
    val px = img.getRGB(16, 16)
    val (r, g, b) = ((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
    assert(Math.abs(r - 128) < 6 && Math.abs(g - 128) < 6 &&
      Math.abs(b - 128) < 6, f"flat fixture not gray: $px%06x")
  }

  for (name <- Seq("alpha64x48", "alphashape32"))
    test(s"$name (lossy + ALPH): color planes AND alpha channel decode " +
      "bit-exactly") {
      val webp = resource(s"$name.webp")
      val (off, len) = vp8Chunk(webp)
      val (w, h, ey, _, _) = expected(name)
      // color part: YUV planes, same gate as the opaque fixtures
      val (y, _, _, dw, dh, ys, _) = Vp8.decodePlanes(webp, off, len).get
      assert(dw === w && dh === h)
      for (j <- 0 until h; i <- 0 until w)
        assert(y(j * ys + i) === (ey(j * w + i) & 0xff), s"Y($i,$j)")
      // alpha: the .yuv dump carries libwebp's straight alpha bytes
      // after the planes; the container decode must reproduce them
      val yuv = resource(s"$name.yuv")
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val alphaOff = 8 + w * h + 2 * cw * ch
      assert(yuv.length === alphaOff + w * h, "fixture has no alpha dump")
      val img = Vp8l.decode(webp).getOrElse(fail("container decode failed"))
      assert(img.getWidth === w && img.getHeight === h)
      for (j <- 0 until h; i <- 0 until w)
        assert(((img.getRGB(i, j) >>> 24) & 0xff) ===
          (yuv(alphaOff + j * w + i) & 0xff), s"alpha($i,$j)")
    }

  test("ALPH raw coding inverts all four filters (libwebp's encoder " +
    "only emitted filter=0, so the unfilters need their own proof)") {
    // carrier frame: reuse a real lossy fixture's VP8 chunk
    val base = resource("flat32.webp")
    val (voff, vlen) = vp8Chunk(base)
    val vp8ChunkBytes = java.util.Arrays.copyOfRange(
      base, voff - 8, voff + vlen + (vlen & 1))
    val w = 32; val h = 32
    // a plane with gradients AND hard edges so every filter's
    // prediction actually varies
    val plane = Array.tabulate(h, w)((j, i) =>
      if (i > 20 && j > 20) 17 else (i * 7 + j * 3) % 256)
    def clip(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    // FORWARD filtering per the container spec (independent test-side
    // implementation; the decoder must invert it exactly)
    def forward(method: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      for (j <- 0 until h; i <- 0 until w) {
        val p = plane(j)(i)
        val pred =
          if (method == 0) 0
          else if (j == 0) { if (i == 0) 0 else plane(0)(i - 1) }
          else method match {
            case 1 => if (i == 0) plane(j - 1)(0) else plane(j)(i - 1)
            case 2 => plane(j - 1)(i)
            case _ =>
              val left = if (i == 0) plane(j - 1)(0) else plane(j)(i - 1)
              val tl = if (i == 0) plane(j - 1)(0) else plane(j - 1)(i - 1)
              clip(left + plane(j - 1)(i) - tl)
          }
        out(j * w + i) = (p - pred).toByte
      }
      out
    }
    for (method <- 0 to 3) {
      val alph = Array[Byte]((method << 2).toByte) ++ forward(method)
      val chunk = "ALPH".getBytes ++ Array[Byte](
        (alph.length & 0xff).toByte, ((alph.length >> 8) & 0xff).toByte,
        ((alph.length >> 16) & 0xff).toByte, 0) ++ alph ++
        (if (alph.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      val body = "WEBP".getBytes ++ chunk ++ vp8ChunkBytes
      val file = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      file.put("RIFF".getBytes); file.putInt(body.length); file.put(body)
      val img = Vp8l.decode(file.array())
        .getOrElse(fail(s"filter $method did not decode"))
      for (j <- 0 until h; i <- 0 until w)
        assert(((img.getRGB(i, j) >>> 24) & 0xff) === plane(j)(i),
          s"filter $method alpha($i,$j)")
    }
  }

  test("lossy webp decodes through the container surface (sniff -> " +
    "Vp8l.decode -> Vp8) and resizes end-to-end") {
    val webp = resource("photo144x96.webp")
    assert(BinaryFunctions.sniffFormat(webp) === "webp")
    val img = Vp8l.decode(webp)
    assert(img.isDefined && img.get.getWidth === 144 &&
      img.get.getHeight === 96)
    assert(BinaryFunctions.resizeImage(webp, 36, 24).isDefined)
  }

  test("mutation fuzz: corrupted streams decode to None or pixels, " +
    "never an exception or a hang") {
    val webp = resource("mixed80x64.webp")
    val (off, len) = vp8Chunk(webp)
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 300) {
      val mutated = webp.clone()
      // corrupt 1-4 bytes anywhere in the VP8 payload (headers,
      // partition table, token data)
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = off + rnd.nextInt(len)
        mutated(at) = rnd.nextInt(256).toByte
      }
      val t0 = System.nanoTime()
      Vp8.decodePlanes(mutated, off, len) // Option either way — no throw
      assert(System.nanoTime() - t0 < 5_000_000_000L,
        s"trial $trial: decode took >5s on corrupt input")
    }
  }

  test("malformed VP8 payloads return None, never throw") {
    val webp = resource("flat32.webp")
    val (off, len) = vp8Chunk(webp)
    assert(Vp8.decodePlanes(webp, off, 5).isEmpty) // truncated header
    val noMagic = webp.clone(); noMagic(off + 3) = 0x00
    assert(Vp8.decodePlanes(noMagic, off, len).isEmpty)
    val interframe = webp.clone(); interframe(off) = (webp(off) | 1).toByte
    assert(Vp8.decodePlanes(interframe, off, len).isEmpty)
    assert(Vp8.decodePlanes(Array.fill(64)(0x55.toByte), 0, 64).isEmpty)
    // allocation guard: a ~30-byte payload declaring 4096x4096 must be
    // rejected BEFORE the ~96 MB of plane allocations (memory
    // amplification over untrusted bytes across concurrent tasks)
    val hostile = webp.slice(off, off + 30)
    hostile(6) = 0x00; hostile(7) = 0x10 // w = 4096
    hostile(8) = 0x00; hostile(9) = 0x10 // h = 4096
    assert(Vp8.decodePlanes(hostile, 0, hostile.length).isEmpty)
  }
}
