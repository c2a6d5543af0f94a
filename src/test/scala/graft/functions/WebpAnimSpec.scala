package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Animated WebP reassembly against hand-assembled containers whose
  * frame payloads come from the system libwebp encoder, with expected
  * canvases computed by an independent compositor (tools/
  * gen_anim_fixtures.py) from libwebp's own decode of each payload.
  * The blend equation is additionally pinned to hand-computed literals
  * so both implementations can't drift together unnoticed. */
class WebpAnimSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing test resource /vp8/$name")
    try in.readAllBytes() finally in.close()
  }

  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** (w, h, frames as (duration, rgba bytes)). */
  private def expected(name: String): (Int, Int, Seq[(Int, Array[Byte])]) = {
    val b = resource(s"$name.rgba")
    val w = i32be(b, 0); val h = i32be(b, 4); val n = i32be(b, 8)
    var off = 12
    val frames = (0 until n).map { _ =>
      val dur = i32be(b, off)
      val px = java.util.Arrays.copyOfRange(b, off + 4, off + 4 + w * h * 4)
      off += 4 + w * h * 4
      (dur, px)
    }
    (w, h, frames)
  }

  /** tol = max per-channel delta. 0 everywhere since the fancy
    * upsampler + pinned YUV->RGB constants landed (Vp8RgbSpec proves
    * stills byte-exact); the parameter stays for fixtures whose
    * encoder may legitimately rewrite RGB under alpha=0. */
  private def checkFixture(name: String, tol: Int = 0): Unit = {
    val (w, h, want) = expected(name)
    val got = WebpAnim.decode(resource(s"$name.webp"))
      .getOrElse(fail(s"$name did not decode"))
    assert(got.length === want.length, "frame count")
    got.zip(want).zipWithIndex.foreach { case ((frame, (dur, px)), fi) =>
      assert(frame.durationMs === dur, s"frame $fi duration")
      assert(frame.image.getWidth === w && frame.image.getHeight === h)
      var bad = 0
      for (y <- 0 until h; x <- 0 until w) {
        val at = (y * w + x) * 4
        val g = frame.image.getRGB(x, y)
        val wantA = px(at + 3) & 0xff
        val ok = ((g >>> 24) == wantA) &&
          (math.abs(((g >> 16) & 0xff) - (px(at) & 0xff)) <= tol) &&
          (math.abs(((g >> 8) & 0xff) - (px(at + 1) & 0xff)) <= tol) &&
          (math.abs((g & 0xff) - (px(at + 2) & 0xff)) <= tol)
        // fully transparent pixels carry no color information: lossy
        // encoders are free to rewrite RGB under alpha=0
        if (!ok && !(tol > 0 && wantA == 0 && (g >>> 24) == 0)) {
          if (bad == 0) info(f"frame $fi first mismatch at ($x,$y): " +
            f"got $g%08x want a=$wantA rgb=" +
            f"${px(at) & 0xff},${px(at + 1) & 0xff},${px(at + 2) & 0xff}")
          bad += 1
        }
      }
      assert(bad === 0, s"frame $fi: $bad mismatched pixels")
    }
  }

  test("replace-mode animation: full-canvas lossless + lossy frames, " +
    "dispose-to-background clears before a sub-rect frame") {
    checkFixture("anim_replace")
  }

  test("alpha-blending animation: lossless sub-rect frames with all " +
    "four alpha quadrants composite over an opaque base — exact") {
    checkFixture("anim_blend")
  }

  test("lossy frames inside ANMF (VP8 color + lossless ALPH): " +
    "byte-exact incl. alpha (fancy upsampler + pinned constants)") {
    checkFixture("anim_lossy")
  }

  test("the still surface decodes an animation's FIRST frame (ANMF " +
    "descent in the chunk walker)") {
    val anim = resource("anim_blend.webp")
    val (w, h, want) = expected("anim_blend")
    val still = Vp8l.decode(anim).getOrElse(fail("still decode of anim"))
    assert(still.getWidth === w && still.getHeight === h)
    val px = want.head._2
    for (y <- 0 until h; x <- 0 until w) {
      val at = (y * w + x) * 4
      val wantPx = ((px(at + 3) & 0xff) << 24) | ((px(at) & 0xff) << 16) |
        ((px(at + 1) & 0xff) << 8) | (px(at + 2) & 0xff)
      // first frame is full-canvas opaque lossy: compare RGB
      assert((still.getRGB(x, y) & 0xffffff) === (wantPx & 0xffffff),
        s"($x,$y)")
    }
  }

  test("blend equation pinned to hand-computed literals (independent " +
    "of the generator's compositor)") {
    // opaque src replaces; transparent src keeps dst
    assert(WebpAnim.blend(0xff102030, 0x80aabbcc) === 0xff102030)
    assert(WebpAnim.blend(0x00102030, 0x80aabbcc) === 0x80aabbcc)
    // sa=128 over opaque dst: blendA = 128 + 255*127/255 = 255,
    // scale = 128*255/255 = 128; r = (0x10*128 + 0xaa*127)/255 = 92
    // g = (0x20*128 + 0xbb*127)/255 = 109, b = (0x30*128+0xcc*127)/255=125
    assert(WebpAnim.blend(0x80102030, 0xffaabbcc) ===
      ((255 << 24) | (92 << 16) | (109 << 8) | 125))
    // sa=128 over da=64: blendA = 128 + 64*127/255 = 159 (int div),
    // scale = 128*255/159 = 205
    // r = (0x10*205 + 0xaa*50)/255 = (3280+8500)/255 = 46
    // g = (0x20*205 + 0xbb*50)/255 = (6560+9350)/255 = 62
    // b = (0x30*205 + 0xcc*50)/255 = (9840+10200)/255 = 78
    assert(WebpAnim.blend(0x80102030, 0x40aabbcc) ===
      ((159 << 24) | (46 << 16) | (62 << 8) | 78))
    // both transparent-ish: sa=0 path already covered; da=0 keeps src
    // channels at full weight: blendA = sa, scale = 255
    assert(WebpAnim.blend(0x33102030, 0x00aabbcc) === 0x33102030)
  }

  test("malformed animations return None, never throw") {
    val good = resource("anim_replace.webp")
    // not an animation: the still fixtures have no ANMF
    assert(WebpAnim.decode(resource("flat32.webp")) === None)
    // frame rectangle past the canvas: bump frame 0's width field
    val wide = good.clone()
    val anmf = indexOfTag(wide, "ANMF")
    wide(anmf + 8 + 6) = 0x7f // fw-1 low byte → rect overflows canvas
    assert(WebpAnim.decode(wide) === None)
    // truncated mid-frame
    assert(WebpAnim.decode(good.take(good.length / 2)) === None)
    // ANMF smaller than its own header
    val tiny = good.clone()
    tiny(anmf + 4) = 8; tiny(anmf + 5) = 0; tiny(anmf + 6) = 0
    assert(WebpAnim.decode(java.util.Arrays.copyOfRange(tiny, 0,
      anmf + 16)) === None)
    // hostile canvas dims: VP8X declaring 16k x 16k must reject before
    // allocating a 1 GiB canvas
    val huge = good.clone()
    huge(24) = -1; huge(25) = -1; huge(26) = 0 // cw-1 = 0xffff
    huge(27) = -1; huge(28) = -1; huge(29) = 0 // ch-1 = 0xffff
    assert(WebpAnim.decode(huge) === None)
    // the frames x canvas PRODUCT is capped too: each emitted frame
    // retains a full canvas, so a small file with many frames on a
    // large (individually-legal) canvas is a memory bomb. Over-budget
    // animations TRUNCATE to the budget-fitting prefix (real media
    // stays decodable); below two frames they stop being an animation
    assert(WebpAnim.decode(good, pixelBudget = 40 * 24 * 3 - 1)
      .map(_.length) === Some(2))
    assert(WebpAnim.decode(good, pixelBudget = 40 * 24 * 3)
      .map(_.length) === Some(3))
    assert(WebpAnim.decode(good, pixelBudget = 40 * 24 * 2 - 1) === None)
    // the truncated prefix is frame-exact: same canvases as the full
    // decode's first two frames
    val full = WebpAnim.decode(good).get
    val cut = WebpAnim.decode(good, pixelBudget = 40 * 24 * 3 - 1).get
    cut.zip(full).foreach { case (c, f) =>
      assert(c.durationMs === f.durationMs)
      assert((0 until c.image.getHeight).forall(y =>
        (0 until c.image.getWidth).forall(x =>
          c.image.getRGB(x, y) === f.image.getRGB(x, y))))
    }
  }

  test("a VP8X chunk larger than the minimal 10 bytes still walks to " +
    "the following chunks (size honored, not assumed)") {
    val good = resource("anim_replace.webp")
    // grow VP8X 10 -> 12: splice two zero bytes after its payload and
    // fix the RIFF size
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 16)
    out.write(Array[Byte](12, 0, 0, 0)) // new VP8X size
    out.write(good, 20, 10) // original VP8X payload
    out.write(Array[Byte](0, 0)) // extension bytes
    out.write(good, 30, good.length - 30)
    val b = out.toByteArray
    val riff = b.length - 8
    b(4) = riff.toByte; b(5) = (riff >> 8).toByte
    b(6) = (riff >> 16).toByte; b(7) = (riff >> 24).toByte
    val got = WebpAnim.decode(b).getOrElse(fail("padded VP8X rejected"))
    assert(got.length ===
      WebpAnim.decode(good).getOrElse(fail("good")).length)
  }

  test("mutation fuzz: corrupted animations decode to None or frames, " +
    "never an exception or a hang") {
    Seq("anim_replace", "anim_blend", "anim_lossy").foreach { name =>
      val good = resource(s"$name.webp")
      val rnd = new scala.util.Random(0xA211)
      for (trial <- 1 to 150) {
        val mutated = good.clone()
        // corrupt 1-4 bytes anywhere: container walk, ANMF headers,
        // frame payloads — every layer must fail closed
        for (_ <- 0 to rnd.nextInt(4)) {
          val at = 12 + rnd.nextInt(mutated.length - 12)
          mutated(at) = rnd.nextInt(256).toByte
        }
        // bounded await so a non-terminating decode FAILS the trial
        // instead of wedging the suite
        import scala.concurrent.ExecutionContext.Implicits.global
        scala.concurrent.Await.result(
          scala.concurrent.Future(WebpAnim.decode(mutated)),
          scala.concurrent.duration.Duration(5, "s"))
      }
    }
  }

  private def indexOfTag(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    var i = 12
    while (i + 4 <= b.length) {
      if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) &&
        b(i + 3) == t(3)) return i
      i += 1
    }
    fail(s"tag $tag not found")
  }
}
