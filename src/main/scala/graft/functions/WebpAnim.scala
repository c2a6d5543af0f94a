package graft.functions

import java.awt.image.BufferedImage

/** Animated WebP (VP8X + ANIM/ANMF chunks, the public container spec)
  * — frame reassembly over the existing pure-JVM decoders: each ANMF
  * payload is an ordinary ALPH?+("VP8 "|"VP8L") still stream decoded by
  * [[Vp8]]/[[Vp8l]], composited onto the canvas with the spec's
  * dispose/blend semantics.
  *
  * Compositing follows the container spec: the canvas starts fully
  * transparent; a frame either REPLACES its rectangle (blending method
  * 1) or alpha-blends over it (method 0) using the spec's
  * non-premultiplied src-over equation, here in libwebp's 8-bit integer
  * rounding (`blend_a = sa + da*(255-sa)/255`,
  * `scale = sa*255/blend_a`, channels interpolate by `scale`); after
  * the frame is emitted, disposal method 1 clears the frame rectangle
  * back to transparent. The ANIM background color is a player hint,
  * not part of pixel reassembly.
  *
  * Hostile-input posture matches the rest of the image surface:
  * Long-bounds chunk walking, a 2^24 canvas-pixel cap, a frame-count
  * cap, and frame rectangles validated against the canvas BEFORE any
  * allocation — malformed bytes return None, never throw or hang.
  *
  * Reference behavior: x/.../resizer.go accepts webp via its linked
  * codec; animation is the one WebP flavor stills don't cover. */
object WebpAnim {

  /** One reassembled canvas frame + its display duration. */
  final case class Frame(image: BufferedImage, durationMs: Int)

  private val maxFrames = 1024

  /** Cap on TOTAL retained canvas pixels (frames x canvas): each
    * emitted frame is a full-canvas ARGB snapshot (4 bytes/px), so
    * without a product cap a ~50 KB hostile file declaring a 4096x4096
    * canvas with 1024 one-pixel ANMF frames would demand ~69 GB — an
    * OutOfMemoryError no `catch Exception` sees. 2^26 px = 256 MB. */
  private val maxTotalPixels = 1L << 26

  /** Decode a whole animation: full-canvas frames in display order.
    * None for stills (no ANIM/ANMF), malformed bytes, or any frame
    * whose payload fails to decode. Animations LONGER than the
    * frame/pixel budget are TRUNCATED to the budget-fitting prefix
    * ([[GifAnim.decode]]'s contract — long real media stays decodable,
    * allocations stay bounded); `pixelBudget` is parameterized so the
    * spec can exercise the guard without allocating hundreds of MB. */
  def decode(b: Array[Byte],
      pixelBudget: Long = maxTotalPixels): Option[Seq[Frame]] = try {
    if (b == null || b.length < 30) return None
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def u24le(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'))
      return None
    // VP8X must come first with the animation flag set
    val vp8xSize = u32le(16)
    if (new String(b, 12, 4, "ISO-8859-1") != "VP8X" || vp8xSize < 10 ||
      20L + vp8xSize > b.length) return None
    if ((b(20) & 0x02) == 0) return None // not an animation
    val cw = u24le(24) + 1
    val ch = u24le(27) + 1
    if (cw.toLong * ch > (1L << 24)) return None
    val canvas = new Array[Int](cw * ch) // ARGB, starts transparent
    val out = Seq.newBuilder[Frame]
    var n = 0
    // past the VP8X chunk, whatever size it declares (padded to even)
    var off = 12L + 8 + vp8xSize + (vp8xSize & 1)
    while (off + 8 <= b.length) {
      val i = off.toInt
      val tag = new String(b, i, 4, "ISO-8859-1")
      val size = u32le(i + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (tag == "ANMF") {
        if (size < 16) return None
        n += 1
        if (n > maxFrames || n.toLong * cw * ch > pixelBudget)
          return Some(out.result()).filter(_.length >= 2)
        val fx = u24le(i + 8) * 2
        val fy = u24le(i + 11) * 2
        val fw = u24le(i + 14) + 1
        val fh = u24le(i + 17) + 1
        val dur = u24le(i + 20)
        val flags = b(i + 23) & 0xff
        val noBlend = (flags & 0x02) != 0
        val disposeBg = (flags & 0x01) != 0
        if (fx + fw > cw || fy + fh > ch) return None
        val frame = decodeFramePayload(b, i + 24, (size - 16).toInt)
          .getOrElse(return None)
        if (frame.getWidth != fw || frame.getHeight != fh) return None
        var y = 0
        while (y < fh) {
          var x = 0
          while (x < fw) {
            val src = frame.getRGB(x, y)
            val at = (fy + y) * cw + (fx + x)
            canvas(at) =
              if (noBlend) src else blend(src, canvas(at))
            x += 1
          }
          y += 1
        }
        val snap = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_ARGB)
        snap.setRGB(0, 0, cw, ch, canvas, 0, cw)
        out += Frame(snap, dur)
        if (disposeBg) {
          var yy = 0
          while (yy < fh) {
            java.util.Arrays.fill(canvas, (fy + yy) * cw + fx,
              (fy + yy) * cw + fx + fw, 0)
            yy += 1
          }
        }
      }
      off += 8 + size + (size & 1)
    }
    // fewer than 2 frames is a still wearing an ANIM chunk, not an
    // animation — the same bar GifAnim's n < 2 check and the truncation
    // path's filter apply, so all three exits agree
    Some(out.result()).filter(_.length >= 2)
  } catch { case _: Exception => None }

  /** An ANMF payload is a regular still stream: optional ALPH, then
    * "VP8 " or "VP8L" — ONE walker shared with the still container
    * path ([[Vp8l.decodeStillChunks]]), so bounds handling and alpha
    * merging cannot diverge between the two. */
  private def decodeFramePayload(b: Array[Byte], start: Int,
      len: Int): Option[BufferedImage] =
    Vp8l.decodeStillChunks(b, start.toLong, start.toLong + len)

  /** The spec's non-premultiplied src-over, in 8-bit integer rounding:
    * transparent src keeps dst; otherwise alpha accumulates and
    * channels interpolate by `sa*255/blend_a`. */
  private[functions] def blend(src: Int, dst: Int): Int = {
    val sa = (src >>> 24) & 0xff
    if (sa == 0) return dst
    if (sa == 255) return src
    val da = (dst >>> 24) & 0xff
    val blendA = sa + da * (255 - sa) / 255
    if (blendA == 0) return 0
    val scale = sa * 255 / blendA
    def ch(shift: Int): Int = {
      val s = (src >> shift) & 0xff
      val d = (dst >> shift) & 0xff
      (s * scale + d * (255 - scale)) / 255
    }
    (blendA << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }
}
