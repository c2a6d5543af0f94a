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

  /** Decode a whole animation: full-canvas frames in display order.
    * None for stills (no ANIM/ANMF), malformed bytes, or any frame
    * whose payload fails to decode. */
  def decode(b: Array[Byte]): Option[Seq[Frame]] = try {
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
    if (new String(b, 12, 4, "ISO-8859-1") != "VP8X" || u32le(16) < 10)
      return None
    if ((b(20) & 0x02) == 0) return None // not an animation
    val cw = u24le(24) + 1
    val ch = u24le(27) + 1
    if (cw.toLong * ch > (1L << 24)) return None
    val canvas = new Array[Int](cw * ch) // ARGB, starts transparent
    val out = Seq.newBuilder[Frame]
    var n = 0
    var off = 12L + 18 // past the 8+10-byte VP8X chunk
    while (off + 8 <= b.length) {
      val i = off.toInt
      val tag = new String(b, i, 4, "ISO-8859-1")
      val size = u32le(i + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (tag == "ANMF") {
        if (size < 16) return None
        n += 1
        if (n > maxFrames) return None
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
    val frames = out.result()
    if (frames.isEmpty) None else Some(frames)
  } catch { case _: Exception => None }

  /** An ANMF payload is a regular still stream: optional ALPH, then
    * "VP8 " or "VP8L" — decoded by the same walkers the still path
    * uses. */
  private def decodeFramePayload(b: Array[Byte], start: Int,
      len: Int): Option[BufferedImage] = {
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val end = start.toLong + len
    var off = start.toLong
    var alphaAt = -1
    var alphaLen = -1
    while (off + 8 <= end) {
      val i = off.toInt
      val tag = new String(b, i, 4, "ISO-8859-1")
      val size = u32le(i + 4)
      if (size < 0 || off + 8 + size > end) return None
      if (tag == "VP8L") return Vp8l.decodeStream(b, i + 8)
      if (tag == "ALPH") { alphaAt = i + 8; alphaLen = size.toInt }
      if (tag == "VP8 ") {
        val frame = Vp8.decodeFrame(b, i + 8, size.toInt)
        if (alphaAt < 0) return frame
        return frame.flatMap { img =>
          Vp8l.decodeAlph(b, alphaAt, alphaLen, img.getWidth, img.getHeight)
            .map { plane =>
              val o = new BufferedImage(img.getWidth, img.getHeight,
                BufferedImage.TYPE_INT_ARGB)
              var j = 0
              while (j < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  o.setRGB(x, j, (plane(j * img.getWidth + x) << 24) |
                    (img.getRGB(x, j) & 0xffffff))
                  x += 1
                }
                j += 1
              }
              o
            }
        }
      }
      off += 8 + size + (size & 1)
    }
    None
  }

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
