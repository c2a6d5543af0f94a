package graft.functions

import java.awt.image.BufferedImage

/** Pure-JVM decoder for VP8L — WebP's LOSSLESS bitstream (the format
  * behind `golang.org/x/image/webp`'s lossless arm, which the reference
  * uses to decode webp before resizing, x/imgresizer/resizer.go:244-247).
  * Implements the published "WebP Lossless Bitstream Specification":
  * LSB-first bit reading, canonical prefix codes (simple and
  * code-length-coded), the LZ77 + color-cache backward references, the
  * meta-prefix entropy image, and all four inverse transforms
  * (predictor with its 14 modes, cross-color, subtract-green,
  * color-indexing with sub-byte pixel bundling).
  *
  * Lossy webp (the "VP8 " chunk) is a DCT codec this environment does
  * not ship and stays undecoded — [[decode]] returns None for it, as it
  * does for any malformed stream (callers treat that as "no codec",
  * never an exception). Vp8lSpec round-trips generated streams through
  * every arm; WebpSpec drives the image pipeline end-to-end.
  */
object Vp8l {

  // --- bit reader (LSB-first within each byte) ---------------------------

  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var bit = 0
    def readBit(): Int = {
      if (pos >= b.length) throw new IllegalStateException("EOS")
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  // --- canonical prefix codes --------------------------------------------

  /** Decode table from code lengths (deflate-style canonical codes,
    * walked bit-by-bit MSB-first). A single-symbol code costs 0 bits. */
  private final class Huffman(lengths: Array[Int]) {
    private val single: Int = {
      var s = -1; var n = 0; var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { n += 1; s = i }; i += 1
      }
      if (n == 1) s else -1
    }
    // (length, code) -> symbol, as a map keyed by (len << 16) | code
    private val table: java.util.HashMap[Integer, Integer] = {
      val m = new java.util.HashMap[Integer, Integer]()
      if (single < 0) {
        val maxLen = lengths.max
        val blCount = new Array[Int](maxLen + 1)
        lengths.foreach(l => if (l > 0) blCount(l) += 1)
        val nextCode = new Array[Int](maxLen + 1)
        var code = 0
        (1 to maxLen).foreach { l =>
          code = (code + blCount(l - 1)) << 1
          nextCode(l) = code
        }
        lengths.zipWithIndex.foreach { case (l, sym) =>
          if (l > 0) {
            m.put(Integer.valueOf((l << 16) | nextCode(l)), Integer.valueOf(sym))
            nextCode(l) += 1
          }
        }
      }
      m
    }
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len <= 15) {
        code = (code << 1) | br.readBit()
        len += 1
        val sym = table.get(Integer.valueOf((len << 16) | code))
        if (sym != null) return sym.intValue()
      }
      throw new IllegalStateException("bad prefix code")
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: 1-bit simple form (1-2 symbols) or the
    * code-length-coded normal form with 16/17/18 repeats. */
  private def readCode(br: BitReader, alphabetSize: Int): Huffman = {
    val lengths = new Array[Int](alphabetSize)
    if (br.readBit() == 1) { // simple
      val numSymbols = br.readBit() + 1
      val first =
        if (br.readBit() == 1) br.readBits(8) else br.readBit()
      lengths(first) = 1
      if (numSymbols == 2) lengths(br.readBits(8)) = 1
    } else {
      val clLengths = new Array[Int](19)
      val numCl = 4 + br.readBits(4)
      (0 until numCl).foreach(i => clLengths(ClOrder(i)) = br.readBits(3))
      val cl = new Huffman(clLengths)
      var maxSymbol =
        if (br.readBit() == 1) {
          val nBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nBits)
        } else alphabetSize
      var symbol = 0
      var prev = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cLen = cl.read(br)
        if (cLen < 16) {
          lengths(symbol) = cLen; symbol += 1
          if (cLen != 0) prev = cLen
        } else {
          val (repeat, value) = cLen match {
            case 16 => (3 + br.readBits(2), prev)
            case 17 => (3 + br.readBits(3), 0)
            case _ => (11 + br.readBits(7), 0)
          }
          val end = math.min(alphabetSize, symbol + repeat)
          while (symbol < end) { lengths(symbol) = value; symbol += 1 }
        }
      }
    }
    new Huffman(lengths)
  }

  // --- LZ77 distance mapping ----------------------------------------------

  /** The spec's 120-entry 2D proximity map: (dx, dy) pairs, dist =
    * dy*width + dx (clamped to >= 1). */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def prefixValue(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }

  private def planeCodeToDistance(w: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      math.max(1, dy * w + dx)
    }

  // --- transforms -----------------------------------------------------

  private sealed trait Transform
  private final case class Predictor(sizeBits: Int, data: Array[Int])
      extends Transform
  private final case class CrossColor(sizeBits: Int, data: Array[Int])
      extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndex(widthBits: Int, palette: Array[Int])
      extends Transform

  // --- entropy-coded image ----------------------------------------------

  /** Decode one spatially-coded image. `level0` enables the transform
    * and meta-prefix layers (sub-resolution images have neither, but DO
    * have their own color cache). Returns pixels + the width the pixel
    * stream was decoded at (color indexing packs sub-byte pixels). */
  private def decodeImage(br: BitReader, width: Int, height: Int,
      level0: Boolean): (Array[Int], Int, List[Transform]) = {
    var w = width
    var transforms = List.empty[Transform]
    if (level0) {
      var seen = Set.empty[Int]
      while (br.readBit() == 1) {
        val t = br.readBits(2)
        require(!seen(t), s"transform $t repeated")
        seen += t
        t match {
          case 0 | 1 =>
            val sizeBits = br.readBits(3) + 2
            val bw = (w + (1 << sizeBits) - 1) >> sizeBits
            val bh = (height + (1 << sizeBits) - 1) >> sizeBits
            val (data, _, _) = decodeImage(br, bw, bh, level0 = false)
            transforms ::=
              (if (t == 0) Predictor(sizeBits, data)
               else CrossColor(sizeBits, data))
          case 2 => transforms ::= SubtractGreen
          case _ =>
            val n = br.readBits(8) + 1
            val (raw, _, _) = decodeImage(br, n, 1, level0 = false)
            // palette rides delta-coded: each entry adds to the previous
            val palette = new Array[Int](n)
            var prev = 0
            (0 until n).foreach { i =>
              val p = raw(i)
              val a = (((prev >>> 24) + (p >>> 24)) & 0xff) << 24
              val r = ((((prev >> 16) & 0xff) + ((p >> 16) & 0xff)) & 0xff) << 16
              val g = ((((prev >> 8) & 0xff) + ((p >> 8) & 0xff)) & 0xff) << 8
              val b = (((prev & 0xff) + (p & 0xff)) & 0xff)
              palette(i) = a | r | g | b
              prev = palette(i)
            }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transforms ::= ColorIndex(widthBits, palette)
            w = (w + (1 << widthBits) - 1) >> widthBits
        }
      }
    }

    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    require(cacheBits <= 11, s"color cache bits $cacheBits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))

    // meta-prefix image: per-tile prefix-group indices (level 0 only)
    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (level0 && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val mh = (height + (1 << metaBits) - 1) >> metaBits
      val (m, _, _) = decodeImage(br, metaW, mh, level0 = false)
      meta = m.map(p => (p >> 8) & 0xffff)
      numGroups = meta.max + 1
    }

    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      Array(readCode(br, greenAlphabet), readCode(br, 256),
        readCode(br, 256), readCode(br, 256), readCode(br, 40))
    }

    val pixels = new Array[Int](w * height)
    def insertCache(argb: Int): Unit =
      if (cacheBits > 0)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb

    var pos = 0
    val n = w * height
    while (pos < n) {
      val g =
        if (meta == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          groups(meta((y >> metaBits) * metaW + (x >> metaBits)))
        }
      val s = g(0).read(br)
      if (s < 256) {
        val red = g(1).read(br)
        val blue = g(2).read(br)
        val alpha = g(3).read(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        pixels(pos) = px
        insertCache(px)
        pos += 1
      } else if (s < 256 + 24) {
        val length = prefixValue(br, s - 256)
        val distCode = prefixValue(br, g(4).read(br))
        val dist = planeCodeToDistance(w, distCode)
        require(dist <= pos && pos + length <= n,
          s"LZ77 reference out of range (pos=$pos dist=$dist len=$length)")
        var i = 0
        while (i < length) {
          pixels(pos) = pixels(pos - dist)
          insertCache(pixels(pos))
          pos += 1; i += 1
        }
      } else {
        require(cacheBits > 0, "cache symbol without a color cache")
        pixels(pos) = cache(s - 256 - 24)
        pos += 1
      }
    }
    (pixels, w, transforms)
  }

  // --- inverse transforms ------------------------------------------------

  private def addPixels(a: Int, b: Int): Int = {
    val aa = ((a >>> 24) + (b >>> 24)) & 0xff
    val rr = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val gg = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = ((a >>> 24) + (b >>> 24)) / 2
    val rr = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2
    val gg = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2
    val bb = ((a & 0xff) + (b & 0xff)) / 2
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }

  private def select(a: Int, b: Int, c: Int): Int = {
    def sub3(x: Int, y: Int, z: Int) = math.abs(y - z) - math.abs(x - z)
    val d = sub3(a >>> 24, b >>> 24, c >>> 24) +
      sub3((a >> 16) & 0xff, (b >> 16) & 0xff, (c >> 16) & 0xff) +
      sub3((a >> 8) & 0xff, (b >> 8) & 0xff, (c >> 8) & 0xff) +
      sub3(a & 0xff, b & 0xff, c & 0xff)
    if (d <= 0) a else b
  }

  private def clamp255(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int) = clamp255(
      ((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(a: Int, c: Int): Int = {
    def ch(sh: Int) = {
      val av = (a >>> sh) & 0xff
      clamp255(av + (av - ((c >>> sh) & 0xff)) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def applyPredictorInverse(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, data: Array[Int]): Unit = {
    val bw = (w + (1 << sizeBits) - 1) >> sizeBits
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1)
          else if (x == 0) px(pos - w)
          else {
            val mode = (data((y >> sizeBits) * bw + (x >> sizeBits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // for the last column top-right reads one past the top row,
            // which in the contiguous buffer is THIS row's first pixel —
            // the reference decoders' exact (already-decoded) behavior
            val tr = px(pos - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(avg2(l, t), tl)
              case _ => 0xff000000
            }
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1
      }
      y += 1
    }
  }

  /** (int8 t * int8 c) >> 5 — both operands sign-extended. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def applyCrossColorInverse(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, data: Array[Int]): Unit = {
    val bw = (w + (1 << sizeBits) - 1) >> sizeBits
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = data((y >> sizeBits) * bw + (x >> sizeBits))
        val greenToRed = cte & 0xff
        val greenToBlue = (cte >> 8) & 0xff
        val redToBlue = (cte >> 16) & 0xff
        val pos = y * w + x
        val p = px(pos)
        val green = (p >> 8) & 0xff
        var red = (p >> 16) & 0xff
        var blue = p & 0xff
        red = (red + ctDelta(greenToRed, green)) & 0xff
        blue = (blue + ctDelta(greenToBlue, green)) & 0xff
        blue = (blue + ctDelta(redToBlue, red)) & 0xff
        px(pos) = (p & 0xff00ff00) | (red << 16) | blue
        x += 1
      }
      y += 1
    }
  }

  private def applySubtractGreenInverse(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  private def applyColorIndexInverse(px: Array[Int], packedW: Int, h: Int,
      fullW: Int, widthBits: Int, palette: Array[Int]): Array[Int] = {
    if (widthBits == 0)
      return px.map(p => paletteAt(palette, (p >> 8) & 0xff))
    val bitsPerPixel = 8 >> widthBits
    val mask = (1 << bitsPerPixel) - 1
    val out = new Array[Int](fullW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < fullW) {
        val packed = (px(y * packedW + (x >> widthBits)) >> 8) & 0xff
        val idx = (packed >> (bitsPerPixel * (x & ((1 << widthBits) - 1)))) & mask
        out(y * fullW + x) = paletteAt(palette, idx)
        x += 1
      }
      y += 1
    }
    out
  }

  private def paletteAt(palette: Array[Int], i: Int): Int =
    if (i < palette.length) palette(i) else 0

  // --- entry points --------------------------------------------------------

  /** Decode a bare VP8L stream (starting at its 0x2f signature byte). */
  def decodeStream(b: Array[Byte], off: Int): Option[BufferedImage] = try {
    if (off >= b.length || (b(off) & 0xff) != 0x2f) return None
    val br = new BitReader(b, off + 1)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBit() // alpha-is-used hint
    if (br.readBits(3) != 0) return None // version must be 0

    val (decoded, decodedW, transforms) = decodeImage(br, w, h, level0 = true)
    // inverse transforms run in reverse read order (transforms was
    // built by prepending, so it is already last-read-first)
    var px = decoded
    var curW = decodedW
    transforms.foreach {
      case ColorIndex(wb, palette) =>
        px = applyColorIndexInverse(px, curW, h, w, wb, palette)
        curW = w
      case Predictor(sb, data) => applyPredictorInverse(px, curW, h, sb, data)
      case CrossColor(sb, data) => applyCrossColorInverse(px, curW, h, sb, data)
      case SubtractGreen => applySubtractGreenInverse(px)
    }
    require(curW == w, "color-indexed stream never unbundled")

    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    Some(img)
  } catch { case _: Exception => None }

  /** Decode a HEADERLESS VP8L substream — the ALPH chunk's lossless
    * coding: dimensions come from the carrier frame, the stream starts
    * directly at the level-0 image data (transforms allowed), and the
    * GREEN channel carries the plane values. */
  private def decodeHeadlessGreen(b: Array[Byte], off: Int, w: Int,
      h: Int): Option[Array[Int]] = try {
    val br = new BitReader(b, off)
    val (decoded, decodedW, transforms) = decodeImage(br, w, h, level0 = true)
    var px = decoded
    var curW = decodedW
    transforms.foreach {
      case ColorIndex(wb, palette) =>
        px = applyColorIndexInverse(px, curW, h, w, wb, palette)
        curW = w
      case Predictor(sb, data) => applyPredictorInverse(px, curW, h, sb, data)
      case CrossColor(sb, data) => applyCrossColorInverse(px, curW, h, sb, data)
      case SubtractGreen => applySubtractGreenInverse(px)
    }
    if (curW != w) return None
    Some(px.map(p => (p >> 8) & 0xff))
  } catch { case _: Exception => None }

  /** Decode a webp ALPH chunk to the w*h alpha plane (container spec:
    * header byte = reserved[7:6] preprocessing[5:4] filter[3:2]
    * compression[1:0]; compression 0 = raw bytes, 1 = headerless VP8L;
    * filters 1-3 are the horizontal/vertical/gradient per-row
    * predictors, inverted here with the reference decoder's border
    * rules). Pre-processing 1 (lossy level reduction) is refused — the
    * plane would need the smoothing reconstruction, and stills encoded
    * with lossless alpha (the default) never set it. */
  private[functions] def decodeAlph(b: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[Array[Int]] = {
    if (len < 1 || off + len > b.length) return None
    val hdr = b(off) & 0xff
    val compression = hdr & 3
    val filter = (hdr >> 2) & 3
    val pre = (hdr >> 4) & 3
    if (pre != 0) return None
    val raw: Array[Int] = compression match {
      case 0 =>
        if (len - 1 < w * h) return None
        Array.tabulate(w * h)(i => b(off + 1 + i) & 0xff)
      case 1 =>
        decodeHeadlessGreen(b, off + 1, w, h) match {
          case Some(p) => p
          case None => return None
        }
      case _ => return None
    }
    // unfilter in place, row-major; first row has no `prev`
    if (filter != 0) {
      var j = 0
      while (j < h) {
        val row = j * w
        val prev = row - w
        if (j == 0 || filter == 1) { // horizontal (row 0 of v/gradient too)
          var pred = if (j == 0) 0 else raw(prev)
          var i = 0
          while (i < w) {
            pred = (pred + raw(row + i)) & 0xff
            raw(row + i) = pred
            i += 1
          }
        } else if (filter == 2) { // vertical
          var i = 0
          while (i < w) {
            raw(row + i) = (raw(prev + i) + raw(row + i)) & 0xff
            i += 1
          }
        } else { // gradient
          var left = raw(prev)
          var topLeft = raw(prev)
          var i = 0
          while (i < w) {
            val top = raw(prev + i)
            val g = left + top - topLeft
            val p = if (g < 0) 0 else if (g > 255) 255 else g
            left = (raw(row + i) + p) & 0xff
            raw(row + i) = left
            topLeft = top
            i += 1
          }
        }
        j += 1
      }
    }
    Some(raw)
  }

  /** Decode a RIFF-contained webp: walks the chunks (VP8X-wrapped files
    * included) to a "VP8L" (lossless, this object) or "VP8 " (lossy
    * keyframe, [[Vp8]]) payload — both decode pure-JVM. A preceding
    * "ALPH" chunk (lossy + alpha) decodes through [[decodeAlph]] and
    * merges into the frame's alpha channel. */
  def decode(b: Array[Byte]): Option[BufferedImage] = {
    if (b == null || b.length < 20) return None
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    // Chunk sizes are attacker-controlled: arithmetic stays in Long and a
    // size that would step backwards or past the buffer returns None
    // (malformed bytes must never hang or throw).
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'))
      return None
    var off = 12L
    var alphaAt = -1
    var alphaLen = -1
    while (off + 8 <= b.length) {
      val i = off.toInt
      val tag = new String(b, i, 4, "ISO-8859-1")
      val size = u32le(i + 4)
      if (tag == "VP8L") return decodeStream(b, i + 8)
      if (size < 0 || off + 8 + size > b.length) return None
      if (tag == "ANMF" && size >= 16) {
        // animation frame: descend past the 16-byte ANMF header so the
        // FIRST frame's ALPH/VP8/VP8L subchunks decode as the still
        // ([[WebpAnim.decode]] reassembles the full sequence)
        off += 8 + 16
      } else {
      if (tag == "ALPH") { alphaAt = i + 8; alphaLen = size.toInt }
      if (tag == "VP8 ") { // lossy still: keyframe decode ([[Vp8]])
        val frame = Vp8.decodeFrame(b, i + 8, size.toInt)
        if (alphaAt < 0) return frame
        return frame.flatMap { img =>
          decodeAlph(b, alphaAt, alphaLen, img.getWidth, img.getHeight)
            .map(mergeAlpha(img, _))
          // undecodable alpha on a well-formed frame: malformed file
        }
      }
      off += 8 + size + (size & 1) // chunks are even-padded
      }
    }
    None
  }

  /** Merge an 8-bit alpha plane into a frame's color pixels. ONE
    * definition shared by the still walker above and the animation
    * reassembly ([[WebpAnim]]), so alpha semantics cannot diverge. */
  private[functions] def mergeAlpha(img: BufferedImage,
      plane: Array[Int]): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_ARGB)
    var j = 0
    while (j < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        out.setRGB(x, j, (plane(j * img.getWidth + x) << 24) |
          (img.getRGB(x, j) & 0xffffff))
        x += 1
      }
      j += 1
    }
    out
  }

  /** Walk an `ALPH? + ("VP8 " | "VP8L")` chunk sequence within
    * `[start, end)` — the payload shape an ANMF animation frame
    * carries (container spec: a frame body is an ordinary still). */
  private[functions] def decodeStillChunks(b: Array[Byte], start: Long,
      end: Long): Option[BufferedImage] = {
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    var off = start
    var alphaAt = -1
    var alphaLen = -1
    while (off + 8 <= end) {
      val i = off.toInt
      val tag = new String(b, i, 4, "ISO-8859-1")
      val size = u32le(i + 4)
      if (size < 0 || off + 8 + size > end) return None
      if (tag == "VP8L") return decodeStream(b, i + 8)
      if (tag == "ALPH") { alphaAt = i + 8; alphaLen = size.toInt }
      if (tag == "VP8 ") {
        val frame = Vp8.decodeFrame(b, i + 8, size.toInt)
        if (alphaAt < 0) return frame
        return frame.flatMap { img =>
          decodeAlph(b, alphaAt, alphaLen, img.getWidth, img.getHeight)
            .map(mergeAlpha(img, _))
        }
      }
      off += 8 + size + (size & 1)
    }
    None
  }
}
