package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Round-trips generated VP8L streams through every decoder arm. The
  * mini-encoder below writes spec-conformant bitstreams (simple AND
  * code-length-coded prefix codes, LZ77 copies, color-cache refs, all
  * four transforms' data layouts) so the decoder is exercised against
  * the published bitstream format, not against itself. */
class Vp8lSpec extends AnyFunSuite {

  // --- bit writer (LSB-first, matching the spec's bit order) -----------

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << n; n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def writeBits(v: Int, bits: Int): Unit =
      (0 until bits).foreach(i => writeBit((v >> i) & 1))
    /** Prefix codes are consumed MSB-first by the tree walk. */
    def writeCode(code: Int, len: Int): Unit =
      ((len - 1) to 0 by -1).foreach(i => writeBit((code >> i) & 1))
    def bytes: Array[Byte] = {
      val out = buf.toArray
      if (n > 0) out :+ cur.toByte else out
    }
  }

  // --- canonical code assignment ---------------------------------------

  /** Uniform-length canonical codes: symbol (sorted order) i gets code i
    * at length ceil(log2(k)) — exactly what the decoder's canonical
    * construction yields for equal lengths. */
  private def canonical(symbols: Seq[Int]): Map[Int, (Int, Int)] = {
    val sorted = symbols.distinct.sorted
    val k = sorted.size
    var len = 1
    while ((1 << len) < k) len += 1
    sorted.zipWithIndex.map { case (s, i) => s -> (i, len) }.toMap
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Write one prefix-code definition. k=1 or (k=2, both<256) use the
    * simple form; anything else the code-length-coded normal form. */
  private def writeCodeDef(bw: BitWriter, alphabetSize: Int,
      used: Seq[Int]): Map[Int, (Int, Int)] = {
    val sorted = used.distinct.sorted
    if (sorted.isEmpty) { // unused channel: 1-symbol placeholder
      bw.writeBit(1); bw.writeBits(0, 1); bw.writeBits(1, 1); bw.writeBits(0, 8)
      return Map(0 -> (0, 0))
    }
    if (sorted.size == 1 && sorted.head < 256) {
      bw.writeBit(1); bw.writeBits(0, 1)
      bw.writeBits(1, 1); bw.writeBits(sorted.head, 8)
      return Map(sorted.head -> (0, 0)) // single symbol: zero bits
    }
    if (sorted.size == 2 && sorted(1) < 256) {
      bw.writeBit(1); bw.writeBits(1, 1)
      bw.writeBits(1, 1); bw.writeBits(sorted(0), 8)
      bw.writeBits(sorted(1), 8)
      return Map(sorted(0) -> (0, 1), sorted(1) -> (1, 1))
    }
    // normal form
    bw.writeBit(0)
    val codes = canonical(sorted)
    val lengths = Array.tabulate(alphabetSize)(
      i => codes.get(i).map(_._2).getOrElse(0))
    // RLE the length array into code-length symbols
    sealed trait Tok
    case class Lit(v: Int) extends Tok
    case class Zeros(n: Int) extends Tok
    val toks = scala.collection.mutable.ArrayBuffer[Tok]()
    var i = 0
    while (i < alphabetSize) {
      if (lengths(i) == 0) {
        var j = i
        while (j < alphabetSize && lengths(j) == 0) j += 1
        var run = j - i
        while (run > 0) {
          if (run >= 11) { val c = math.min(run, 138); toks += Zeros(c); run -= c }
          else if (run >= 3) { toks += Zeros(run); run = 0 }
          else { (0 until run).foreach(_ => toks += Lit(0)); run = 0 }
        }
        i = j
      } else { toks += Lit(lengths(i)); i += 1 }
    }
    val clUsed = toks.flatMap {
      case Lit(v) => Seq(v)
      case Zeros(n) => Seq(if (n >= 11) 18 else 17)
    }.distinct
    val cl = canonical(clUsed.toSeq)
    val posOf = ClOrder.zipWithIndex.toMap
    val num = math.max(4, clUsed.map(posOf).max + 1)
    bw.writeBits(num - 4, 4)
    (0 until num).foreach { j =>
      bw.writeBits(cl.get(ClOrder(j)).map(_._2).getOrElse(0), 3)
    }
    bw.writeBit(0) // no explicit max_symbol
    toks.foreach {
      case Lit(v) =>
        val (c, l) = cl(v); bw.writeCode(c, l)
      case Zeros(n) if n >= 11 =>
        val (c, l) = cl(18); bw.writeCode(c, l); bw.writeBits(n - 11, 7)
      case Zeros(n) =>
        val (c, l) = cl(17); bw.writeCode(c, l); bw.writeBits(n - 3, 3)
    }
    codes
  }

  // --- LZ77 prefix values ------------------------------------------------

  /** value -> (prefix code, extra-bits value, extra-bits count). */
  private def prefix(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val extra = (code - 2) >> 1
        val lo = ((2 + (code & 1)) << extra) + 1
        val hi = lo + (1 << extra) - 1
        if (v >= lo && v <= hi) return (code, v - lo, extra)
        code += 1
      }
      fail(s"no prefix code for $v")
    }
  }

  // --- token stream ------------------------------------------------------

  private sealed trait Op
  private case class Literal(argb: Int) extends Op
  private case class Copy(len: Int, dist: Int) extends Op
  private case class CacheRef(idx: Int) extends Op

  /** Encode the entropy-coded pixel body (cache bit, no meta, 5 codes,
    * tokens). Used for the main image AND transform sub-images — the
    * decoder reads the same layout for both (minus transform/meta bits,
    * which the caller writes). */
  private def writeBody(bw: BitWriter, ops: Seq[Op], cacheBits: Int,
      level0: Boolean = false): Unit = {
    if (cacheBits > 0) { bw.writeBit(1); bw.writeBits(cacheBits, 4) }
    else bw.writeBit(0)
    if (level0) bw.writeBit(0) // no meta-prefix image
    val greens = ops.map {
      case Literal(p) => (p >> 8) & 0xff
      case Copy(len, _) => 256 + prefix(len)._1
      case CacheRef(i) => 280 + i
    }
    val lits = ops.collect { case Literal(p) => p }
    val dists = ops.collect { case Copy(_, d) => prefix(d + 120)._1 }
    val g = writeCodeDef(bw, 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0),
      greens)
    val r = writeCodeDef(bw, 256, lits.map(p => (p >> 16) & 0xff))
    val b = writeCodeDef(bw, 256, lits.map(p => p & 0xff))
    val a = writeCodeDef(bw, 256, lits.map(p => (p >>> 24) & 0xff))
    val d = writeCodeDef(bw, 40, dists)
    def emit(m: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = m(sym); bw.writeCode(c, l)
    }
    ops.foreach {
      case Literal(p) =>
        emit(g, (p >> 8) & 0xff)
        emit(r, (p >> 16) & 0xff)
        emit(b, p & 0xff)
        emit(a, (p >>> 24) & 0xff)
      case Copy(len, dist) =>
        val (lc, lev, leb) = prefix(len)
        emit(g, 256 + lc); bw.writeBits(lev, leb)
        val (dc, dev, deb) = prefix(dist + 120)
        emit(d, dc); bw.writeBits(dev, deb)
      case CacheRef(i) => emit(g, 280 + i)
    }
  }

  /** Full RIFF/WEBP/VP8L container around a header + transform bits +
    * body written by `payload`. */
  private def container(w: Int, h: Int)(payload: BitWriter => Unit)
      : Array[Byte] = {
    val bw = new BitWriter
    bw.writeBits(w - 1, 14); bw.writeBits(h - 1, 14)
    bw.writeBit(0) // alpha hint
    bw.writeBits(0, 3) // version
    payload(bw)
    val body = 0x2f.toByte +: bw.bytes
    val chunk = body ++ (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val out = java.nio.ByteBuffer.allocate(12 + 8 + chunk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(4 + 8 + chunk.length)
    out.put("WEBP".getBytes); out.put("VP8L".getBytes)
    out.putInt(body.length)
    out.put(chunk)
    out.array()
  }

  private def decodePixels(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    val img = Vp8l.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.getWidth === w && img.getHeight === h)
    img.getRGB(0, 0, w, h, null, 0, w)
  }

  private val C1 = 0xff2040c0 // a=ff r=20 g=40 b=c0
  private val C2 = 0xff80ff10

  test("literal-only stream round-trips (simple 2-symbol codes)") {
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => if (i % 2 == 0) C1 else C2)
    val bytes = container(w, h) { bw =>
      bw.writeBit(0) // no transforms
      writeBody(bw, px.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("normal (code-length-coded) prefix codes round-trip") {
    val w = 8; val h = 2
    // four distinct greens force the normal-form green code
    val colors = Array(0xff102030, 0xff405060, 0xff708090, 0xffa0b0c1)
    val px = Array.tabulate(w * h)(i => colors(i % 4))
    val bytes = container(w, h) { bw =>
      bw.writeBit(0)
      writeBody(bw, px.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("LZ77 backward references (copy spanning rows) round-trip") {
    val w = 7; val h = 5
    val row = Array.tabulate(w)(i => if (i < 3) C1 else C2)
    val px = Array.tabulate(w * h)(i => row(i % w))
    val ops = row.map(Literal(_)).toSeq :+ Copy(w * (h - 1), w)
    val bytes = container(w, h) { bw =>
      bw.writeBit(0)
      writeBody(bw, ops, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("color-cache references round-trip") {
    val cacheBits = 4
    def hash(p: Int): Int = (0x1e35a7bd * p) >>> (32 - cacheBits)
    val w = 4; val h = 2
    val px = Array(C1, C2, C1, C2, C2, C1, C2, C1)
    // first occurrences are literals, repeats hit the simulated cache
    val cache = new Array[Int](1 << cacheBits)
    val seen = scala.collection.mutable.Set[Int]()
    val ops = px.map { p =>
      val idx = hash(p)
      val op =
        if (seen(p) && cache(idx) == p) CacheRef(idx) else Literal(p)
      cache(idx) = p; seen += p
      op
    }.toSeq
    assert(ops.count(_.isInstanceOf[CacheRef]) >= 4, "cache never exercised")
    val bytes = container(w, h) { bw =>
      bw.writeBit(0)
      writeBody(bw, ops, cacheBits, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("subtract-green transform inverts") {
    val w = 4; val h = 2
    val px = Array.tabulate(w * h)(i => if (i < 4) C1 else C2)
    val fwd = px.map { p =>
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) - g) & 0xff
      val b = ((p & 0xff) - g) & 0xff
      (p & 0xff00ff00) | (r << 16) | b
    }
    val bytes = container(w, h) { bw =>
      bw.writeBit(1); bw.writeBits(2, 2) // SUBTRACT_GREEN
      bw.writeBit(0) // no more transforms
      writeBody(bw, fwd.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("color-indexing transform with sub-byte bundling inverts") {
    val w = 13; val h = 3 // 2 colors -> 8 px/byte, packedW = 2
    val palette = Array(C1, C2)
    val idx = Array.tabulate(w * h)(i => (i / 3) % 2)
    val px = idx.map(palette(_))
    // palette sub-image rides delta-coded
    val deltas = palette.zipWithIndex.map { case (p, i) =>
      if (i == 0) p
      else {
        val q = palette(i - 1)
        def ch(sh: Int) = (((p >>> sh) & 0xff) - ((q >>> sh) & 0xff)) & 0xff
        (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      }
    }
    val packedW = (w + 7) / 8
    val packed = Array.tabulate(packedW * h) { pi =>
      val y = pi / packedW; val xb = pi % packedW
      var byte = 0
      (0 until 8).foreach { j =>
        val x = xb * 8 + j
        if (x < w) byte |= idx(y * w + x) << j
      }
      0xff000000 | (byte << 8) // index rides the green channel
    }
    val bytes = container(w, h) { bw =>
      bw.writeBit(1); bw.writeBits(3, 2) // COLOR_INDEXING
      bw.writeBits(palette.length - 1, 8)
      writeBody(bw, deltas.map(Literal(_)).toSeq, cacheBits = 0)
      bw.writeBit(0) // no more transforms
      writeBody(bw, packed.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("predictor transform (left mode) inverts") {
    val w = 6; val h = 4
    val sizeBits = 2 // 4x4 blocks -> one block column x one block row grid
    val bw4 = (w + 3) >> 2; val bh4 = (h + 3) >> 2
    val row = Array.tabulate(w)(_ => C1) // constant rows: L-residuals 0
    val px = Array.tabulate(w * h)(i => row(i % w))
    // residuals under the border rules + mode 1 (Left) inside:
    def sub(a: Int, b: Int): Int = {
      def ch(sh: Int) = (((a >>> sh) & 0xff) - ((b >>> sh) & 0xff)) & 0xff
      (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
    val res = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val pred =
        if (x == 0 && y == 0) 0xff000000
        else if (y == 0) px(i - 1)
        else if (x == 0) px(i - w)
        else px(i - 1) // mode 1 everywhere
      sub(px(i), pred)
    }
    val modes = Array.fill(bw4 * bh4)(0xff000000 | (1 << 8)) // mode=green
    val bytes = container(w, h) { bw =>
      bw.writeBit(1); bw.writeBits(0, 2) // PREDICTOR
      bw.writeBits(sizeBits - 2, 3)
      writeBody(bw, modes.map(Literal(_)).toSeq, cacheBits = 0)
      bw.writeBit(0)
      writeBody(bw, res.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("cross-color transform inverts") {
    val w = 4; val h = 4
    val sizeBits = 2
    val px = Array.tabulate(w * h)(i => if (i % 3 == 0) C1 else C2)
    val g2r = 0x40; val g2b = 0x20; val r2b = 0x10
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    val fwd = px.map { p =>
      val g = (p >> 8) & 0xff
      val r0 = (p >> 16) & 0xff
      val b0 = p & 0xff
      val r = (r0 - delta(g2r, g)) & 0xff
      val b = (b0 - delta(g2b, g) - delta(r2b, r0)) & 0xff
      (p & 0xff00ff00) | (r << 16) | b
    }
    val cte = 0xff000000 | (r2b << 16) | (g2b << 8) | g2r
    val bytes = container(w, h) { bw =>
      bw.writeBit(1); bw.writeBits(1, 2) // COLOR (cross-color)
      bw.writeBits(sizeBits - 2, 3)
      writeBody(bw, Seq(Literal(cte)), cacheBits = 0) // one 4x4 block
      bw.writeBit(0)
      writeBody(bw, fwd.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    assert(decodePixels(bytes, w, h) === px)
  }

  test("meta-prefix image selects per-tile prefix groups") {
    val w = 8; val h = 4
    val metaBits = 2 // 4x4 tiles -> 2x1 tile grid
    // left tile pixels come from group 0 (solid C1), right from group 1
    // (solid C2) — each group's codes are single-symbol, so a group mixup
    // decodes to the wrong color rather than failing
    val px = Array.tabulate(w * h)(i => if (i % w < 4) C1 else C2)
    val bw = new BitWriter
    bw.writeBits(w - 1, 14); bw.writeBits(h - 1, 14)
    bw.writeBit(0); bw.writeBits(0, 3)
    bw.writeBit(0) // no transforms
    bw.writeBit(0) // no color cache
    bw.writeBit(1) // meta-prefix image present
    bw.writeBits(metaBits - 2, 3)
    // the 2x1 meta image: group index rides (red<<8 | green)
    writeBody(bw, Seq(Literal(0xff000000), Literal(0xff000100)),
      cacheBits = 0)
    // group 0: all codes single-symbol for C1; group 1: for C2; both
    // written in green/red/blue/alpha/distance order
    Seq(C1, C2).foreach { c =>
      Seq((c >> 8) & 0xff, (c >> 16) & 0xff, c & 0xff, (c >>> 24) & 0xff, 0)
        .foreach { sym =>
          bw.writeBit(1); bw.writeBits(0, 1); bw.writeBits(1, 1)
          bw.writeBits(sym, 8)
        }
    }
    // zero bits per pixel: both groups are fully single-symbol
    val body = 0x2f.toByte +: bw.bytes
    val chunk = body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val out = java.nio.ByteBuffer.allocate(12 + 8 + chunk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(4 + 8 + chunk.length)
    out.put("WEBP".getBytes); out.put("VP8L".getBytes)
    out.putInt(body.length); out.put(chunk)
    assert(decodePixels(out.array(), w, h) === px)
  }

  test("VP8X-wrapped lossless files decode (chunk walk)") {
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => if (i % 2 == 0) C1 else C2)
    val bare = container(w, h) { bw =>
      bw.writeBit(0)
      writeBody(bw, px.map(Literal(_)).toSeq, cacheBits = 0, level0 = true)
    }
    // splice a VP8X chunk between "WEBP" and the VP8L chunk
    val vp8x = "VP8X".getBytes ++
      Array[Byte](10, 0, 0, 0) ++ // chunk size 10 LE
      Array[Byte](0, 0, 0, 0,
        (w - 1).toByte, 0, 0, (h - 1).toByte, 0, 0)
    val riffBody = bare.slice(8, 12) ++ vp8x ++ bare.drop(12)
    val out = java.nio.ByteBuffer.allocate(8 + riffBody.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(riffBody.length)
    out.put(riffBody)
    assert(decodePixels(out.array(), w, h) === px)
  }

  test("lossy (VP8 ) and malformed payloads return None, never throw") {
    val junk = "RIFF0000WEBPVP8 ".getBytes ++ Array.fill(32)(0x5a.toByte)
    assert(Vp8l.decode(junk).isEmpty)
    assert(Vp8l.decode(Array[Byte](1, 2, 3)).isEmpty)
    // two distinct literals force bit-consuming codes, so the missing
    // 14 pixels hit end-of-stream instead of free-decoding a 1-symbol
    // code forever
    val truncated = container(4, 4) { bw =>
      bw.writeBit(0)
      writeBody(bw, Seq(Literal(C1), Literal(C2)), cacheBits = 0, level0 = true)
    }
    assert(Vp8l.decode(truncated).isEmpty)
  }

  test("hostile chunk sizes and bad magic return None (no hang, no " +
    "backward walk)") {
    // chunk size 0xFFFFFFFF: as a signed Int the even-pad arithmetic
    // would step the walker BACKWARDS and loop forever
    val huge = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.put("RIFF".getBytes); huge.putInt(24); huge.put("WEBP".getBytes)
    huge.put("JUNK".getBytes); huge.putInt(0xffffffff)
    huge.put(Array.fill(8)(0.toByte))
    assert(Vp8l.decode(huge.array()).isEmpty)
    // a size that points past the buffer must bail, not scan on
    val over = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    over.put("RIFF".getBytes); over.putInt(24); over.put("WEBP".getBytes)
    over.put("JUNK".getBytes); over.putInt(1 << 20)
    over.put(Array.fill(8)(0.toByte))
    assert(Vp8l.decode(over.array()).isEmpty)
    // 20+ bytes but not a RIFF/WEBP container at all
    assert(Vp8l.decode(Array.fill(64)(0x41.toByte)).isEmpty)
  }
}
