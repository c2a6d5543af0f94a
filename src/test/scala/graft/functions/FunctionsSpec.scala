package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class FunctionsSpec extends SparkSpec {
  import graft.functions.{BinaryFunctions => B, CoinFunctions => C,
    JsonFunctions => J, VectorFunctions => V}

  test("nfc normalization: decomposed sequences compose, idempotent, " +
    "null-safe, codegen == interpreted") {
    import spark.implicits._
    import graft.functions.TextFunctions.nfc
    val rows = Seq(
      "Cafe\u0301",   // e + combining acute -> \u00e9
      "nai\u0308ve",  // i + combining diaeresis -> \u00ef
      "Caf\u00e9",    // already composed: unchanged
      "d\u0307\u0323", // dot-above + dot-below: canonical reordering
      "plain ascii", "").toDF("s")
    val got = rows.select(nfc($"s").as("n"), length($"s").as("lr"),
      length(nfc($"s")).as("ln")).collect()
    def j(s: String) =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    rows.collect().map(_.getString(0)).zip(got).foreach { case (s, r) =>
      assert(r.getString(0) === j(s), s"nfc of ${s.codePoints.toArray.toSeq}")
    }
    // the decomposed forms really shortened
    assert(got(0).getInt(2) < got(0).getInt(1))
    assert(j("Cafe\u0301") === "Caf\u00e9")
    // null-safe through the expression
    assert(Seq[String](null).toDF("s").select(nfc($"s")).head.isNullAt(0))
    // interpreted path (eval) agrees with the codegen path above
    val expr = graft.functions.TextFunctions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "Cafe\u0301", org.apache.spark.sql.types.StringType))
    assert(expr.eval(null).toString === "Caf\u00e9")
  }

  test("parse_coin round-trips reference coin strings") {
    import spark.implicits._
    val df = Seq("100token", "9999tugrik", "", "notacoin", "42a1",
      "18446744073709551616atto") // 2^64: sdk.Int is arbitrary-precision
      .toDF("s")
      .select(C.coinAmount(col("s")).as("a"), C.coinDenom(col("s")).as("d"))
    val got = df.collect().map(r => (Option(r.get(0)).map(_.toString),
      Option(r.getString(1))))
    assert(got(0) === (Some("100"), Some("token")))
    assert(got(1) === (Some("9999"), Some("tugrik")))
    assert(got(2) === (None, None)) // sdk.Coins{}.String() == ""
    assert(got(3) === (None, None))
    assert(got(4) === (Some("42"), Some("a1")))
    assert(got(5) === (Some("18446744073709551616"), Some("atto")))
  }

  test("parse_coin/format_coin round-trip property") {
    import spark.implicits._
    // scalacheck as a generator (no scalatestplus bridge in this cache):
    // 50 seeded samples of non-negative longs, one Spark round-trip.
    val gen = Gen.chooseNum(0L, Long.MaxValue)
    val samples = (1 to 50).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val df = samples.map(n => s"${n}denom").toDF("s")
      .select(col("s"), C.formatCoin(C.coinAmount(col("s")),
        C.coinDenom(col("s"))).as("rt"))
    df.collect().foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("gzip/gunzip round-trip") {
    import spark.implicits._
    val payloads = Seq("hello world", "", "a" * 10000)
    val df = payloads.toDF("s")
      .select(B.gunzip(B.gzip(col("s").cast("binary"))).cast("string").as("rt"))
    assert(df.collect().map(_.getString(0)).toSeq === payloads)
  }

  test("img format sniff matches the reference's 7-format table") {
    val png = B.syntheticPng(1, 4, 4)
    assert(B.sniffFormat(png) === "png")
    assert(B.sniffFormat("  <svg xmlns='x'/>".getBytes) === "svg")
    assert(B.sniffFormat(
      "<?xml version='1.0'?><svg></svg>".getBytes) === "svg")
    assert(B.sniffFormat(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0))
      === "jpeg")
    assert(B.sniffFormat("GIF89a".getBytes) === "gif")
    assert(B.sniffFormat("BM1234".getBytes) === "bmp")
    assert(B.sniffFormat("RIFF0000WEBPVP8 ".getBytes) === "webp")
    assert(B.sniffFormat(Array[Byte]('I', 'I', 42, 0)) === "tiff")
    assert(B.sniffFormat("garbage".getBytes) === null)
  }

  test("img decode/resize is real for JDK rasters") {
    val png = B.syntheticPng(7, 40, 30)
    val out = B.resizeImage(png, 200, 150)
    assert(out.isDefined)
    assert(B.sniffFormat(out.get) === "png")
    val meta = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.get))
    assert(meta.getWidth === 200 && meta.getHeight === 150)
    // lossy webp ("VP8 ") stays undecoded (DCT codec not shipped)
    assert(B.resizeImage("RIFF0000WEBPVP8 ".getBytes, 10, 10) === None)
  }

  /** Minimal VP8L: one solid color — every prefix code is single-symbol
    * (zero bits per pixel), so the whole stream is header + code
    * definitions. Bitstream details in graft.functions.Vp8l. */
  private def solidVp8l(w: Int, h: Int, argb: Int): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer[Int]()
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits += ((v >> i) & 1))
    put(w - 1, 14); put(h - 1, 14); put(0, 1); put(0, 3) // header
    put(0, 1) // no transforms
    put(0, 1) // no color cache
    put(0, 1) // no meta-prefix image
    Seq((argb >> 8) & 0xff, (argb >> 16) & 0xff, argb & 0xff,
      (argb >>> 24) & 0xff, 0).foreach { sym => // g, r, b, a, dist
      put(1, 1); put(0, 1); put(1, 1); put(sym, 8) // simple, 1 symbol
    }
    val payload = 0x2f.toByte +: bits.grouped(8).map(g =>
      g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(4 + 8 + payload.length + (payload.length & 1)))
    bos.write("WEBP".getBytes("US-ASCII"))
    bos.write("VP8L".getBytes("US-ASCII"))
    bos.write(le32(payload.length))
    bos.write(payload)
    if ((payload.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  test("webp VP8L pixels decode and resize end-to-end (C11 full)") {
    val red = 0xffcc2010
    val webp = solidVp8l(8, 6, red)
    assert(B.sniffFormat(webp) === "webp")
    assert(B.webpDims(webp) === Some((8, 6)))
    val out = B.resizeImage(webp, 4, 3)
    assert(out.isDefined, "VP8L did not decode")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.get))
    assert(img.getWidth === 4 && img.getHeight === 3)
    // a solid image resizes to the same solid color
    val px = img.getRGB(0, 0, 4, 3, null, 0, 4)
    assert(px.forall(_ == red), f"expected $red%08x, got ${px.head}%08x")
  }

  test("webp dimensions parse from VP8/VP8L/VP8X headers (no codec)") {
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def webp(fourCC: String, payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes("US-ASCII"))
      bos.write(le32(4 + 8 + payload.length + (payload.length & 1)))
      bos.write("WEBP".getBytes("US-ASCII"))
      bos.write(fourCC.getBytes("US-ASCII"))
      bos.write(le32(payload.length))
      bos.write(payload)
      if ((payload.length & 1) == 1) bos.write(0)
      bos.toByteArray
    }
    // VP8L (lossless): 0x2f signature, then (w-1) in 14 bits | (h-1) << 14
    val lossless = {
      val bits = (100 - 1) | ((60 - 1) << 14)
      webp("VP8L", Array[Byte](0x2f) ++ le32(bits))
    }
    assert(B.sniffFormat(lossless) === "webp")
    assert(B.webpDims(lossless) === Some((100, 60)))
    // VP8X (extended): flags + 3 reserved, then 24-bit LE (w-1), (h-1)
    val extended = webp("VP8X", Array[Byte](0x10, 0, 0, 0,
      ((320 - 1) & 0xff).toByte, ((320 - 1) >> 8).toByte, 0,
      ((240 - 1) & 0xff).toByte, 0, 0))
    assert(B.webpDims(extended) === Some((320, 240)))
    // "VP8 " (lossy): keyframe tag, 0x9d012a start code, 14-bit w/h
    val lossy = webp("VP8 ", Array[Byte](0, 0, 0,
      0x9d.toByte, 0x01, 0x2a,
      200.toByte, 0, 150.toByte, 0))
    assert(B.webpDims(lossy) === Some((200, 150)))
    // truncated / non-keyframe / garbage chunks never throw, just None
    assert(B.webpDims(lossless.take(16)) === None)
    assert(B.webpDims(webp("VP8 ", Array[Byte](1, 0, 0,
      0x9d.toByte, 0x01, 0x2a, 1, 0, 1, 0))) === None)
    assert(B.webpDims("RIFF0000WEBPVP8 ".getBytes) === None)
    // imgMeta surfaces header dims even though pixel decode is stubbed
    import spark.implicits._
    val row = Seq(Tuple1(lossless)).toDF("body")
      .select(B.imgMeta(org.apache.spark.sql.functions.col("body")).as("m"))
      .selectExpr("m.width", "m.height", "m.format").head()
    assert((row.getInt(0), row.getInt(1), row.getString(2)) ===
      ((100, 60, "webp")))
  }

  test("SVG shape subset rasterizes with the pure-JVM renderer") {
    val svg =
      """<svg xmlns="http://www.w3.org/2000/svg" width="40" height="30">
        |  <rect x="0" y="0" width="40" height="30" fill="#336699"/>
        |  <circle cx="10" cy="10" r="5" fill="red"/>
        |  <polygon points="20,5 35,5 27,20" fill="#0f0"/>
        |</svg>""".stripMargin.getBytes("UTF-8")
    assert(B.sniffFormat(svg) === "svg")
    val img = B.rasterizeSvg(svg)
    assert(img.isDefined)
    assert(img.get.getWidth === 40 && img.get.getHeight === 30)
    // background rect color lands where no shape covers it
    assert((img.get.getRGB(39, 29) & 0xffffff) === 0x336699)
    // circle fill at its center
    assert((img.get.getRGB(10, 10) & 0xffffff) === 0xff0000)
    // the resize path accepts svg input now
    assert(B.resizeImage(svg, 20, 15).isDefined)
    // viewBox scaling: 100x100 viewBox onto a 10x10 canvas
    val scaled = B.rasterizeSvg(
      """<svg width="10" height="10" viewBox="0 0 100 100">
        |<rect x="0" y="0" width="100" height="50" fill="black"/>
        |</svg>""".stripMargin.getBytes("UTF-8"))
    assert(scaled.isDefined)
    assert((scaled.get.getRGB(5, 2) & 0xffffff) === 0x000000)
    assert((scaled.get.getRGB(5, 8) & 0xffffff) === 0xffffff)
    // garbage xml → None, never an exception
    assert(B.rasterizeSvg("<svg><rect".getBytes) === None)
  }

  test("SVG paths render: lines, curves, arcs, smooth segments") {
    def px(svg: String, x: Int, y: Int): Int =
      (B.rasterizeSvg(svg.getBytes("UTF-8")).get.getRGB(x, y)) & 0xffffff
    // triangle via M/L/Z (absolute + relative mix)
    val tri =
      """<svg width="40" height="40">
        |<path d="M 5 5 L 35 5 l -15 30 Z" fill="red"/></svg>""".stripMargin
    assert(px(tri, 20, 10) === 0xff0000) // inside
    assert(px(tri, 2, 38) === 0xffffff) // outside
    // H/V shorthand rectangle
    val hv =
      """<svg width="20" height="20">
        |<path d="M2 2 H 18 V 18 H 2 Z" fill="blue"/></svg>""".stripMargin
    assert(px(hv, 10, 10) === 0x0000ff)
    // cubic + smooth continuation: a filled wave region
    val cubic =
      """<svg width="60" height="40">
        |<path d="M0 20 C 10 0, 20 0, 30 20 S 50 40, 60 20 L 60 40 L 0 40 Z"
        |  fill="#0f0"/></svg>""".stripMargin
    assert(px(cubic, 30, 30) === 0x00ff00) // well under the wave
    assert(px(cubic, 30, 2) === 0xffffff) // above it
    // quadratic + T reflection
    val quad =
      """<svg width="40" height="20">
        |<path d="M0 10 Q 10 0 20 10 T 40 10 L 40 20 L 0 20 Z"
        |  fill="black"/></svg>""".stripMargin
    assert(px(quad, 20, 15) === 0x000000)
    // arc: upper semicircle closed over its chord (a filled D)
    val arc =
      """<svg width="64" height="64">
        |<path d="M 10 32 A 22 22 0 0 1 54 32 Z" fill="purple"/>
        |</svg>""".stripMargin
    assert(px(arc, 32, 15) === 0x800080) // inside the dome
    assert(px(arc, 32, 45) === 0xffffff) // below the chord
    assert(px(arc, 12, 12) === 0xffffff) // outside the arc's corner
    // malformed d renders nothing, never throws
    assert(B.parseSvgPath("Z 5 5") === None)
    assert(B.parseSvgPath("M 1") === None)
  }

  test("SVG linear gradients fill via url(#id): bounding-box and " +
    "user-space units, percent offsets, degenerate stops") {
    def px(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
      img.getRGB(x, y) & 0xffffff
    val svg =
      """<svg width="64" height="32">
        |<defs><linearGradient id="lr">
        |  <stop offset="0%" stop-color="black"/>
        |  <stop offset="100%" stop-color="white"/>
        |</linearGradient>
        |<linearGradient id="us" x1="0" y1="0" x2="0" y2="32"
        |    gradientUnits="userSpaceOnUse">
        |  <stop offset="0" stop-color="#ff0000"/>
        |  <stop offset="1" stop-color="#0000ff"/>
        |</linearGradient></defs>
        |<rect x="0" y="0" width="32" height="32" fill="url(#lr)"/>
        |<rect x="32" y="0" width="32" height="32" fill="url(#us)"/>
        |</svg>""".stripMargin
    val img = B.rasterizeSvg(svg.getBytes("UTF-8"))
      .getOrElse(fail("gradient svg did not rasterize"))
    // left rect: horizontal black->white over ITS bounding box
    assert((px(img, 1, 16) & 0xff) < 40, "gradient start not dark")
    assert((px(img, 30, 16) & 0xff) > 215, "gradient end not bright")
    val mid = px(img, 16, 16) & 0xff
    assert(mid > 90 && mid < 170, s"gradient midpoint off: $mid")
    // right rect: vertical red->blue in user-space coordinates
    assert((px(img, 48, 1) >> 16) > 200, "user-space gradient top not red")
    assert((px(img, 48, 30) & 0xff) > 200,
      "user-space gradient bottom not blue")
    // unknown reference: no fill (not a crash, not black)
    val bad = B.rasterizeSvg(
      """<svg width="8" height="8"><rect width="8" height="8"
        | fill="url(#nope)"/></svg>""".stripMargin.getBytes("UTF-8"))
    assert(bad.isDefined && (bad.get.getRGB(4, 4) & 0xffffff) === 0xffffff)
    // single-stop gradient degrades to a solid fill
    val solid = B.rasterizeSvg(
      """<svg width="8" height="8"><defs><linearGradient id="s">
        |<stop offset="0" stop-color="#00ff00"/></linearGradient></defs>
        |<rect width="8" height="8" fill="url(#s)"/></svg>"""
        .stripMargin.getBytes("UTF-8"))
    assert(solid.isDefined && (solid.get.getRGB(4, 4) & 0xffffff) === 0xff00)
    // duplicate trailing stops at 1.0 (hard-stop pattern 0,1,1): earlier
    // stops nudge DOWN from 1.0 so the document still renders — a
    // forward-nudge clamp would feed LinearGradientPaint equal fractions
    // and blank the whole document
    val hard = B.rasterizeSvg(
      """<svg width="32" height="8"><defs><linearGradient id="h">
        |<stop offset="0" stop-color="black"/>
        |<stop offset="1" stop-color="white"/>
        |<stop offset="1" stop-color="#ff0000"/></linearGradient></defs>
        |<rect width="32" height="8" fill="url(#h)"/></svg>"""
        .stripMargin.getBytes("UTF-8"))
    assert(hard.isDefined, "hard-stop gradient did not rasterize")
    assert((hard.get.getRGB(1, 4) & 0xff) < 40, "hard-stop start not dark")
    assert((hard.get.getRGB(29, 4) & 0xffffff & 0xff00ff) > 0xf000,
      "hard-stop end neither white nor red")
  }

  test("SVG transforms apply to elements and groups") {
    def px(svg: String, x: Int, y: Int): Int =
      (B.rasterizeSvg(svg.getBytes("UTF-8")).get.getRGB(x, y)) & 0xffffff
    // translate + scale: 5x5 rect at origin lands at (20..40, 10..30)
    val ts =
      """<svg width="50" height="40">
        |<rect width="10" height="10" fill="red"
        |  transform="translate(20,10) scale(2)"/></svg>""".stripMargin
    assert(px(ts, 30, 20) === 0xff0000)
    assert(px(ts, 10, 20) === 0xffffff)
    // rotate about a center: rect rotated 90 degrees around (20,20)
    val rot =
      """<svg width="40" height="40">
        |<rect x="20" y="18" width="16" height="4" fill="blue"
        |  transform="rotate(90,20,20)"/></svg>""".stripMargin
    assert(px(rot, 20, 30) === 0x0000ff) // now vertical, below center
    assert(px(rot, 30, 20) === 0xffffff) // original spot is empty
    // group transform reaches children; child transform composes
    val grp =
      """<svg width="60" height="60">
        |<g transform="translate(20,20)">
        |  <rect width="5" height="5" fill="green" transform="scale(2)"/>
        |</g></svg>""".stripMargin
    assert(px(grp, 25, 25) === 0x008000)
    assert(px(grp, 5, 5) === 0xffffff)
    // matrix form: pure translation matrix(1,0,0,1,30,0)
    val mat =
      """<svg width="50" height="20">
        |<rect width="8" height="8" fill="black"
        |  transform="matrix(1,0,0,1,30,0)"/></svg>""".stripMargin
    assert(px(mat, 34, 4) === 0x000000)
    assert(px(mat, 4, 4) === 0xffffff)
  }

  test("uncompressed TIFF round-trips through the pure-JVM codec") {
    for (le <- Seq(true, false)) {
      val img = new java.awt.image.BufferedImage(17, 11,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 11; x <- 0 until 17)
        img.setRGB(x, y, ((x * 31 + y * 17) * 2654435761L.toInt) & 0xffffff)
      val tiff = B.encodeTiffRgb(img, littleEndian = le)
      assert(B.sniffFormat(tiff) === "tiff")
      val dec = B.decodeTiff(tiff)
      assert(dec.isDefined, s"decode failed (littleEndian=$le)")
      assert(dec.get.getWidth === 17 && dec.get.getHeight === 11)
      // pixel-exact round trip
      for (y <- 0 until 11; x <- 0 until 17)
        assert((dec.get.getRGB(x, y) & 0xffffff) === (img.getRGB(x, y) & 0xffffff))
      // resize path accepts tiff input now
      assert(B.resizeImage(tiff, 8, 6).isDefined)
    }
    // compressed/invalid tiffs still refuse politely
    assert(B.decodeTiff("II*\u0000garbage".getBytes("ISO-8859-1")) === None)
    // randomized dims (odd widths exercise row padding) both endians
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val (w, h) = (rnd.nextInt(30) + 1, rnd.nextInt(20) + 1)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val dec = B.decodeTiff(B.encodeTiffRgb(img, rnd.nextBoolean()))
      assert(dec.isDefined, s"${w}x$h failed")
      for (y <- 0 until h; x <- 0 until w)
        assert((dec.get.getRGB(x, y) & 0xffffff) ===
          (img.getRGB(x, y) & 0xffffff), s"pixel ($x,$y) of ${w}x$h")
    }
  }

  // --- mini TIFF writer for the compressed-codec tests: raw samples →
  // strips → per-strip LZW (TIFF variant, MSB-first, early width change)
  // or Deflate, optional Predictor=2 differencing, little-endian IFD.
  // An independent implementation of the PUBLIC TIFF 6 spec, so the
  // decoder is checked against the format, not against itself.
  private def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0; var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nBits += width
      while (nBits >= 8) {
        nBits -= 8; out.write(((acc >>> nBits) & 0xff).toInt)
      }
    }
    var dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
    def reset(): Unit = {
      dict = scala.collection.mutable.HashMap((0 until 256)
        .map(i => Seq(i.toByte) -> i): _*)
    }
    reset(); put(256) // ClearCode first, per spec
    var next = 258
    var omega = Vector.empty[Byte]
    for (k <- data) {
      val cand = omega :+ k
      if (dict.contains(cand)) omega = cand
      else {
        put(dict(omega))
        dict(cand) = next; next += 1
        if (next == 511 || next == 1023 || next == 2047) width += 1
        if (next == 4094) { // table nearly full: flush and restart
          put(256); reset(); next = 258; width = 9
        }
        omega = Vector(k)
      }
    }
    if (omega.nonEmpty) put(dict(omega))
    put(257) // EOI
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  private def deflateCompress(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Assemble a little-endian TIFF from raw 8-bit samples. */
  private def tiffContainer(w: Int, h: Int, spp: Int, compression: Int,
      predictor: Int, rowsPerStrip: Int, samples: Array[Byte]): Array[Byte] = {
    val rowBytes = w * spp
    val strips = (0 until h by rowsPerStrip).map { r0 =>
      val rows = math.min(rowsPerStrip, h - r0)
      val raw = java.util.Arrays.copyOfRange(samples, r0 * rowBytes,
        (r0 + rows) * rowBytes)
      if (predictor == 2) { // horizontal differencing, per row
        for (r <- rows - 1 to 0 by -1; x <- rowBytes - 1 to spp by -1)
          raw(r * rowBytes + x) =
            (raw(r * rowBytes + x) - raw(r * rowBytes + x - spp)).toByte
      }
      compression match {
        case 1 => raw
        case 5 => lzwCompress(raw)
        case 8 => deflateCompress(raw)
      }
    }
    val o = new java.io.ByteArrayOutputStream()
    def p16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def p32(v: Int): Unit = { p16(v & 0xffff); p16((v >> 16) & 0xffff) }
    o.write('I'); o.write('I'); p16(42)
    val stripBytes = strips.map(_.length)
    val dataStart = 8
    val dataEnd = dataStart + stripBytes.sum
    p32(dataEnd + (dataEnd & 1)) // IFD after (even-aligned) strip data
    strips.foreach(s => o.write(s, 0, s.length))
    if (dataEnd % 2 == 1) o.write(0)
    val tags = scala.collection.mutable.ArrayBuffer[(Int, Int, Seq[Long])]()
    tags += ((256, 4, Seq(w.toLong))); tags += ((257, 4, Seq(h.toLong)))
    tags += ((258, 3, Seq.fill(spp)(8L)))
    tags += ((259, 3, Seq(compression.toLong)))
    tags += ((262, 3, Seq(if (spp == 1) 1L else 2L)))
    val offsets = stripBytes.scanLeft(dataStart)(_ + _).init.map(_.toLong)
    tags += ((273, 4, offsets))
    tags += ((277, 3, Seq(spp.toLong)))
    tags += ((278, 4, Seq(rowsPerStrip.toLong)))
    tags += ((279, 4, stripBytes.map(_.toLong)))
    if (predictor != 1) tags += ((317, 3, Seq(predictor.toLong)))
    val ifdStart = dataEnd + (dataEnd & 1)
    var extra = ifdStart + 2 + tags.length * 12 + 4
    val extraBuf = new java.io.ByteArrayOutputStream()
    p16(tags.length)
    for ((tag, typ, vs) <- tags.sortBy(_._1)) {
      p16(tag); p16(typ); p32(vs.length)
      val elem = if (typ == 3) 2 else 4
      if (elem * vs.length <= 4) {
        var written = 0
        vs.foreach { v =>
          if (typ == 3) { p16(v.toInt); written += 2 }
          else { p32(v.toInt); written += 4 }
        }
        while (written < 4) { o.write(0); written += 1 }
      } else {
        p32(extra)
        vs.foreach { v =>
          if (typ == 3) { extraBuf.write((v & 0xff).toInt)
            extraBuf.write(((v >> 8) & 0xff).toInt) }
          else { var i = 0; while (i < 4) {
            extraBuf.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
        }
        extra += elem * vs.length
      }
    }
    p32(0) // no next IFD
    val eb = extraBuf.toByteArray
    o.write(eb, 0, eb.length)
    o.toByteArray
  }

  test("LZW and Deflate TIFFs decode: multi-strip, predictor 2, gray " +
    "and RGB, dictionary growth past the 9->10->11 bit boundaries") {
    val rnd = new scala.util.Random(7)
    for {
      compression <- Seq(5, 8)
      predictor <- Seq(1, 2)
      spp <- Seq(1, 3)
    } {
      val (w, h) = (41, 23) // 41*23*3=2829 raw bytes/case
      val samples = new Array[Byte](w * h * spp)
      // half-random, half-runs: runs grow long dictionary chains (KwKwK),
      // random spans force many fresh entries (code-width bumps)
      rnd.nextBytes(samples)
      java.util.Arrays.fill(samples, 0, samples.length / 2, 42.toByte)
      val tiff = tiffContainer(w, h, spp, compression, predictor,
        rowsPerStrip = 7, samples)
      val dec = B.decodeTiff(tiff)
      assert(dec.isDefined,
        s"decode failed (c=$compression p=$predictor spp=$spp)")
      assert(dec.get.getWidth === w && dec.get.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val base = (y * w + x) * spp
        val expected =
          if (spp == 1) { val g = samples(base) & 0xff; (g << 16) | (g << 8) | g }
          else ((samples(base) & 0xff) << 16) |
            ((samples(base + 1) & 0xff) << 8) | (samples(base + 2) & 0xff)
        assert((dec.get.getRGB(x, y) & 0xffffff) === expected,
          s"pixel ($x,$y) c=$compression p=$predictor spp=$spp")
      }
    }
    // a big uniform image crosses 511/1023/2047 in ONE strip and forces
    // the encoder's table-full flush — the decoder must track both
    val big = new Array[Byte](120 * 90 * 3)
    val r2 = new scala.util.Random(13)
    r2.nextBytes(big)
    val bigTiff = tiffContainer(120, 90, 3, 5, 2, 90, big)
    val bigDec = B.decodeTiff(bigTiff)
    assert(bigDec.isDefined, "single-strip 32k-byte LZW failed")
    assert((bigDec.get.getRGB(119, 89) & 0xffffff) ===
      (((big(big.length - 3) & 0xff) << 16) |
        ((big(big.length - 2) & 0xff) << 8) | (big(big.length - 1) & 0xff)))
    // hostile inputs refuse politely: truncated container, and a
    // compression the codec set doesn't cover (JPEG=7)
    val ok = tiffContainer(10, 10, 3, 5, 1, 10, Array.fill(300)(9.toByte))
    assert(B.decodeTiff(ok.take(8)) === None)
    val jpeg = tiffContainer(4, 4, 3, 1, 1, 4, new Array[Byte](48))
    val cTag = jpeg.indexOfSlice(Seq[Byte](3, 1, 3, 0)) // tag 259, SHORT
    assert(cTag > 0, "compression tag not found in fixture")
    jpeg(cTag + 8) = 7 // rewrite Compression=1 -> 7 (JPEG)
    assert(B.decodeTiff(jpeg) === None)
  }

  test("TIFF edge tags: RowsPerStrip=0xFFFFFFFF (the spec's one-strip " +
    "default) decodes; an FDICT zlib strip refuses instead of hanging") {
    val samples = Array.tabulate(10 * 6 * 3)(i => (i * 7).toByte)
    val t = tiffContainer(10, 6, 3, 1, 1, rowsPerStrip = 6, samples)
    val rTag = t.indexOfSlice(Seq[Byte](22, 1, 4, 0)) // tag 278, LONG
    assert(rTag > 0, "RowsPerStrip tag not found")
    for (k <- 0 until 4) t(rTag + 8 + k) = 0xff.toByte
    val dec = B.decodeTiff(t)
    assert(dec.isDefined, "spec-default RowsPerStrip rejected")
    assert((dec.get.getRGB(9, 5) & 0xffffff) ===
      (((samples(177) & 0xff) << 16) | ((samples(178) & 0xff) << 8) |
        (samples(179) & 0xff)))
    // a zlib stream requesting a preset dictionary (FDICT) makes
    // Inflater return 0 without needing input — must bail, not spin
    val raw = new Array[Byte](4 * 4 * 3)
    raw(0) = 0x78; raw(1) = 0xbb.toByte // valid zlib header, FDICT set
    raw(5) = 1 // dictionary adler
    val fd = tiffContainer(4, 4, 3, 1, 1, 4, raw)
    val cT = fd.indexOfSlice(Seq[Byte](3, 1, 3, 0))
    fd(cT + 8) = 8 // claim Deflate over the raw bytes
    assert(B.decodeTiff(fd) === None)
  }

  test("erc721 validation: valid, missing field, wrong type, bad json") {
    import spark.implicits._
    val df = Seq(
      """{"name":"a","description":"b","image":"http://x/i.png"}""",
      """{"name":"a","description":"b"}""",
      """{"name":1,"description":"b","image":"u"}""",
      """not json""")
      .toDF("j").select(J.erc721Validate(col("j")).as("v"))
    val rows = df.select("v.valid", "v.errors").collect()
    assert(rows(0).getBoolean(0) === true)
    assert(rows(1).getBoolean(0) === false)
    assert(rows(1).getSeq[String](1) === Seq("missing required field: image"))
    assert(rows(2).getBoolean(0) === false)
    assert(rows(2).getSeq[String](1)
      === Seq("field is not a string: name"))
    assert(rows(3).getBoolean(0) === false)
    assert(rows(3).getSeq[String](1) === Seq("invalid json"))
  }

  test("schema-driven validation: nested objects, arrays, numbers, extras") {
    import spark.implicits._
    val schema =
      """{"type": "object",
        | "properties": {
        |   "id": {"type": "integer"},
        |   "score": {"type": "number"},
        |   "tags": {"type": "array", "items": {"type": "string"}},
        |   "meta": {"type": "object",
        |            "properties": {"lang": {"type": "string"}},
        |            "required": ["lang"]}},
        | "required": ["id", "meta"]}""".stripMargin
    val df = Seq(
      // 0: fully valid (extra field ok — JSON-Schema default is permissive)
      """{"id":7,"score":1.5,"tags":["a","b"],"meta":{"lang":"en"},"x":1}""",
      // 1: id wrong type, meta.lang missing
      """{"id":"seven","meta":{}}""",
      // 2: missing required id; tags has non-string items
      """{"tags":[1,2],"meta":{"lang":"en"}}""",
      // 3: meta is not an object
      """{"id":1,"meta":"en"}""",
      // 4: score integer is an acceptable number; empty tags array ok
      """{"id":1,"score":3,"tags":[],"meta":{"lang":"en"}}""",
      // 5: root is not an object
      """[1,2,3]""")
      .toDF("j")
      .select(J.validateJsonSchema(col("j"), schema).as("v"))
    val rows = df.select("v.valid", "v.errors").collect()
    assert(rows(0).getBoolean(0) === true)
    assert(rows(1).getBoolean(0) === false)
    assert(rows(1).getSeq[String](1) === Seq(
      "field is not a integer: id", "missing required field: meta.lang"))
    assert(rows(2).getBoolean(0) === false)
    // items validate PER ELEMENT: both offenders report, "[]" marks
    // the array hop
    assert(rows(2).getSeq[String](1) === Seq(
      "missing required field: id",
      "field is not a string: tags[]", "field is not a string: tags[]"))
    assert(rows(3).getBoolean(0) === false)
    assert(rows(3).getSeq[String](1) === Seq("field is not an object: meta"))
    assert(rows(4).getBoolean(0) === true)
    assert(rows(5).getBoolean(0) === false)
    assert(rows(5).getSeq[String](1) === Seq("field is not an object: $"))
  }

  test("schema validation: bare required names and non-prim item types") {
    import spark.implicits._
    // required without a properties entry is legal JSON Schema and must
    // still be presence-checked
    val bare = """{"type": "object", "required": ["image"]}"""
    val r1 = Seq("""{}""", """{"image":1}""").toDF("j")
      .select(J.validateJsonSchema(col("j"), bare).as("v"))
      .select("v.valid", "v.errors").collect()
    assert(r1(0).getBoolean(0) === false)
    assert(r1(0).getSeq[String](1) === Seq("missing required field: image"))
    assert(r1(1).getBoolean(0) === true) // present, any type accepted
    // array-of-object items validate each element in place
    val arr = """{"type": "object",
                 | "properties": {"xs": {"type": "array",
                 |                       "items": {"type": "object"}}}}"""
      .stripMargin
    val r2 = Seq("""{"xs":[{"a":1}]}""", """{"xs":[1,2]}""").toDF("j")
      .select(J.validateJsonSchema(col("j"), arr).as("v"))
      .select("v.valid", "v.errors").collect()
    assert(r2(0).getBoolean(0) === true)
    assert(r2(1).getBoolean(0) === false)
    assert(r2(1).getSeq[String](1) === Seq(
      "field is not an object: xs[]", "field is not an object: xs[]"))
  }

  test("schema validation: enum, pattern, length and numeric bounds " +
    "(the gojsonschema keyword set beyond type/required)") {
    import spark.implicits._
    def run(schema: String, jsons: String*): Seq[(Boolean, Seq[String])] =
      jsons.toDF("j")
        .select(J.validateJsonSchema(col("j"), schema).as("v"))
        .select("v.valid", "v.errors").collect().toSeq
        .map(r => (r.getBoolean(0), r.getSeq[String](1)))

    // enum compares TYPED values: 1 (number) never matches "1" (string)
    val en = """{"type":"object","properties":{
               |  "state": {"enum": ["active", "paused", 3, true]}}}"""
      .stripMargin
    val r1 = run(en, """{"state":"active"}""", """{"state":3}""",
      """{"state":true}""", """{"state":"3"}""", """{"state":"gone"}""")
    assert(r1.map(_._1) === Seq(true, true, true, false, false))
    assert(r1(4)._2 === Seq("value not in enum: state"))

    // pattern is an unanchored regex match, strings only
    val pat = """{"type":"object","properties":{
                |  "id": {"type":"string","pattern":"^0x[0-9a-f]+$"}}}"""
      .stripMargin
    val r2 = run(pat, """{"id":"0xdeadbeef"}""", """{"id":"0xZZ"}""")
    assert(r2.map(_._1) === Seq(true, false))
    assert(r2(1)._2.head.startsWith("string does not match pattern"))

    // minLength/maxLength count characters, apply to strings only
    val len = """{"type":"object","properties":{
                |  "name": {"type":"string","minLength":2,"maxLength":4}}}"""
      .stripMargin
    val r3 = run(len, """{"name":"ab"}""", """{"name":"a"}""",
      """{"name":"abcde"}""")
    assert(r3.map(_._1) === Seq(true, false, false))
    assert(r3(1)._2 === Seq("string shorter than minLength(2): name"))
    assert(r3(2)._2 === Seq("string longer than maxLength(4): name"))

    // minimum/maximum are inclusive; the exclusive draft-4 forms are not
    val num = """{"type":"object","properties":{
                |  "n": {"type":"number","minimum":0,"maximum":10},
                |  "x": {"type":"number","exclusiveMinimum":0}}}"""
      .stripMargin
    val r4 = run(num, """{"n":0,"x":1}""", """{"n":-1}""",
      """{"n":10.5}""", """{"x":0}""")
    assert(r4.map(_._1) === Seq(true, false, false, false))
    assert(r4(1)._2 === Seq("number below minimum(0.0): n"))
    assert(r4(2)._2 === Seq("number above maximum(10.0): n"))
    assert(r4(3)._2 === Seq("number not above exclusiveMinimum(0.0): x"))

    // multipleOf divides exactly, including fractional divisors (the
    // 0.3 % 0.1 float trap a remainder-based check would misjudge)
    val mo = """{"type":"object","properties":{
               |  "n": {"type":"number","multipleOf":0.1}}}""".stripMargin
    val rMo = run(mo, """{"n":0.3}""", """{"n":2}""", """{"n":0.25}""",
      """{"n":12345678.9}""")
    // the last case needs a RELATIVE tolerance: 12345678.9/0.1 carries
    // ~1e-8 of float error, past any fixed 1e-9 epsilon
    assert(rMo.map(_._1) === Seq(true, true, false, true))
    assert(rMo(2)._2 === Seq("number not a multipleOf(0.1): n"))

    // constraints layer on top of the type check, not instead of it;
    // a wrong-typed value reports the type error (string keywords
    // ignore non-strings, per the spec)
    val r5 = run(pat, """{"id":7}""")
    assert(r5 === Seq((false, Seq("field is not a string: id"))))

    // the ERC-721 schema extended with an image-protocol enum + bounds —
    // the reference's gojsonschema would validate the same document set
    val erc = """{"type":"object",
                | "properties": {
                |   "name": {"type":"string","minLength":1},
                |   "description": {"type":"string"},
                |   "image": {"type":"string",
                |             "pattern":"^(https?|ipfs)://"},
                |   "decimals": {"type":"integer","minimum":0,"maximum":18}},
                | "required": ["name","description","image"]}""".stripMargin
    val r6 = run(erc,
      """{"name":"T","description":"d","image":"ipfs://x","decimals":6}""",
      """{"name":"","description":"d","image":"ftp://x","decimals":19}""")
    assert(r6(0) === ((true, Nil)))
    assert(r6(1)._1 === false)
    assert(r6(1)._2 === Seq(
      "string shorter than minLength(1): name",
      "string does not match pattern(^(https?|ipfs)://): image",
      "number above maximum(18.0): decimals"))
  }

  test("schema validation: composition keywords (anyOf/allOf/oneOf/not), " +
    "closed objects, and the array-cardinality keywords") {
    import spark.implicits._
    def run(schema: String, jsons: String*): Seq[(Boolean, Seq[String])] =
      jsons.toDF("j")
        .select(J.validateJsonSchema(col("j"), schema).as("v"))
        .select("v.valid", "v.errors").collect().toSeq
        .map(r => (r.getBoolean(0), r.getSeq[String](1)))

    // anyOf: at least one branch; branches may omit "type" (object
    // keywords then apply only when the instance is an object)
    val any = """{"type":"object","properties":{
                |  "v": {"anyOf": [{"type":"string"},
                |                  {"type":"number","minimum":0}]}}}"""
      .stripMargin
    val rA = run(any, """{"v":"x"}""", """{"v":3}""", """{"v":-1}""",
      """{"v":true}""")
    assert(rA.map(_._1) === Seq(true, true, false, false))
    assert(rA(2)._2 === Seq("value matches none of anyOf: v"))

    // allOf: every branch, and each failed branch reports its OWN error
    val all = """{"type":"object","properties":{
                |  "s": {"allOf": [{"type":"string","minLength":3},
                |                  {"pattern":"^a"}]}}}""".stripMargin
    val rAll = run(all, """{"s":"abc"}""", """{"s":"ab"}""",
      """{"s":"xyz"}""")
    assert(rAll.map(_._1) === Seq(true, false, false))
    assert(rAll(1)._2 === Seq("string shorter than minLength(3): s"))
    assert(rAll(2)._2 === Seq("string does not match pattern(^a): s"))

    // oneOf: exactly one — matching two is as invalid as matching none
    val one = """{"type":"object","properties":{
                |  "n": {"oneOf": [{"type":"number","minimum":0},
                |                  {"type":"number","maximum":10}]}}}"""
      .stripMargin
    val rOne = run(one, """{"n":-5}""", """{"n":50}""", """{"n":5}""")
    assert(rOne.map(_._1) === Seq(true, true, false))
    assert(rOne(2)._2 ===
      Seq("value matches 2 oneOf branches (want exactly one): n"))

    // not: inverted match
    val nn = """{"type":"object","properties":{
               |  "v": {"not": {"type":"string"}}}}""".stripMargin
    val rN = run(nn, """{"v":1}""", """{"v":"s"}""")
    assert(rN.map(_._1) === Seq(true, false))
    assert(rN(1)._2 === Seq("value matches the 'not' schema: v"))

    // additionalProperties: false — each trespasser reports by name
    val closed = """{"type":"object",
                   | "properties": {"a": {"type":"integer"}},
                   | "additionalProperties": false}""".stripMargin
    val rC = run(closed, """{"a":1}""", """{"a":1,"b":2,"c":3}""")
    assert(rC.map(_._1) === Seq(true, false))
    assert(rC(1)._2 === Seq("unexpected additional property 'b': $",
      "unexpected additional property 'c': $"))

    // minItems / maxItems / uniqueItems
    val card = """{"type":"object","properties":{
                 |  "xs": {"type":"array","minItems":2,"maxItems":3,
                 |         "uniqueItems":true}}}""".stripMargin
    val rK = run(card, """{"xs":[1,2]}""", """{"xs":[1]}""",
      """{"xs":[1,2,3,4]}""", """{"xs":[1,2,1]}""")
    assert(rK.map(_._1) === Seq(true, false, false, false))
    assert(rK(1)._2 === Seq("array shorter than minItems(2): xs"))
    assert(rK(2)._2 === Seq("array longer than maxItems(3): xs"))
    assert(rK(3)._2 === Seq("array items are not unique: xs"))

    // const: a one-value enum with typed equality (1 never equals "1")
    val cst = """{"type":"object","properties":{
                |  "k": {"const": 1}, "s": {"const": "x"}}}""".stripMargin
    val rCst = run(cst, """{"k":1,"s":"x"}""", """{"k":"1","s":"x"}""",
      """{"k":1,"s":"y"}""")
    assert(rCst.map(_._1) === Seq(true, false, false))
    assert(rCst(1)._2 === Seq("value does not equal const: k"))
    assert(rCst(2)._2 === Seq("value does not equal const: s"))

    // contains: at least one element matches the sub-schema (which
    // recurses — here a constrained number)
    val cont = """{"type":"object","properties":{
                 |  "xs": {"type":"array",
                 |         "contains": {"type":"number","minimum":10}}}}"""
      .stripMargin
    val rCt = run(cont, """{"xs":[1,"a",12]}""", """{"xs":[1,2]}""",
      """{"xs":[]}""")
    assert(rCt.map(_._1) === Seq(true, false, false))
    assert(rCt(1)._2 === Seq("no array item matches 'contains': xs"))

    // minProperties / maxProperties / propertyNames (pattern over each
    // key, exact through Spark's own JSON escaping)
    val objc = """{"type":"object","minProperties":1,"maxProperties":2,
                 | "propertyNames": {"pattern": "^[a-z]+$"}}""".stripMargin
    val rO = run(objc, """{"ab":1}""", """{}""", """{"a":1,"b":2,"c":3}""",
      """{"UPPER":1}""")
    assert(rO.map(_._1) === Seq(true, false, false, false))
    assert(rO(1)._2 === Seq("object has fewer than minProperties(1): $"))
    assert(rO(2)._2 === Seq("object has more than maxProperties(2): $"))
    assert(rO(3)._2 ===
      Seq("property name 'UPPER' violates propertyNames: $"))
  }

  test("schema validation end-to-end: the in-the-wild ERC-721 schema " +
    "with an attributes array — per-element objects, anyOf-typed " +
    "values, closed trait objects") {
    import spark.implicits._
    // the shape OpenSea metadata actually takes: attributes is an array
    // of {trait_type, value} objects where value is string-or-number —
    // the reference's gojsonschema handles this via full generality;
    // per-element items recursion is what matches it here
    val erc = """{"type":"object",
                | "properties": {
                |   "name": {"type":"string","minLength":1},
                |   "description": {"type":"string"},
                |   "image": {"type":"string","pattern":"^(https?|ipfs)://"},
                |   "attributes": {
                |     "type":"array",
                |     "maxItems": 50,
                |     "items": {
                |       "type":"object",
                |       "properties": {
                |         "trait_type": {"type":"string"},
                |         "value": {"anyOf":[{"type":"string"},
                |                            {"type":"number"}]},
                |         "display_type": {"type":"string"}},
                |       "required": ["trait_type","value"],
                |       "additionalProperties": false}}},
                | "required": ["name","image"]}""".stripMargin
    val docs = Seq(
      // valid: mixed string/number values, optional display_type
      """{"name":"Ape #1","image":"ipfs://Qm1","attributes":[
        |{"trait_type":"Fur","value":"Golden"},
        |{"trait_type":"Level","value":7,"display_type":"number"}]}"""
        .stripMargin.replace("\n", ""),
      // element 0 misses value; element 1 has a boolean value (neither
      // string nor number); element 2 smuggles an undeclared key
      """{"name":"Ape #2","image":"https://x/2","attributes":[
        |{"trait_type":"Fur"},
        |{"trait_type":"Flag","value":true},
        |{"trait_type":"Eye","value":"Blue","rarity":0.01}]}"""
        .stripMargin.replace("\n", ""),
      // attributes as a bare string: the array type reports
      """{"name":"Ape #3","image":"ipfs://Qm3","attributes":"rare"}""")
    val rows = docs.toDF("j")
      .select(J.validateJsonSchema(col("j"), erc).as("v"))
      .select("v.valid", "v.errors").collect().toSeq
      .map(r => (r.getBoolean(0), r.getSeq[String](1)))
    assert(rows(0) === ((true, Nil)))
    assert(rows(1)._1 === false)
    assert(rows(1)._2 === Seq(
      "missing required field: attributes[].value",
      "value matches none of anyOf: attributes[].value",
      "unexpected additional property 'rarity': attributes[]"))
    assert(rows(2)._1 === false)
    assert(rows(2)._2 === Seq("field is not an array: attributes"))
  }

  test("schema validation: $ref into definitions/$defs inlines at parse " +
    "time; cyclic, external and unresolvable refs reject loudly") {
    import spark.implicits._
    def run(schema: String, jsons: String*): Seq[(Boolean, Seq[String])] =
      jsons.toDF("j")
        .select(J.validateJsonSchema(col("j"), schema).as("v"))
        .select("v.valid", "v.errors").collect().toSeq
        .map(r => (r.getBoolean(0), r.getSeq[String](1)))

    // a realistic definitions-factored metadata schema: the shared
    // `uri` and `trait` shapes referenced twice each — the form
    // real-world ERC-721/1155 schema documents actually take, and the
    // reason $ref is the generality bar (gojsonschema resolves it)
    val factored =
      """{"type":"object",
        | "definitions": {
        |   "uri": {"type":"string","pattern":"^(https?|ipfs)://"},
        |   "trait": {
        |     "type":"object",
        |     "properties": {
        |       "trait_type": {"type":"string"},
        |       "value": {"anyOf":[{"type":"string"},{"type":"number"}]}},
        |     "required": ["trait_type","value"],
        |     "additionalProperties": false}},
        | "properties": {
        |   "name": {"type":"string","minLength":1},
        |   "image": {"$ref": "#/definitions/uri"},
        |   "animation_url": {"$ref": "#/definitions/uri"},
        |   "attributes": {"type":"array",
        |                  "items": {"$ref": "#/definitions/trait"}}},
        | "required": ["name","image"]}""".stripMargin
    val r = run(factored,
      """{"name":"T","image":"ipfs://a","animation_url":"https://b",
        |"attributes":[{"trait_type":"Fur","value":"Gold"}]}"""
        .stripMargin.replace("\n", ""),
      """{"name":"T","image":"ftp://a",
        |"attributes":[{"trait_type":"Fur"}]}"""
        .stripMargin.replace("\n", ""))
    assert(r(0) === ((true, Nil)))
    assert(r(1)._1 === false)
    assert(r(1)._2 === Seq(
      "string does not match pattern(^(https?|ipfs)://): image",
      "missing required field: attributes[].value"))

    // $defs (2019-09 spelling) and refs INSIDE definitions resolve too
    val defs =
      """{"$defs": {
        |   "name": {"type":"string","minLength":2},
        |   "named": {"type":"object",
        |             "properties": {"n": {"$ref": "#/$defs/name"}},
        |             "required": ["n"]}},
        | "type":"object",
        | "properties": {"who": {"$ref": "#/$defs/named"}}}""".stripMargin
    val r2 = run(defs, """{"who":{"n":"ab"}}""", """{"who":{"n":"a"}}""")
    assert(r2.map(_._1) === Seq(true, false))
    assert(r2(1)._2 === Seq("string shorter than minLength(2): who.n"))

    // cyclic: a -> b -> a cannot compile to a finite expression — loud
    val cyc =
      """{"definitions": {
        |   "a": {"properties": {"x": {"$ref": "#/definitions/b"}}},
        |   "b": {"properties": {"y": {"$ref": "#/definitions/a"}}}},
        | "$ref": "#/definitions/a"}""".stripMargin
    val eCyc = intercept[IllegalArgumentException](J.JsonSchema.parse(cyc))
    assert(eCyc.getMessage.contains("cyclic $ref"))
    // self-ref through the root is the same cycle
    val eSelf = intercept[IllegalArgumentException](J.JsonSchema.parse(
      """{"properties": {"child": {"$ref": "#"}}}"""))
    assert(eSelf.getMessage.contains("cyclic $ref"))
    // external and unresolvable refs: out of scope, loudly
    assert(intercept[IllegalArgumentException](J.JsonSchema.parse(
      """{"$ref": "https://example.com/s.json"}"""))
      .getMessage.contains("external"))
    assert(intercept[IllegalArgumentException](J.JsonSchema.parse(
      """{"$ref": "#/definitions/nope"}"""))
      .getMessage.contains("unresolvable"))
  }

  test("schema validation: patternProperties validates matching keys' " +
    "values and exempts them from additionalProperties:false") {
    import spark.implicits._
    def run(schema: String, jsons: String*): Seq[(Boolean, Seq[String])] =
      jsons.toDF("j")
        .select(J.validateJsonSchema(col("j"), schema).as("v"))
        .select("v.valid", "v.errors").collect().toSeq
        .map(r => (r.getBoolean(0), r.getSeq[String](1)))

    // keys like attr_* carry numbers; declared key "id" is a string;
    // anything else is additional (and the object is closed)
    val pp = """{"type":"object",
               | "properties": {"id": {"type":"string"}},
               | "patternProperties": {"^attr_": {"type":"number"}},
               | "additionalProperties": false}""".stripMargin
    val r = run(pp,
      """{"id":"x","attr_a":1,"attr_b":2.5}""",
      """{"id":"x","attr_a":"not a number"}""",
      """{"id":"x","rogue":1}""")
    assert(r(0) === ((true, Nil)))
    assert(r(1)._1 === false)
    assert(r(1)._2 ===
      Seq("field is not a number: .<patternProperties:^attr_>"))
    assert(r(2)._1 === false)
    assert(r(2)._2 === Seq("unexpected additional property 'rogue': $"))

    // a declared key that ALSO matches a pattern runs both checks
    val both = """{"type":"object",
                 | "properties": {"attr_x": {"type":"number"}},
                 | "patternProperties": {"^attr_": {"maximum": 10}}}"""
      .stripMargin
    val r2 = run(both, """{"attr_x":5}""", """{"attr_x":50}""")
    assert(r2.map(_._1) === Seq(true, false))
    assert(r2(1)._2 ===
      Seq("number above maximum(10.0): .<patternProperties:^attr_>"))

    // patternProperties recurse: object-valued patterns, and they work
    // through $ref like everything else
    val nested = """{"type":"object",
                   | "definitions": {"pt": {"type":"object",
                   |   "properties": {"v": {"type":"integer"}},
                   |   "required": ["v"]}},
                   | "patternProperties": {"^p[0-9]$":
                   |   {"$ref": "#/definitions/pt"}}}""".stripMargin
    val r3 = run(nested, """{"p1":{"v":1},"p2":{"v":2}}""",
      """{"p1":{}}""")
    assert(r3.map(_._1) === Seq(true, false))
    assert(r3(1)._2 === Seq(
      "missing required field: .<patternProperties:^p[0-9]$>.v"))
  }

  test("vec_dot matches a hand computation and handles length mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 1.0), Seq(2.0)))
      .toDF("a", "b")
      .select(V.dot(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(32.0, 2.0))
  }

  test("quantize_i8 kernel: reconstruction within half-step, matches q53") {
    import spark.implicits._
    val vecs = (1 to 40).map(i =>
      i.toLong -> Seq.tabulate(16)(j => math.sin(i * 31 + j * 7) * (i % 5 + 1)))
    val rows = vecs.toDF("id", "v")
      .select(col("id"), col("v"), V.quantizeI8(col("v")).as("z"))
      .select(col("id"), col("v"), col("z.scale"), col("z.mse"), col("z.q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val scale = r.getDouble(2)
      val q = r.getSeq[Byte](4)
      assert(q.length === v.length)
      // every element reconstructs within half a quantization step
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(x - c / scale) <= 0.5 / scale + 1e-12,
          s"x=$x c=$c scale=$scale")
      }
      // kernel mse equals the declarative formulation's
      val mseRef = v.zip(q).map { case (x, c) =>
        val e = x - c / scale; e * e
      }.sum / v.length
      assert(math.abs(r.getDouble(3) - mseRef) < 1e-15)
    }
  }

  test("pq_encode: argmin codes with lowest-code ties; ADC reconstructs " +
    "exactly when residuals are codebook rows") {
    import spark.implicits._
    // m=2 subspaces of 2 dims, ksub=2: codebook rows per subspace
    // j=0: [0,0] (code 0), [1,0] (code 1); j=1: [0,1] (c0), [0,-1] (c1)
    val cb = Array(0.0, 0.0, 1.0, 0.0, /* j=1 */ 0.0, 1.0, 0.0, -1.0)
    val cent = Seq(0.0, 0.0, 0.0, 0.0) // zero centroid → residual = vec
    val df = Seq(
      Seq(1.0, 0.0, 0.0, -1.0), // codes (1, 1)
      Seq(0.0, 0.0, 0.0, 1.0), // codes (0, 0)
      Seq(0.5, 0.0, 0.0, 0.0)) // j0 equidistant to both rows → code 0
      .toDF("v")
      .select(V.pqEncode(col("v"), typedlit(cent), cb, 2, 2).as("c"))
    val got = df.collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(got(0) === Seq[Byte](1, 1))
    assert(got(1) === Seq[Byte](0, 0))
    assert(got(2) === Seq[Byte](0, 0)) // tie → lowest code
    // ADC with lut[j][c] = dot(q_sub_j, cb[j][c]) recovers dot(q, v)
    // exactly for vectors whose residuals ARE codebook rows
    val q = Array(0.3, 0.7, -0.2, 0.4)
    val lut = Array(
      q(0) * 0.0 + q(1) * 0.0, q(0) * 1.0 + q(1) * 0.0,
      q(2) * 0.0 + q(3) * 1.0, q(2) * 0.0 + q(3) * -1.0)
    val adc = Seq((Array[Byte](1, 1), 0.0), (Array[Byte](0, 0), 0.0))
      .toDF("codes", "cd")
      .select(V.pqAdcDot(col("codes"), col("cd"), lut, 2).as("s"))
      .collect().map(_.getDouble(0))
    assert(math.abs(adc(0) - (q(0) * 1.0 + q(3) * -1.0)) < 1e-15)
    assert(math.abs(adc(1) - (q(3) * 1.0)) < 1e-15)
  }

  test("pq kernels: codegen and interpreted paths agree") {
    import spark.implicits._
    val cb = Array.tabulate(2 * 4 * 3)(i => math.sin(i * 13).abs)
    val cent = Seq.tabulate(6)(i => math.cos(i * 7) * 0.1)
    val vecs = (1 to 30).map(i =>
      Seq.tabulate(6)(j => math.sin(i * 31 + j * 7)))
    val df = vecs.toDF("v")
    val enc = V.pqEncode(col("v"), typedlit(cent), cb, 2, 4)
    val viaCodegen = df.select(enc.as("c"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq)
    // force the interpreted path through a CodegenFallback-free eval:
    // filter trick is unreliable, so call the kernel directly instead
    val viaKernel = vecs.map { v =>
      graft.functions.VectorFunctions.pqEncodeKernel(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(cent.toArray),
        cb, 2, 4, 3).toSeq
    }
    assert(viaCodegen.toSeq === viaKernel)
  }

  test("random projection: deterministic, and preserves cluster " +
    "structure (JL property) on synthetic data") {
    import spark.implicits._
    // two orthogonal clusters in 32 dims with small deterministic noise
    val rnd = new scala.util.Random(11)
    def noisy(base: Int) = Seq.tabulate(32)(j =>
      (if (j / 16 == base) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
    val vecs = (1 to 40).map(i => (i.toLong, i % 2, noisy(i % 2)))
    val df = vecs.toDF("id", "cl", "v")
      .select(col("id"), col("cl"),
        V.normalized(V.randomProject(V.normalized(col("v")), 8)).as("p"))
    val run1 = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](2)).toMap
    val run2 = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(run1 === run2, "projection must be reproducible")
    run1.values.foreach { p =>
      assert(p.length === 8)
      assert(math.abs(p.map(x => x * x).sum - 1.0) < 1e-9)
    }
    // mean within-cluster projected sim must dominate cross-cluster
    val byCl = vecs.map { case (id, cl, _) => id -> cl }.toMap
    def sim(a: Long, b: Long) =
      run1(a).lazyZip(run1(b)).map(_ * _).sum
    val pairs = for {
      a <- vecs.map(_._1); b <- vecs.map(_._1) if a < b
    } yield (byCl(a) == byCl(b), sim(a, b))
    val within = pairs.filter(_._1).map(_._2)
    val cross = pairs.filterNot(_._1).map(_._2)
    val wMean = within.sum / within.size
    val cMean = cross.sum / cross.size
    assert(wMean > 0.7, s"within-cluster sim collapsed: $wMean")
    assert(wMean - cMean > 0.4,
      s"projection lost cluster separation: within=$wMean cross=$cMean")
  }

  test("vec_dot codegen and interpreted paths agree") {
    import spark.implicits._
    val vecs = (1 to 50).map(i =>
      (Seq.tabulate(16)(j => (i * 31 + j * 7 % 11).toDouble),
        Seq.tabulate(16)(j => (i * 17 + j * 3 % 13).toDouble)))
    val df = vecs.toDF("a", "b")
    val viaExpr = df.select(V.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    val viaHof = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS d")
      .collect().map(_.getDouble(0))
    assert(viaExpr.toSeq === viaHof.toSeq)
  }

  test("normalized vectors have unit norm") {
    import spark.implicits._
    val df = Seq(Seq(3.0, 4.0), Seq(1.0, 0.0, 0.0)).toDF("a")
      .select(V.norm(V.normalized(col("a"))).as("n"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("minhash estimated jaccard is within [0,1] and exact-dup = 1") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq(("x", "a b c d e f g"), ("y", "a b c d e f g"),
      ("z", "h i j k l m n")).toDF("id", "t")
      .select(col("id"), minhashSignature(shingles(col("t"), 3), 8).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("x") === sigs("y"))
    assert(sigs("x") !== sigs("z"))
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq("Hello,  World!", "hello world", "HELLO   WORLD.")
      .toDF("t").select(fingerprint(col("t")).as("f"))
    assert(df.collect().map(_.getString(0)).distinct.length === 1)
  }

  test("simhash hamming distance of identical docs is 0") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq(("same text here", "same text here"),
      ("same text here", "totally different words"))
      .toDF("a", "b")
      .select(hammingDistance(simhash16(col("a")),
        simhash16(col("b"))).as("d"))
    val ds = df.collect().map(_.getAs[Number](0).longValue)
    assert(ds(0) === 0L)
    assert(ds(1) > 0L)
  }
}
