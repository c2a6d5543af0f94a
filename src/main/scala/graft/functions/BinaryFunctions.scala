package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary/multimodal column operators (SURVEY §2.10 / C10-C11; north-star
  * "multimodal columns").
  *
  * The reference gzip-compresses images before shipping to storage
  * (x/imgresizer/resizer.go:271-291, x/imgstorage/storage.go:44-59), sniffs
  * formats by magic bytes / SVG text probe (resizer.go:214-264) and resizes
  * to fixed resolutions (resizer.go:176-188; defaults 200×150 and 120×90,
  * x/common/config.go:133-136).
  *
  * Implementation notes:
  *  - gzip/gunzip and the image codecs are scalar UDFs over BinaryType —
  *    per-row narrow compute, no shuffle, safe at any scale. UDF (not
  *    codegen Expression) is the right tier here: the cost is the codec
  *    itself, not the dispatch.
  *  - Decode/resize is REAL for the JDK-native rasters (png/jpeg/gif/bmp)
  *    via javax.imageio, for baseline TIFF (none/LZW/Deflate strips,
  *    Predictor=2) via a pure-JVM IFD parser ([[decodeTiff]]), for SVG via
  *    a pure-JVM rasterizer ([[rasterizeSvg]]), and for webp — BOTH
  *    codings — via the pure-JVM VP8L decoder ([[graft.functions.Vp8l]])
  *    and the VP8 keyframe decoder ([[graft.functions.Vp8]], bit-exact
  *    with libwebp at the YUV level). All seven reference formats sniff
  *    AND decode.
  *  - Deterministic: same bytes → same output bytes (PNG encode).
  */
object BinaryFunctions {

  // --- gzip ---------------------------------------------------------------

  def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  def gunzipBytes(data: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(data))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  private val gzipUdf = udf((b: Array[Byte]) =>
    if (b == null) null else gzipBytes(b))
  private val gunzipUdf = udf((b: Array[Byte]) =>
    if (b == null) null else gunzipBytes(b))

  def gzip(c: Column): Column = gzipUdf(c)
  def gunzip(c: Column): Column = gunzipUdf(c)

  // --- format sniffing (resizer.go:214-264 magic-byte table) --------------

  def sniffFormat(b: Array[Byte]): String = {
    def at(i: Int): Int = b(i) & 0xff
    if (b == null || b.length < 4) null
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
      "png"
    else if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') "gif"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (b.length >= 12 && at(0) == 'R' && at(1) == 'I' && at(2) == 'F'
      && at(3) == 'F' && at(8) == 'W' && at(9) == 'E' && at(10) == 'B'
      && at(11) == 'P') "webp"
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 42 && at(3) == 0)
      || (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 42)) "tiff"
    else {
      // SVG probe: the reference sniffs leading XML/svg text
      // (resizer.go:218-226).
      val head = new String(b, 0, math.min(b.length, 256), "UTF-8")
      val t = head.dropWhile(_.isWhitespace)
      if (t.startsWith("<svg") || (t.startsWith("<?xml")
        && head.contains("<svg"))) "svg"
      else null
    }
  }

  private val formatUdf = udf((b: Array[Byte]) => sniffFormat(b))

  /** Magic-byte format sniff: png/jpeg/gif/bmp/webp/tiff/svg, else null. */
  def imgFormat(c: Column): Column = formatUdf(c)

  // --- decode / meta / resize (real for JDK rasters) ----------------------

  private[graft] def decode(b: Array[Byte]): Option[BufferedImage] =
    sniffFormat(b) match {
      case "png" | "jpeg" | "gif" | "bmp" =>
        // corrupt-but-sniffable bytes (a PNG magic on garbage) make
        // ImageIO.read THROW, not return null — errors are data here,
        // same contract as the tiff/svg/webp branches
        try Option(ImageIO.read(new ByteArrayInputStream(b)))
        catch { case _: Exception => None }
      case "tiff" => decodeTiff(b)
      case "svg" => rasterizeSvg(b)
      case "webp" => Vp8l.decode(b) // VP8L (lossless) + "VP8 " (lossy
      // keyframe, graft.functions.Vp8) both decode pure-JVM
      case _ => None
    }

  // --- SVG (shape subset) — pure-JVM rasterizer ---------------------------

  /** Rasterize an SVG SUBSET with the JDK only (XML parse + Graphics2D):
    * rect / circle / ellipse / line / polygon / polyline / path (full
    * M/L/H/V/C/S/Q/T/A/Z command set, [[parseSvgPath]]) with fill/stroke
    * (named or #hex colors, and `url(#id)` linearGradient references —
    * objectBoundingBox or userSpaceOnUse units, %/fraction offsets),
    * `transform` on elements and groups ([[parseSvgTransform]]),
    * honoring width/height/viewBox. Covers the icon/placeholder/path
    * SVGs of an NFT metadata pipeline; text/CSS/radial gradients are
    * what a real library (the reference's oksvg, resizer.go:251-264)
    * adds. Unsupported content renders as the background — never an
    * exception. */
  def rasterizeSvg(b: Array[Byte]): Option[BufferedImage] = try {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // no external entity resolution (untrusted bytes)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder()
      .parse(new ByteArrayInputStream(b))
    val svg = doc.getDocumentElement
    if (svg.getTagName != "svg") return None

    def numAttr(e: org.w3c.dom.Element, a: String, dflt: Double): Double = {
      val v = e.getAttribute(a)
      if (v.isEmpty) dflt
      else try v.replaceAll("[a-z%]+$", "").toDouble catch {
        case _: NumberFormatException => dflt
      }
    }
    val viewBox = svg.getAttribute("viewBox").trim
      .split("[ ,]+").filter(_.nonEmpty).flatMap(s =>
        try Some(s.toDouble) catch { case _: NumberFormatException => None })
    val (vbW, vbH) =
      if (viewBox.length == 4) (viewBox(2), viewBox(3)) else (0.0, 0.0)
    val w = math.max(1, numAttr(svg, "width", if (vbW > 0) vbW else 64).toInt)
    val h = math.max(1, numAttr(svg, "height", if (vbH > 0) vbH else 64).toInt)

    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_ANTIALIASING,
      java.awt.RenderingHints.VALUE_ANTIALIAS_OFF)
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, w, h)
    if (vbW > 0 && vbH > 0) {
      g.scale(w / vbW, h / vbH)
      if (viewBox.length == 4) g.translate(-viewBox(0), -viewBox(1))
    }

    def color(spec: String): Option[java.awt.Color] = spec.trim match {
      case "" | "none" => None
      case s if s.startsWith("#") && s.length == 7 =>
        Some(new java.awt.Color(Integer.parseInt(s.substring(1), 16)))
      case s if s.startsWith("#") && s.length == 4 =>
        val r = s(1).asDigit * 17; val gg = s(2).asDigit * 17
        val bb = s(3).asDigit * 17
        Some(new java.awt.Color(r, gg, bb))
      case named => namedColors.get(named.toLowerCase)
    }

    // <linearGradient> defs, collected up front so fill="url(#id)"
    // resolves regardless of document order. Fractional coordinate
    // ("0.3"/"30%") pairs map onto the SHAPE's bounding box
    // (objectBoundingBox, the SVG default); gradientUnits=
    // "userSpaceOnUse" takes them as absolute user coordinates.
    case class Grad(x1: Double, y1: Double, x2: Double, y2: Double,
        userSpace: Boolean, fracs: Array[Float],
        colors: Array[java.awt.Color])
    val gradients: Map[String, Grad] = {
      val out = scala.collection.mutable.Map[String, Grad]()
      val gs = doc.getElementsByTagName("linearGradient")
      for (gi <- 0 until gs.getLength) {
        val e = gs.item(gi).asInstanceOf[org.w3c.dom.Element]
        def frac(a: String, d: Double): Double = {
          val v = e.getAttribute(a)
          if (v.isEmpty) d
          else if (v.endsWith("%"))
            try v.dropRight(1).toDouble / 100 catch {
              case _: NumberFormatException => d
            }
          else try v.toDouble catch { case _: NumberFormatException => d }
        }
        val stopsN = e.getElementsByTagName("stop")
        val stops = (0 until stopsN.getLength).flatMap { si =>
          val st = stopsN.item(si).asInstanceOf[org.w3c.dom.Element]
          val off = {
            val o = st.getAttribute("offset")
            if (o.endsWith("%"))
              try o.dropRight(1).toDouble / 100 catch {
                case _: NumberFormatException => 0.0
              }
            else try o.toDouble catch { case _: NumberFormatException => 0.0 }
          }
          color(st.getAttribute("stop-color"))
            .map(c => (math.max(0.0, math.min(1.0, off)).toFloat, c))
        }
        if (e.getAttribute("id").nonEmpty && stops.nonEmpty) {
          // Java requires strictly increasing fractions in [0,1]. Nudge
          // duplicates forward, then cap from the back so trailing
          // duplicates at 1.0 push EARLIER stops downward (the common
          // hard-stop pattern offsets 0,1,1 stays renderable) instead of
          // clamping into a non-increasing run that would make
          // LinearGradientPaint throw and blank the whole document.
          val sorted = stops.sortBy(_._1)
          val fr = new Array[Float](sorted.length)
          val co = new Array[java.awt.Color](sorted.length)
          var prev = -1.0f
          for (k <- sorted.indices) {
            var f = sorted(k)._1
            if (f <= prev) f = prev + 1e-4f
            fr(k) = f; co(k) = sorted(k)._2; prev = f
          }
          var cap = 1.0f
          for (k <- sorted.indices.reverse) {
            if (fr(k) > cap) fr(k) = cap
            cap = fr(k) - 1e-4f
          }
          // a pile-up of >10k duplicate offsets can push head stops below
          // 0: drop those, keep the tail (later stops win in SVG)
          val keep = fr.indices.filter(fr(_) >= 0.0f)
          out(e.getAttribute("id")) = Grad(
            frac("x1", 0), frac("y1", 0), frac("x2", 1), frac("y2", 0),
            e.getAttribute("gradientUnits") == "userSpaceOnUse",
            keep.map(fr).toArray, keep.map(co).toArray)
        }
      }
      out.toMap
    }

    val urlRef = "url\\(#([^)]+)\\)".r
    def paintFor(spec: String, s: java.awt.Shape)
        : Option[java.awt.Paint] = spec.trim match {
      case urlRef(id) => gradients.get(id).map { gr =>
        val b = s.getBounds2D
        def pt(fx: Double, fy: Double) =
          if (gr.userSpace) new java.awt.geom.Point2D.Double(fx, fy)
          else new java.awt.geom.Point2D.Double(
            b.getX + fx * b.getWidth, b.getY + fy * b.getHeight)
        val p1 = pt(gr.x1, gr.y1)
        var p2 = pt(gr.x2, gr.y2)
        if (p1.equals(p2)) // degenerate axis: Java refuses, SVG says
          p2 = new java.awt.geom.Point2D.Double(p2.getX + 1e-3, p2.getY)
        if (gr.fracs.length == 1) gr.colors(0)
        else new java.awt.LinearGradientPaint(p1, p2, gr.fracs, gr.colors)
      }
      case other => color(other)
    }

    // depth-capped: StackOverflowError from adversarially nested XML is an
    // Error the Exception catch below would never reach
    def render(n: org.w3c.dom.Node, depth: Int = 0): Unit = n match {
      case _ if depth > 128 => ()
      case e: org.w3c.dom.Element =>
        def na(a: String, d: Double = 0.0) = numAttr(e, a, d)
        // transform applies to the element AND its children (g groups);
        // restored after the subtree renders
        val savedTf = {
          val tf = e.getAttribute("transform")
          if (tf.isEmpty) None
          else {
            val t = g.getTransform
            g.transform(parseSvgTransform(tf))
            Some(t)
          }
        }
        val shape: Option[java.awt.Shape] = e.getTagName match {
          case "rect" => Some(new java.awt.geom.Rectangle2D.Double(
            na("x"), na("y"), na("width"), na("height")))
          case "circle" =>
            val r = na("r")
            Some(new java.awt.geom.Ellipse2D.Double(
              na("cx") - r, na("cy") - r, 2 * r, 2 * r))
          case "ellipse" =>
            val (rx, ry) = (na("rx"), na("ry"))
            Some(new java.awt.geom.Ellipse2D.Double(
              na("cx") - rx, na("cy") - ry, 2 * rx, 2 * ry))
          case "line" => Some(new java.awt.geom.Line2D.Double(
            na("x1"), na("y1"), na("x2"), na("y2")))
          case "polygon" | "polyline" =>
            val pts = e.getAttribute("points").trim
              .split("[ ,]+").filter(_.nonEmpty)
              .flatMap(s => try Some(s.toDouble)
                catch { case _: NumberFormatException => None })
            if (pts.length >= 4) {
              val p = new java.awt.geom.Path2D.Double()
              p.moveTo(pts(0), pts(1))
              (1 until pts.length / 2).foreach(i =>
                p.lineTo(pts(2 * i), pts(2 * i + 1)))
              if (e.getTagName == "polygon") p.closePath()
              Some(p)
            } else None
          case "path" => parseSvgPath(e.getAttribute("d"))
          case _ => None // g/text/...: recurse only
        }
        shape.foreach { s =>
          // explicit fill always honored (polyline IS fillable in SVG);
          // only the DEFAULT black fill is suppressed for line/polyline
          val unfilledByDefault =
            e.getTagName == "line" || e.getTagName == "polyline"
          paintFor(e.getAttribute("fill"), s)
            .orElse(if (e.hasAttribute("fill") || unfilledByDefault) None
              else Some(java.awt.Color.BLACK)) // SVG default fill
            .foreach { c => g.setPaint(c); g.fill(s) }
          paintFor(e.getAttribute("stroke"), s).foreach { c =>
            g.setStroke(new java.awt.BasicStroke(
              math.max(1.0, na("stroke-width", 1.0)).toFloat))
            g.setPaint(c); g.draw(s)
          }
        }
        val kids = e.getChildNodes
        (0 until kids.getLength).foreach(i => render(kids.item(i), depth + 1))
        savedTf.foreach(g.setTransform)
      case _ => ()
    }
    render(svg)
    g.dispose()
    Some(img)
  } catch { case _: Exception => None }

  /** SVG `transform` list → AffineTransform: translate / scale / rotate
    * (with optional center) / skewX / skewY / matrix, applied in source
    * order (each concatenates on the right, the SVG composition rule). */
  private[functions] def parseSvgTransform(s: String)
      : java.awt.geom.AffineTransform = {
    val at = new java.awt.geom.AffineTransform()
    val m = java.util.regex.Pattern
      .compile("(matrix|translate|scale|rotate|skewX|skewY)\\s*\\(([^)]*)\\)")
      .matcher(s)
    while (m.find()) {
      val a = m.group(2).split("[ ,]+").filter(_.nonEmpty).flatMap(v =>
        try Some(v.toDouble) catch { case _: NumberFormatException => None })
      (m.group(1), a.length) match {
        case ("matrix", 6) => at.concatenate(new java.awt.geom.AffineTransform(
          a(0), a(1), a(2), a(3), a(4), a(5)))
        case ("translate", l) if l >= 1 =>
          at.translate(a(0), if (l > 1) a(1) else 0.0)
        case ("scale", l) if l >= 1 =>
          at.scale(a(0), if (l > 1) a(1) else a(0))
        case ("rotate", l) if l >= 3 =>
          at.rotate(math.toRadians(a(0)), a(1), a(2))
        case ("rotate", l) if l >= 1 => at.rotate(math.toRadians(a(0)))
        case ("skewX", l) if l >= 1 =>
          at.concatenate(new java.awt.geom.AffineTransform(
            1, 0, math.tan(math.toRadians(a(0))), 1, 0, 0))
        case ("skewY", l) if l >= 1 =>
          at.concatenate(new java.awt.geom.AffineTransform(
            1, math.tan(math.toRadians(a(0))), 0, 1, 0, 0))
        case _ => ()
      }
    }
    at
  }

  /** SVG path `d` parser: M/L/H/V/C/S/Q/T/A/Z, absolute and relative,
    * implicit command repetition, smooth-control reflection, and
    * elliptical arcs via the spec's endpoint→center conversion. Flags in
    * arc commands must be whitespace/comma-separated (the common
    * serialization); a malformed d renders nothing rather than throwing. */
  private[functions] def parseSvgPath(d: String)
      : Option[java.awt.geom.Path2D.Double] = try {
    if (d == null || d.trim.isEmpty) return None
    val tok = java.util.regex.Pattern.compile(
      "([MmLlHhVvCcSsQqTtAaZz])|(-?(?:\\d*\\.\\d+|\\d+\\.?)(?:[eE][-+]?\\d+)?)")
      .matcher(d)
    val toks = scala.collection.mutable.ArrayBuffer[Either[Char, Double]]()
    while (tok.find())
      toks += (if (tok.group(1) != null) Left(tok.group(1).head)
               else Right(tok.group(2).toDouble))
    val p = new java.awt.geom.Path2D.Double()
    var i = 0
    var cmd = ' '
    var cx = 0.0; var cy = 0.0 // current point
    var sx = 0.0; var sy = 0.0 // subpath start
    var pcx = 0.0; var pcy = 0.0 // previous control point (for S/T)
    var prevCmd = ' '
    def num(): Double = toks(i) match {
      case Right(v) => i += 1; v
      case Left(c) => throw new IllegalArgumentException(s"number, got $c")
    }
    def hasNum: Boolean = i < toks.length && toks(i).isRight
    while (i < toks.length) {
      toks(i) match {
        case Left(c) => cmd = c; i += 1
        case Right(_) => // implicit repeat; M/m repeats as L/l
          if (cmd == ' ' || cmd == 'Z' || cmd == 'z')
            throw new IllegalArgumentException("orphan number in d")
          cmd = if (cmd == 'M') 'L' else if (cmd == 'm') 'l' else cmd
      }
      val rel = cmd.isLower
      def rx0 = if (rel) cx else 0.0
      def ry0 = if (rel) cy else 0.0
      cmd.toUpper match {
        case 'M' =>
          cx = rx0 + num(); cy = ry0 + num()
          p.moveTo(cx, cy); sx = cx; sy = cy
        case 'L' =>
          cx = rx0 + num(); cy = ry0 + num(); p.lineTo(cx, cy)
        case 'H' => cx = rx0 + num(); p.lineTo(cx, cy)
        case 'V' => cy = ry0 + num(); p.lineTo(cx, cy)
        case 'C' =>
          val x1 = rx0 + num(); val y1 = ry0 + num()
          val x2 = rx0 + num(); val y2 = ry0 + num()
          cx = rx0 + num(); cy = ry0 + num()
          p.curveTo(x1, y1, x2, y2, cx, cy); pcx = x2; pcy = y2
        case 'S' =>
          val (x1, y1) =
            if ("CcSs".indexOf(prevCmd) >= 0) (2 * cx - pcx, 2 * cy - pcy)
            else (cx, cy)
          val x2 = rx0 + num(); val y2 = ry0 + num()
          cx = rx0 + num(); cy = ry0 + num()
          p.curveTo(x1, y1, x2, y2, cx, cy); pcx = x2; pcy = y2
        case 'Q' =>
          val x1 = rx0 + num(); val y1 = ry0 + num()
          cx = rx0 + num(); cy = ry0 + num()
          p.quadTo(x1, y1, cx, cy); pcx = x1; pcy = y1
        case 'T' =>
          val (x1, y1) =
            if ("QqTt".indexOf(prevCmd) >= 0) (2 * cx - pcx, 2 * cy - pcy)
            else (cx, cy)
          cx = rx0 + num(); cy = ry0 + num()
          p.quadTo(x1, y1, cx, cy); pcx = x1; pcy = y1
        case 'A' =>
          val arx = math.abs(num()); val ary = math.abs(num())
          val phi = math.toRadians(num())
          val largeArc = num() != 0; val sweep = num() != 0
          val x0 = cx; val y0 = cy
          cx = rx0 + num(); cy = ry0 + num()
          appendArc(p, x0, y0, arx, ary, phi, largeArc, sweep, cx, cy)
        case 'Z' =>
          p.closePath(); cx = sx; cy = sy
        case _ => ()
      }
      prevCmd = cmd
    }
    Some(p)
  } catch { case _: Exception => None }

  /** SVG elliptical arc, endpoint parameterization → center form
    * (SVG spec appendix F.6.5), appended as a rotated Arc2D. Java2D
    * measures angles counterclockwise with y UP, SVG has y DOWN, so the
    * angles negate. */
  private def appendArc(p: java.awt.geom.Path2D.Double,
      x0: Double, y0: Double, rxIn: Double, ryIn: Double, phi: Double,
      largeArc: Boolean, sweep: Boolean, x1: Double, y1: Double): Unit = {
    if (rxIn == 0 || ryIn == 0 || (x0 == x1 && y0 == y1)) {
      p.lineTo(x1, y1); return
    }
    val cosP = math.cos(phi); val sinP = math.sin(phi)
    val dx2 = (x0 - x1) / 2; val dy2 = (y0 - y1) / 2
    val x1p = cosP * dx2 + sinP * dy2
    val y1p = -sinP * dx2 + cosP * dy2
    // scale radii up if the endpoints cannot be connected (F.6.6)
    var rx = rxIn; var ry = ryIn
    val lambda = (x1p * x1p) / (rx * rx) + (y1p * y1p) / (ry * ry)
    if (lambda > 1) { val s = math.sqrt(lambda); rx *= s; ry *= s }
    val num0 = rx * rx * ry * ry - rx * rx * y1p * y1p - ry * ry * x1p * x1p
    val den = rx * rx * y1p * y1p + ry * ry * x1p * x1p
    val co = (if (largeArc != sweep) 1 else -1) *
      math.sqrt(math.max(0, num0 / den))
    val cxp = co * rx * y1p / ry
    val cyp = -co * ry * x1p / rx
    val ccx = cosP * cxp - sinP * cyp + (x0 + x1) / 2
    val ccy = sinP * cxp + cosP * cyp + (y0 + y1) / 2
    def angle(ux: Double, uy: Double, vx: Double, vy: Double): Double = {
      val dot = ux * vx + uy * vy
      val len = math.sqrt((ux * ux + uy * uy) * (vx * vx + vy * vy))
      val a = math.acos(math.max(-1, math.min(1, dot / len)))
      if (ux * vy - uy * vx < 0) -a else a
    }
    val theta1 = angle(1, 0, (x1p - cxp) / rx, (y1p - cyp) / ry)
    var dTheta = angle((x1p - cxp) / rx, (y1p - cyp) / ry,
      (-x1p - cxp) / rx, (-y1p - cyp) / ry)
    if (!sweep && dTheta > 0) dTheta -= 2 * math.Pi
    if (sweep && dTheta < 0) dTheta += 2 * math.Pi
    val arc = new java.awt.geom.Arc2D.Double(
      ccx - rx, ccy - ry, 2 * rx, 2 * ry,
      -math.toDegrees(theta1), -math.toDegrees(dTheta),
      java.awt.geom.Arc2D.OPEN)
    val shape =
      if (phi != 0)
        java.awt.geom.AffineTransform.getRotateInstance(phi, ccx, ccy)
          .createTransformedShape(arc)
      else arc
    p.append(shape, true) // connect: keeps the subpath continuous
  }

  private val namedColors: Map[String, java.awt.Color] = Map(
    "black" -> java.awt.Color.BLACK, "white" -> java.awt.Color.WHITE,
    "red" -> java.awt.Color.RED, "green" -> new java.awt.Color(0, 128, 0),
    "blue" -> java.awt.Color.BLUE, "yellow" -> java.awt.Color.YELLOW,
    "gray" -> java.awt.Color.GRAY, "grey" -> java.awt.Color.GRAY,
    "orange" -> java.awt.Color.ORANGE, "purple" -> new java.awt.Color(128, 0, 128),
    "cyan" -> java.awt.Color.CYAN, "magenta" -> java.awt.Color.MAGENTA)

  // --- TIFF (baseline, uncompressed) — pure-JVM codec ---------------------

  /** TIFF LZW strip decompression (TIFF 6 §13, the variant
    * `x/image/tiff` decodes): MSB-first bit packing, ClearCode 256,
    * EOI 257, 9→12 bit codes with the spec's EARLY code-width change
    * (the width bumps one code before the table actually fills).
    * Returns bytes written, or -1 on malformed input. The dictionary is
    * prefix-linked arrays (no per-entry strings): an entry's bytes are
    * materialized by walking the chain backwards into `dst`. */
  private def lzwDecode(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Int = {
    val Clear = 256; val Eoi = 257; val MaxCode = 4096
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Byte](MaxCode)
    val length = new Array[Int](MaxCode)
    var i = 0
    while (i < 256) { prefix(i) = -1; suffix(i) = i.toByte; length(i) = 1; i += 1 }
    var next = 258; var width = 9
    var acc = 0L; var nBits = 0; var pos = srcOff
    val end = srcOff + srcLen
    def read(): Int = {
      while (nBits < width) {
        if (pos >= end) return Eoi // truncated stream: stop cleanly
        acc = (acc << 8) | (src(pos) & 0xffL); pos += 1; nBits += 8
      }
      nBits -= width
      ((acc >>> nBits) & ((1 << width) - 1)).toInt
    }
    // write table entry `c`'s bytes at out; returns new out or -1
    def emit(c: Int, out: Int): Int = {
      val n = length(c)
      if (out + n > dstLen) return -1
      var k = out + n - 1; var e = c
      while (e >= 0) { dst(dstOff + k) = suffix(e); k -= 1; e = prefix(e) }
      out + n
    }
    var out = 0; var old = -1
    var code = read()
    while (code != Eoi && out < dstLen) {
      if (code == Clear) {
        next = 258; width = 9; old = -1
        code = read()
        if (code == Eoi) return out
        if (code > 255) return -1 // first code after Clear must be a root
        out = emit(code, out); if (out < 0) return -1
        old = code
      } else {
        if (old < 0) return -1
        if (code < next) {
          val start = out
          out = emit(code, out); if (out < 0) return -1
          if (next < MaxCode) {
            prefix(next) = old; suffix(next) = dst(dstOff + start)
            length(next) = length(old) + 1; next += 1
          }
        } else if (code == next && next < MaxCode) {
          // KwKwK: entry = string(old) + first byte of string(old)
          val start = out
          out = emit(old, out); if (out < 0) return -1
          if (out + 1 > dstLen) return -1
          dst(dstOff + out) = dst(dstOff + start); out += 1
          prefix(next) = old; suffix(next) = dst(dstOff + start)
          length(next) = length(old) + 1; next += 1
        } else return -1 // code beyond the table: corrupt
        old = code
        // EARLY change, decoder side: the decoder's table lags the
        // writer's by one entry (it adds an entry only after seeing the
        // NEXT code), so it widens one entry before the writer's
        // 511/1023/2047 switch points
        if (next == 510 || next == 1022 || next == 2046) width += 1
      }
      if (out >= dstLen) return out
      code = read()
    }
    out
  }

  /** Decode a baseline TIFF — 8 bits/sample, grayscale
    * (PhotometricInterpretation=1) or RGB/RGBA (PI=2), strip
    * organization, both II and MM byte orders — with no native codec,
    * closing the tiff arm of the reference's format table
    * (x/imgresizer/resizer.go:248-249, backed by `x/image/tiff`).
    * Compression: 1 (none), 5 (LZW, [[lzwDecode]]) and 8 (Deflate, via
    * java.util.zip) — `x/image/tiff`'s codec set minus the PackBits
    * legacy arm; horizontal-differencing Predictor=2 (the usual LZW
    * companion) is inverted per row. Other compressions return None. */
  def decodeTiff(b: Array[Byte]): Option[BufferedImage] = try {
    if (b == null || b.length < 8) return None
    val le = b(0) == 'I'.toByte && b(1) == 'I'.toByte
    if (!le && !(b(0) == 'M'.toByte && b(1) == 'M'.toByte)) return None
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    if (u16(2) != 42) return None

    val ifd = u32(4).toInt
    val nEntries = u16(ifd)
    // entry value(s): SHORT(3)/LONG(4), inline when they fit in 4 bytes,
    // else stored at the offset the value field points to
    def vals(entryPos: Int): Seq[Long] = {
      val typ = u16(entryPos + 2)
      val cnt = u32(entryPos + 4).toInt
      val elemSize = if (typ == 3) 2 else 4
      val pos =
        if (elemSize * cnt <= 4) entryPos + 8 else u32(entryPos + 8).toInt
      (0 until cnt).map(i =>
        if (typ == 3) u16(pos + i * elemSize).toLong else u32(pos + i * elemSize))
    }
    var width, height, spp = 0
    var compression, photometric = -1
    var predictor = 1
    var rowsPerStripRaw = Long.MaxValue
    var bits: Seq[Long] = Seq(8L)
    var stripOffsets, stripCounts: Seq[Long] = Nil
    for (e <- 0 until nEntries) {
      val pos = ifd + 2 + e * 12
      u16(pos) match {
        case 256 => width = vals(pos).head.toInt
        case 257 => height = vals(pos).head.toInt
        case 258 => bits = vals(pos)
        case 259 => compression = vals(pos).head.toInt
        case 262 => photometric = vals(pos).head.toInt
        case 273 => stripOffsets = vals(pos)
        case 277 => spp = vals(pos).head.toInt
        case 278 => rowsPerStripRaw = vals(pos).head
        case 279 => stripCounts = vals(pos)
        case 317 => predictor = vals(pos).head.toInt
        case _ => ()
      }
    }
    if (spp == 0) spp = 1
    if (!Set(1, 5, 8).contains(compression)) return None
    if (!Set(1, 2).contains(photometric)) return None
    if (width <= 0 || height <= 0 || !bits.forall(_ == 8L)) return None
    if (!Set(1, 3, 4).contains(spp)) return None
    if (!Set(1, 2).contains(predictor)) return None
    // absent tag or the spec's 0xFFFFFFFF default both mean "one strip";
    // clamp to the image height so overflowed values cannot reject or
    // mis-size conforming files
    val rowsPerStrip: Int =
      if (rowsPerStripRaw <= 0 || rowsPerStripRaw > height) height
      else rowsPerStripRaw.toInt
    // validate BEFORE allocating: header-declared dimensions from untrusted
    // bytes must be backed by actual strip data, or a 200-byte file
    // declaring 20000x20000 OOMs the task past the Exception catch.
    // Compressed strips can legitimately be smaller than their output,
    // so those get a hard output cap instead of the byte-sum check.
    val needed = width.toLong * height * spp
    if (compression == 1) {
      if (needed > b.length.toLong ||
        stripOffsets.zip(stripCounts).map(_._2).sum < needed) return None
    } else if (needed > (64L << 20)) return None
    if (stripOffsets.length != stripCounts.length ||
      stripOffsets.isEmpty) return None

    // strips concatenate to exactly width*height*spp sample bytes.
    // Uncompressed strips concatenate by BYTE COUNT (RowsPerStrip is
    // advisory there — some writers omit or mis-state it); compressed
    // strips each decompress to rowsPerStrip rows (the last possibly
    // fewer), which the tag must size correctly.
    val data = new Array[Byte](needed.toInt)
    val rowBytes = width * spp
    var off = 0
    var si = 0
    while (si < stripOffsets.length) {
      val so = stripOffsets(si); val sc = stripCounts(si)
      if (so < 0 || sc < 0 || so + sc > b.length) return None
      val stripRows = math.min(rowsPerStrip.toLong,
        height.toLong - si.toLong * rowsPerStrip)
      if (stripRows <= 0 && compression != 1) return None
      val outLen =
        if (compression == 1) math.min(sc, needed - off).toInt
        else math.min(stripRows * rowBytes, needed - off).toInt
      compression match {
        case 1 =>
          System.arraycopy(b, so.toInt, data, off, outLen)
        case 5 =>
          if (lzwDecode(b, so.toInt, sc.toInt, data, off, outLen) != outLen)
            return None
        case 8 =>
          val inf = new java.util.zip.Inflater()
          try {
            inf.setInput(b, so.toInt, sc.toInt)
            var got = 0
            while (got < outLen && !inf.finished()) {
              val n = inf.inflate(data, off + got, outLen - got)
              // zero progress = truncated input OR a preset-dictionary
              // request (FDICT) — either way hostile/unsupported; a
              // needsDictionary stream would otherwise spin forever
              if (n == 0 &&
                (inf.needsInput() || inf.needsDictionary())) return None
              got += n
            }
            if (got < outLen) return None
          } finally inf.end() // native zlib buffers, freed on EVERY path
      }
      off += outLen
      si += 1
    }
    if (off < data.length) return None
    // Predictor=2: each sample is stored as a delta vs the same sample
    // one pixel to the left; integration is per ROW, so it runs over
    // the assembled image regardless of strip boundaries
    if (predictor == 2) {
      var r = 0
      while (r < height) {
        val rs = r * rowBytes
        var x = spp
        while (x < rowBytes) {
          data(rs + x) = (data(rs + x) + data(rs + x - spp)).toByte
          x += 1
        }
        r += 1
      }
    }

    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * spp
        val rgb =
          if (spp == 1) { val g = data(p) & 0xff; (g << 16) | (g << 8) | g }
          else ((data(p) & 0xff) << 16) | ((data(p + 1) & 0xff) << 8) |
            (data(p + 2) & 0xff)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    Some(img)
  } catch { case _: Exception => None }

  /** Minimal uncompressed RGB TIFF writer (one strip, 8 bits/sample) —
    * synthesizes fixture bytes for specs/bench in either byte order. */
  def encodeTiffRgb(img: BufferedImage, littleEndian: Boolean = true): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val dataLen = w * h * 3
    val dataEnd = 8 + dataLen + (dataLen & 1) // pad strip to even
    val nEntries = 9
    val bpsOffset = dataEnd + 2 + nEntries * 12 + 4
    val out = new Array[Byte](bpsOffset + 6)
    def put16(i: Int, v: Int): Unit =
      if (littleEndian) { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
      else { out(i) = (v >> 8).toByte; out(i + 1) = v.toByte }
    def put32(i: Int, v: Int): Unit =
      if (littleEndian) {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
      } else {
        out(i) = (v >> 24).toByte; out(i + 1) = (v >> 16).toByte
        out(i + 2) = (v >> 8).toByte; out(i + 3) = v.toByte
      }
    out(0) = (if (littleEndian) 'I' else 'M').toByte
    out(1) = out(0)
    put16(2, 42)
    put32(4, dataEnd) // IFD follows the (padded) strip
    var p = 8
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      out(p) = ((rgb >> 16) & 0xff).toByte
      out(p + 1) = ((rgb >> 8) & 0xff).toByte
      out(p + 2) = (rgb & 0xff).toByte
      p += 3
    }
    put16(dataEnd, nEntries)
    def entry(idx: Int, tag: Int, typ: Int, cnt: Int)(writeVal: Int => Unit): Unit = {
      val e = dataEnd + 2 + idx * 12
      put16(e, tag); put16(e + 2, typ); put32(e + 4, cnt); writeVal(e + 8)
    }
    entry(0, 256, 4, 1)(put32(_, w)) // ImageWidth
    entry(1, 257, 4, 1)(put32(_, h)) // ImageLength
    entry(2, 258, 3, 3)(put32(_, bpsOffset)) // BitsPerSample → external
    entry(3, 259, 3, 1)(put16(_, 1)) // Compression: none
    entry(4, 262, 3, 1)(put16(_, 2)) // Photometric: RGB
    entry(5, 273, 4, 1)(put32(_, 8)) // StripOffsets: data at 8
    entry(6, 277, 3, 1)(put16(_, 3)) // SamplesPerPixel
    entry(7, 278, 4, 1)(put32(_, h)) // RowsPerStrip: one strip
    entry(8, 279, 4, 1)(put32(_, dataLen)) // StripByteCounts
    put32(dataEnd + 2 + nEntries * 12, 0) // next IFD: none
    Seq(8, 8, 8).zipWithIndex.foreach { case (v, i) =>
      put16(bpsOffset + i * 2, v)
    }
    out
  }

  private[graft] def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // --- WebP header parse (dimensions without a codec) ---------------------

  /** WebP dimensions from the container/bitstream headers alone — covers
    * all three WebP flavors per the public container spec (the reference
    * decodes webp fully, resizer.go:214-264; LOSSLESS payloads decode
    * through [[Vp8l]] now — this header path serves lossy "VP8 " files
    * (DCT codec not shipped) and metadata-only calls: width/height live in
    * fixed-layout headers):
    *  - VP8X (extended): canvas (width-1, height-1) as 24-bit LE fields;
    *  - VP8L (lossless): 0x2f signature, then 14+14 bits of (w-1, h-1);
    *  - "VP8 " (lossy): keyframe start code 0x9d012a, then 14-bit w/h.
    * Chunk walk is length-clamped — untrusted bytes never index out. */
  def webpDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 20 || sniffFormat(b) != "webp") return None
    def u8(i: Int): Int = b(i) & 0xff
    def u24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    def u32(i: Int): Long = u24(i).toLong | (u8(i + 3).toLong << 24)
    var off = 12 // first chunk after RIFF size + "WEBP"
    while (off + 8 <= b.length) {
      val fourCC = new String(b, off, 4, "US-ASCII")
      val size = u32(off + 4)
      val p = off + 8 // payload start
      fourCC match {
        case "VP8X" if size >= 10 && p + 10 <= b.length =>
          return Some((u24(p + 4) + 1, u24(p + 7) + 1))
        case "VP8L" if size >= 5 && p + 5 <= b.length && u8(p) == 0x2f =>
          val bits = u32(p + 1)
          return Some(((bits & 0x3fff).toInt + 1,
            ((bits >> 14) & 0x3fff).toInt + 1))
        case "VP8 " if size >= 10 && p + 10 <= b.length =>
          // lossy dims only live in a keyframe (bit 0 of the frame tag is
          // 0) behind the 0x9d012a start code
          if ((u8(p) & 1) == 0 && u8(p + 3) == 0x9d && u8(p + 4) == 0x01 &&
            u8(p + 5) == 0x2a)
            return Some(((u8(p + 6) | (u8(p + 7) << 8)) & 0x3fff,
              (u8(p + 8) | (u8(p + 9) << 8)) & 0x3fff))
          return None
        case _ => ()
      }
      // a chunk can never extend past the buffer — also stops Int
      // overflow of the cursor on crafted 2 GB-scale size fields
      if (size < 0 || size > b.length.toLong) return None
      off = p + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    None
  }

  case class ImgMeta(width: Int, height: Int, format: String)

  private val metaUdf = udf((b: Array[Byte]) =>
    if (b == null) None
    else decode(b).map(i => ImgMeta(i.getWidth, i.getHeight, sniffFormat(b)))
      // webp: no pixel codec shipped, but dimensions come from the header
      .orElse(webpDims(b).map { case (w, h) => ImgMeta(w, h, "webp") }))

  /** Decode → struct(width, height, format); null when no codec (webp
    * still reports real header-parsed dimensions). */
  def imgMeta(c: Column): Column = metaUdf(c)

  def resizeImage(b: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decode(b).map { src =>
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      val g = out.createGraphics()
      g.drawImage(src.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH),
        0, 0, null)
      g.dispose()
      encodePng(out)
    }

  private val resizeUdf = udf((b: Array[Byte], w: Int, h: Int) =>
    if (b == null) None else resizeImage(b, w, h))

  /** Resize to (w, h), PNG-encoded — the resizer.go:176-188 analog. */
  def imgResize(c: Column, w: Column, h: Column): Column = resizeUdf(c, w, h)

  /** The reference's default resolution set (config.go:133-136). */
  val defaultResolutions: Seq[(Int, Int)] = Seq((200, 150), (120, 90))

  /** Content-addressed identity — md5(name)+md5(bytes)
    * (x/imgstorage/storage.go:37-62): the dedup key for binary sinks. */
  def contentKey(name: Column, bytes: Column): Column =
    concat(md5(name.cast("binary")), md5(bytes))

  /** Deterministic synthetic image for tests/bench: a (w×h) PNG whose
    * pixels derive from `seed` — stands in for fetched bytes since this
    * environment has no network. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (seed * 2654435761L + x * 31 + y * 17) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  private val synthUdf = udf((seed: Long, w: Int, h: Int) =>
    syntheticPng(seed, w, h))

  def syntheticImage(seed: Column, w: Column, h: Column): Column =
    synthUdf(seed, w, h)

  /** Deterministic synthetic image in a seed-chosen FORMAT (png, tiff,
    * or svg), so a pipeline over mixed fetched bytes exercises the
    * whole decode fan-in, not just the ImageIO arm. TIFF bytes come
    * from [[encodeTiffRgb]] over the same pixel recipe as the PNG; the
    * SVG is a seed-colored shape card the pure-JVM rasterizer covers. */
  def syntheticMedia(seed: Long, w: Int, h: Int): Array[Byte] =
    (seed % 3) match {
      case 0 => syntheticPng(seed, w, h)
      case 1 =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              ((seed * 2654435761L + x * 31 + y * 17) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        encodeTiffRgb(img, littleEndian = seed % 2 == 1)
      case _ =>
        val c = ((seed * 2654435761L) & 0xffffff).toInt
        (s"""<svg width="$w" height="$h">""" +
          f"""<rect x="0" y="0" width="$w" height="$h" fill="#$c%06x"/>""" +
          s"""<circle cx="${w / 2}" cy="${h / 2}" r="${h / 3}" """ +
          """fill="white"/></svg>""").getBytes("UTF-8")
    }

  private val synthMediaUdf = udf((seed: Long, w: Int, h: Int) =>
    syntheticMedia(seed, w, h))

  def syntheticMediaCol(seed: Column, w: Column, h: Column): Column =
    synthMediaUdf(seed, w, h)
}
