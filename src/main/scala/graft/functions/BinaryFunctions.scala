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
  *    via javax.imageio. webp/tiff decode and svg rasterization need codecs
  *    this environment doesn't ship — those return null (documented stub),
  *    while format *sniffing* still works for all seven reference formats.
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

  private def decode(b: Array[Byte]): Option[BufferedImage] =
    sniffFormat(b) match {
      case "png" | "jpeg" | "gif" | "bmp" =>
        Option(ImageIO.read(new ByteArrayInputStream(b)))
      case _ => None // webp/tiff/svg: codec not shipped here — stubbed
    }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class ImgMeta(width: Int, height: Int, format: String)

  private val metaUdf = udf((b: Array[Byte]) =>
    if (b == null) None
    else decode(b).map(i => ImgMeta(i.getWidth, i.getHeight, sniffFormat(b))))

  /** Decode → struct(width, height, format); null when no codec. */
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
}
