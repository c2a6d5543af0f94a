package graft.functions

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.imageio.metadata.IIOMetadataNode

/** Animated GIF (GIF89a) — full-canvas frame reassembly. ImageIO's GIF
  * reader decodes each data frame as its OWN sub-image (its rectangle,
  * its palette) and does NOT composite; this walks the reader's frames
  * with their per-frame metadata (offsets, delay, disposal) and applies
  * the GIF89a compositing model: frames draw src-over with binary
  * transparency (a transparent index leaves the canvas pixel), disposal
  * `restoreToBackgroundColor` clears the frame rectangle to transparent
  * after display (the practical background for GIFs with a transparent
  * color), `restoreToPrevious` restores the canvas as it was before the
  * frame. The symmetric surface to [[WebpAnim]], so the multimodal
  * frame sampler treats both animation formats alike.
  *
  * Hostile-input posture: canvas validated against a 2^24-pixel cap and
  * frame rectangles against the canvas before allocation; a frame-count
  * cap bounds work; any reader exception returns None.
  *
  * Reference behavior: x/imgresizer/resizer.go:214-264 accepts gif via
  * its linked codec (stills); animation sampling is the training-data
  * extension the reference's pipeline doesn't cover. */
object GifAnim {

  /** One reassembled canvas frame + its display duration. */
  final case class Frame(image: BufferedImage, durationMs: Int)

  private val maxFrames = 1024

  /** Cap on TOTAL retained canvas pixels (frames x canvas) — each
    * emitted frame is a full-canvas ARGB snapshot, so the product is
    * what bounds memory, not either factor alone (same reasoning as
    * [[WebpAnim.maxTotalPixels]]). 2^26 px = 256 MB. */
  private val maxTotalPixels = 1L << 26

  /** Decode a whole animation: full-canvas frames in display order.
    * None for stills (fewer than 2 frames), non-GIF, or malformed
    * bytes. Animations LONGER than the frame/pixel budget are TRUNCATED
    * to the budget-fitting prefix, not rejected: a 2000-frame GIF is
    * real decodable media, and rejecting it wholesale would make the
    * frame sampler fall through to its undecodable-input path for bytes
    * the engine can in fact decode. The canvas cap (2^24 px) and budget
    * (≥4 canvases by construction) still bound every allocation. */
  def decode(b: Array[Byte],
      pixelBudget: Long = maxTotalPixels): Option[Seq[Frame]] = {
    if (b == null || b.length < 13) return None
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))
      return None
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    val in = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      reader.setInput(in, false, false)
      val n = reader.getNumImages(true)
      if (n < 2) return None
      // logical screen: GIF header bytes 6-9 (LE u16 w, h) — present in
      // every GIF; ImageIO's stream metadata mirrors the same values
      val cw = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
      val ch = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      if (cw == 0 || ch == 0 || cw.toLong * ch > (1L << 24)) return None
      val keep = Seq(n.toLong, maxFrames.toLong,
        pixelBudget / (cw.toLong * ch)).min.toInt
      if (keep < 2) return None
      val canvas =
        new BufferedImage(cw, ch, BufferedImage.TYPE_INT_ARGB)
      val g = canvas.createGraphics()
      try {
        val out = Seq.newBuilder[Frame]
        var i = 0
        while (i < keep) {
          // metadata FIRST: the descriptor declares the frame rectangle,
          // and reader.read allocates whatever it declares — validate
          // against the (capped) canvas before any frame allocation
          val meta = gifImageMeta(reader.getImageMetadata(i))
          if (meta.w <= 0 || meta.h <= 0 ||
            meta.x + meta.w > cw || meta.y + meta.h > ch) return None
          val frame = reader.read(i)
          if (frame.getWidth != meta.w || frame.getHeight != meta.h)
            return None
          val before =
            if (meta.disposal == "restoreToPrevious") copy(canvas) else null
          // GIF transparency is binary: SRC_OVER with the reader's
          // IndexColorModel alpha (0 or 255) is exactly the spec's
          // "transparent pixels leave the canvas"
          g.drawImage(frame, meta.x, meta.y, null)
          out += Frame(copy(canvas), meta.delayMs)
          meta.disposal match {
            case "restoreToBackgroundColor" =>
              // the practical background: transparent (browsers render
              // the background color only where no transparency exists)
              val comp = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Clear)
              g.fillRect(meta.x, meta.y, frame.getWidth, frame.getHeight)
              g.setComposite(comp)
            case "restoreToPrevious" =>
              val comp = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Src)
              g.drawImage(before, 0, 0, null)
              g.setComposite(comp)
            case _ => () // none / doNotDispose: leave the canvas
          }
          i += 1
        }
        Some(out.result())
      } finally g.dispose()
    } catch {
      case _: Exception => None
    } finally {
      reader.dispose()
      in.close()
    }
  }

  private def copy(img: BufferedImage): BufferedImage = {
    val o = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_ARGB)
    val g = o.createGraphics()
    g.setComposite(java.awt.AlphaComposite.Src)
    g.drawImage(img, 0, 0, null)
    g.dispose()
    o
  }

  private final case class Meta(x: Int, y: Int, w: Int, h: Int,
      delayMs: Int, disposal: String)

  /** Per-frame GIF metadata from ImageIO's native tree
    * (`javax_imageio_gif_image_1.0`): ImageDescriptor carries the
    * frame rectangle (offsets AND size — read before decoding, so
    * hostile rectangles reject pre-allocation), GraphicControlExtension
    * the delay (in centiseconds) and disposal method. */
  private def gifImageMeta(
      m: javax.imageio.metadata.IIOMetadata): Meta = {
    val root = m.getAsTree("javax_imageio_gif_image_1.0")
      .asInstanceOf[IIOMetadataNode]
    var x = 0; var y = 0; var w = 0; var h = 0; var delay = 0
    var disposal = "none"
    val kids = root.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      kids.item(i) match {
        case e: IIOMetadataNode if e.getNodeName == "ImageDescriptor" =>
          x = e.getAttribute("imageLeftPosition").toInt
          y = e.getAttribute("imageTopPosition").toInt
          w = e.getAttribute("imageWidth").toInt
          h = e.getAttribute("imageHeight").toInt
        case e: IIOMetadataNode
            if e.getNodeName == "GraphicControlExtension" =>
          delay = e.getAttribute("delayTime").toInt * 10
          disposal = e.getAttribute("disposalMethod")
        case _ => ()
      }
      i += 1
    }
    Meta(x, y, w, h, delay, disposal)
  }
}
