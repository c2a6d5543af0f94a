package graft.functions

import java.awt.image.{BufferedImage, DataBuffer, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode
import org.scalatest.funsuite.AnyFunSuite

/** GIF89a reassembly against sequences written by ImageIO's own GIF
  * writer with explicit per-frame metadata (offsets, delay, disposal,
  * transparency) — writer and reader are independent codepaths from the
  * compositor under test, and the expected canvases are computed by
  * hand loops over the GIF89a compositing rules. */
class GifAnimSpec extends AnyFunSuite {

  // palette: 0=transparent, 1=red, 2=green, 3=blue, 4=white
  private val cmap = Array(0x00000000, 0xffff0000, 0xff00ff00,
    0xff0000ff, 0xffffffff).map(_.toInt)
  private val icm =
    new IndexColorModel(8, 5, cmap, 0, true, 0, DataBuffer.TYPE_BYTE)

  /** An indexed frame from a row-major palette-index matrix. */
  private def frame(px: Seq[Seq[Int]]): BufferedImage = {
    val h = px.length; val w = px.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y)(x))
    img
  }

  private def fill(w: Int, h: Int, idx: Int): Seq[Seq[Int]] =
    Seq.fill(h)(Seq.fill(w)(idx))

  /** Write an animated GIF: frames with (image, x, y, delayCs,
    * disposal). */
  private def writeGif(
      frames: Seq[(BufferedImage, Int, Int, Int, String)]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, x, y, delayCs, disposal) =>
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def node(name: String): IIOMetadataNode = {
        val kids = root.getChildNodes
        (0 until kids.getLength).map(kids.item)
          .collectFirst {
            case e: IIOMetadataNode if e.getNodeName == name => e
          }.getOrElse {
            val e = new IIOMetadataNode(name); root.appendChild(e); e
          }
      }
      val gce = node("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "TRUE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      val desc = node("ImageDescriptor")
      // the JDK writer's default interlace drops rows on tiny frames
      // (writer bug, confirmed via jshell) — write progressive
      desc.setAttribute("interlaceFlag", "FALSE")
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  /** Expected compositing by hand: start transparent, draw each frame
    * rect (index 0 leaves the canvas), snapshot, apply disposal. */
  private def composite(cw: Int, ch: Int,
      frames: Seq[(Seq[Seq[Int]], Int, Int, String)]): Seq[Array[Int]] = {
    val canvas = Array.fill(cw * ch)(0)
    frames.map { case (px, fx, fy, disposal) =>
      val before = canvas.clone()
      for (y <- px.indices; x <- px.head.indices if px(y)(x) != 0)
        canvas((fy + y) * cw + (fx + x)) = cmap(px(y)(x))
      val snap = canvas.clone()
      disposal match {
        case "restoreToBackgroundColor" =>
          for (y <- px.indices; x <- px.head.indices)
            canvas((fy + y) * cw + (fx + x)) = 0
        case "restoreToPrevious" =>
          System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      snap
    }
  }

  private def check(got: Seq[GifAnim.Frame], want: Seq[Array[Int]],
      cw: Int, ch: Int): Unit = {
    assert(got.length === want.length, "frame count")
    got.zip(want).zipWithIndex.foreach { case ((f, px), i) =>
      assert(f.image.getWidth === cw && f.image.getHeight === ch)
      for (y <- 0 until ch; x <- 0 until cw) {
        val g = f.image.getRGB(x, y)
        val w = px(y * cw + x)
        // compare premultiplied-irrelevant: transparent is alpha 0
        val same = if ((w >>> 24) == 0) (g >>> 24) == 0 else g == w
        assert(same, f"frame $i ($x,$y): got $g%08x want $w%08x")
      }
    }
  }

  test("full-canvas frames, doNotDispose: later frames draw over " +
    "earlier; delays come from the GCE in ms") {
    val f1 = fill(8, 6, 1)
    val f2 = fill(8, 6, 2).zipWithIndex.map { case (row, y) =>
      if (y < 3) row else Seq.fill(8)(0) } // top half green, bottom transp.
    val gif = writeGif(Seq(
      (frame(f1), 0, 0, 5, "doNotDispose"),
      (frame(f2), 0, 0, 12, "doNotDispose")))
    val got = GifAnim.decode(gif).getOrElse(fail("did not decode"))
    assert(got.map(_.durationMs) === Seq(50, 120))
    check(got, composite(8, 6, Seq(
      (f1, 0, 0, "doNotDispose"), (f2, 0, 0, "doNotDispose"))), 8, 6)
  }

  test("sub-rect frames with offsets + restoreToBackgroundColor: the " +
    "patch rect clears to transparent before the next frame") {
    val base = fill(10, 8, 4)
    val patch = fill(4, 3, 3)
    val last = fill(2, 2, 2)
    val gif = writeGif(Seq(
      (frame(base), 0, 0, 1, "doNotDispose"),
      (frame(patch), 5, 2, 1, "restoreToBackgroundColor"),
      (frame(last), 0, 0, 1, "doNotDispose")))
    val got = GifAnim.decode(gif).getOrElse(fail("did not decode"))
    check(got, composite(10, 8, Seq(
      (base, 0, 0, "doNotDispose"),
      (patch, 5, 2, "restoreToBackgroundColor"),
      (last, 0, 0, "doNotDispose"))), 10, 8)
    // the disposal really happened: frame 3's canvas is transparent
    // inside the patch rect (except where frame 3 drew)
    val f3 = got(2).image
    assert((f3.getRGB(6, 3) >>> 24) === 0)
    assert(f3.getRGB(3, 1) === cmap(4)) // outside both rects: base white
    assert(f3.getRGB(0, 0) === cmap(2)) // frame 3's own pixels
  }

  test("restoreToPrevious: the canvas rewinds to before the frame") {
    val base = fill(6, 6, 1)
    val patch = fill(3, 3, 3)
    val last = fill(1, 1, 2)
    val gif = writeGif(Seq(
      (frame(base), 0, 0, 1, "doNotDispose"),
      (frame(patch), 2, 2, 1, "restoreToPrevious"),
      (frame(last), 5, 5, 1, "doNotDispose")))
    val got = GifAnim.decode(gif).getOrElse(fail("did not decode"))
    check(got, composite(6, 6, Seq(
      (base, 0, 0, "doNotDispose"),
      (patch, 2, 2, "restoreToPrevious"),
      (last, 5, 5, "doNotDispose"))), 6, 6)
    assert(got(2).image.getRGB(3, 3) === cmap(1)) // patch rewound
  }

  test("stills and non-GIF bytes return None; hostile logical-screen " +
    "dims reject before allocating the canvas") {
    val still = writeGif(Seq((frame(fill(4, 4, 1)), 0, 0, 1, "none")))
    assert(GifAnim.decode(still) === None)
    assert(GifAnim.decode("not a gif at all".getBytes) === None)
    assert(GifAnim.decode(null) === None)
    val anim = writeGif(Seq(
      (frame(fill(4, 4, 1)), 0, 0, 1, "none"),
      (frame(fill(4, 4, 2)), 0, 0, 1, "none")))
    assert(GifAnim.decode(anim).isDefined)
    // declare a 65535 x 65535 logical screen (4.3 G pixels)
    val huge = anim.clone()
    huge(6) = -1; huge(7) = -1; huge(8) = -1; huge(9) = -1
    assert(GifAnim.decode(huge) === None)
    // truncated mid-stream: reader throws → None
    assert(GifAnim.decode(anim.take(anim.length / 2)) === None)
    // frames x canvas product cap (injected budget — see WebpAnim):
    // over-budget animations truncate to the budget-fitting prefix,
    // below two frames they stop being an animation
    assert(GifAnim.decode(anim, pixelBudget = 4 * 4 * 2 - 1) === None)
    assert(GifAnim.decode(anim, pixelBudget = 4 * 4 * 2).isDefined)
    val anim3 = writeGif(Seq(
      (frame(fill(4, 4, 1)), 0, 0, 1, "none"),
      (frame(fill(4, 4, 2)), 0, 0, 1, "none"),
      (frame(fill(4, 4, 3)), 0, 0, 1, "none")))
    val cut = GifAnim.decode(anim3, pixelBudget = 4 * 4 * 3 - 1)
    assert(cut.map(_.length) === Some(2))
    val full = GifAnim.decode(anim3).get
    cut.get.zip(full).foreach { case (c, f) =>
      assert((0 until 4).forall(y => (0 until 4).forall(x =>
        c.image.getRGB(x, y) === f.image.getRGB(x, y))))
    }
    // hostile image descriptor: frame 2 declaring 65535x65535 must
    // reject from METADATA, before reader.read allocates the raster
    val desc2 = {
      // second 0x2C image-separator block
      var i = 13; var seen = 0; var at = -1
      while (at < 0 && i < anim.length) {
        if ((anim(i) & 0xff) == 0x2c) { seen += 1; if (seen == 2) at = i }
        i += 1
      }
      assert(at > 0, "no second image descriptor"); at
    }
    val fat = anim.clone()
    fat(desc2 + 5) = -1; fat(desc2 + 6) = -1 // width = 0xffff
    fat(desc2 + 7) = -1; fat(desc2 + 8) = -1 // height = 0xffff
    assert(GifAnim.decode(fat) === None)
  }

  test("mutation fuzz: corrupted GIFs decode to None or frames, " +
    "never an exception or a hang") {
    val good = writeGif(Seq(
      (frame(fill(10, 8, 4)), 0, 0, 1, "doNotDispose"),
      (frame(fill(4, 3, 3)), 5, 2, 1, "restoreToBackgroundColor"),
      (frame(fill(2, 2, 2)), 0, 0, 1, "doNotDispose")))
    val rnd = new scala.util.Random(0x61F)
    for (trial <- 1 to 150) {
      val mutated = good.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = 6 + rnd.nextInt(mutated.length - 6)
        mutated(at) = rnd.nextInt(256).toByte
      }
      // bounded await so a non-terminating decode FAILS the trial
      // instead of wedging the suite
      import scala.concurrent.ExecutionContext.Implicits.global
      scala.concurrent.Await.result(
        scala.concurrent.Future(GifAnim.decode(mutated)),
        scala.concurrent.duration.Duration(5, "s"))
    }
  }
}
