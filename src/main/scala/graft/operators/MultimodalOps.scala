package graft.operators

import graft.functions.BinaryFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column processing (north-star "multimodal columns"): media as
  * opaque binary columns with typed metadata, processed per-partition in
  * batches — the Scala analog of `mapInPandas`: one setup per partition
  * (codec tables, buffers), then a tight loop over rows, instead of
  * per-row UDF dispatch.
  *
  * Decode/feature-extract is REAL for JDK rasters (javax.imageio), PCM WAV
  * audio (RIFF parse + RMS) and uncompressed-DIB AVI video frames (RIFF
  * parse + DIB decode) — all pure JVM. Compressed av codecs don't ship in
  * this environment; those inputs take the documented stub path, and the
  * Spark-side plumbing (schema, partitioning, batch shape,
  * null-for-undecodable contract) is the production shape either way.
  */
object MultimodalOps {

  /** media row schema: content + mime + source key. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("mime", StringType),
    StructField("bytes", BinaryType)))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** Decode + feature-extract a DataFrame of media rows, one partition at a
    * time. Undecodable rows (no codec / corrupt bytes) yield nulls in the
    * feature columns — errors are data, never exceptions. */
  def imageFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      // per-partition setup happens HERE (once), not per row
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = if (bytes == null) null else BinaryFunctions.sniffFormat(bytes)
        val img = fmt match {
          case "png" | "jpeg" | "gif" | "bmp" =>
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
          case _ => None
        }
        img match {
          case Some(i) =>
            var sum = 0.0
            val (w, h) = (i.getWidth, i.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = i.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) * 0.299 +
                  ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114)
                x += 1
              }
              y += 1
            }
            Row(key, fmt, w, h, sum / (w.toLong * h))
          case None => Row(key, fmt, null, null, null)
        }
      }
    }(enc).toDF()
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Video frame sampling — REAL for uncompressed DIB frames inside a
    * RIFF AVI ([[parseAviFrames]], pure JVM) and for MJPEG (each frame
    * chunk is a plain JPEG — the most common compressed-AVI case, and
    * the engine already decodes JPEG). Other compressed codecs
    * (h264/vp9/...) have no decoder in this environment; with
    * `stubUndecodable=true` (the default) those inputs fall back to
    * deterministic synthetic frames (documented stub) so the fan-out
    * plumbing — schema, one row per sampled frame, partitioning —
    * exercises end to end either way. Pass `stubUndecodable=false` when
    * downstream consumes frame CONTENT (perceptual dedup, features):
    * undecodable videos then yield NO rows — stub frames derive from
    * the key, not the content, so hashing them would fabricate
    * duplicates between unrelated undecodable videos and miss real
    * ones ([[videoFrameDHashes]] relies on this). */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int,
      stubUndecodable: Boolean = true): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    def fakeFrame(key: String, idx: Int): Array[Byte] =
      BinaryFunctions.syntheticPng(key.hashCode.toLong * 31 + idx, 16, 12)
    media.select("key", "bytes").flatMap { r =>
      val key = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      // animated WebP and GIF are the other pure-JVM frame sources:
      // [[graft.functions.WebpAnim]] (VP8X/ANIM/ANMF reassembly over
      // the VP8+VP8L decoders) and [[graft.functions.GifAnim]] (GIF89a
      // compositing over ImageIO's per-frame sub-images)
      def animFrames: Option[Seq[java.awt.image.BufferedImage]] =
        graft.functions.WebpAnim.decode(bytes).map(_.map(_.image))
          .orElse(graft.functions.GifAnim.decode(bytes).map(_.map(_.image)))
      parseAviFrames(bytes, everyNth, maxFrames) match {
        case Some(frames) =>
          frames.map { case (idx, png) => Row(key, idx, png) }
        case None =>
          animFrames match {
            case Some(frames) =>
              Range(0, frames.length, math.max(1, everyNth))
                .take(maxFrames).map(i => Row(key, i,
                  BinaryFunctions.encodePng(frames(i))))
            case None =>
              // a decodable STILL is a 1-frame video, not undecodable
              // content: 1-frame "animations" (one-ANMF WebP, 1-frame
              // GIF — the animation decoders call those stills) and
              // plain images sample as their single frame, so byte-
              // identical stills still meet in frame-hash dedup
              (if (bytes == null) None else BinaryFunctions.decode(bytes))
                match {
                case Some(img) =>
                  Seq(Row(key, 0, BinaryFunctions.encodePng(img)))
                case None if stubUndecodable =>
                  (0 until maxFrames).map(i => Row(key, i * everyNth,
                    fakeFrame(key, i * everyNth)))
                case None => Nil
              }
          }
      }
    }(enc).toDF()
  }

  // --- RIFF AVI (uncompressed DIB) — pure-JVM frame extraction ------------

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u16le(b, i).toLong | (u16le(b, i + 2).toLong << 16)) & 0xffffffffL

  /** Extract every `everyNth`-th video frame (up to `maxFrames`) from an
    * AVI as PNG bytes: BI_RGB 24-bit DIB frames decode directly; frames
    * whose payload sniffs as JPEG (MJPEG) route through ImageIO's JPEG
    * decoder. Returns None when no frame decodes — other compressed
    * codecs included. */
  private[operators] def parseAviFrames(b: Array[Byte], everyNth: Int,
      maxFrames: Int): Option[Seq[(Int, Array[Byte])]] = try {
    if (b == null || b.length < 12) return None
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var w = 0; var h = 0; var bitCount = 0; var compression = -1L
    var palette: Array[Int] = null
    val raw = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(start: Int, end: Int, depth: Int): Unit = {
      // depth-capped: unbounded LIST nesting in a crafted file would
      // StackOverflowError past the Exception catch (same hazard class as
      // the SVG renderer's recursion)
      if (depth > 32) return
      var pos = start
      while (pos + 8 <= end && pos + 8 <= b.length) {
        val id = tag(pos)
        // untrusted bytes: a 2^31+ chunk length would wrap negative and
        // stall the walk (try/catch can't save an infinite loop)
        val len = math.min(u32le(b, pos + 4), (b.length - pos - 8).toLong).toInt
        if (len < 0) return
        if (id == "LIST")
          walk(pos + 12, math.min(pos + 8 + len, b.length), depth + 1)
        else if (id == "strf" && compression == -1L && len >= 40
          && u32le(b, pos + 8) == 40L) {
          // BITMAPINFOHEADER (the video stream's format block)
          w = u32le(b, pos + 12).toInt
          h = u32le(b, pos + 16).toInt
          bitCount = u16le(b, pos + 22)
          compression = u32le(b, pos + 24)
          if (bitCount == 8 || bitCount == 4) {
            // palettized stream: RGBQUAD table follows the 40-byte
            // BITMAPINFOHEADER; biClrUsed==0 means "all" (256 for
            // 8-bit, 16 for 4-bit), bounded by what the chunk holds
            val full = if (bitCount == 4) 16 else 256
            val declared = u32le(b, pos + 8 + 32).toInt
            val n = math.min(math.min(
              if (declared <= 0) full else declared, full), (len - 40) / 4)
            palette = Array.tabulate(256) { k =>
              if (k < n) {
                val p = pos + 8 + 40 + 4 * k
                ((b(p + 2) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) |
                  (b(p) & 0xff) // RGBQUAD is B,G,R,reserved
              } else 0
            }
          }
        } else if ((id == "00db" || id == "00dc") && len > 0
          && pos + 8 + len <= b.length) {
          raw += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + len)
        }
        pos += 8 + len + (len & 1)
      }
    }
    walk(12, b.length, depth = 0)
    val picked = Range(0, raw.length, math.max(1, everyNth)).take(maxFrames)
    val out =
      if (compression == 0L && bitCount == 24 && w > 0 && h > 0) {
        // header-declared dimensions bounded by what the file can
        // actually hold — a tiny file declaring a huge frame must not
        // allocate
        if (w.toLong * h * 3 > b.length.toLong) return None
        val stride = ((w * 3 + 3) / 4) * 4
        picked.flatMap { fi =>
          val d = raw(fi)
          if (d.length < stride * h) None
          else {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              val row = (h - 1 - y) * stride // DIB rows are bottom-up, BGR
              var x = 0
              while (x < w) {
                val p = row + x * 3
                img.setRGB(x, y, ((d(p + 2) & 0xff) << 16) |
                  ((d(p + 1) & 0xff) << 8) | (d(p) & 0xff))
                x += 1
              }
              y += 1
            }
            Some(fi -> BinaryFunctions.encodePng(img))
          }
        }
      } else if (compression == 1L && bitCount == 8 && w > 0 && h > 0 &&
        palette != null) {
        // BI_RLE8 (Microsoft RLE, the AVI 'mrle'/'MRLE' handler): 8-bit
        // palettized with run-length frames that may be DELTAS painting
        // onto the previous frame's canvas — decode sequentially with a
        // persistent canvas, snapshot only the sampled indices
        if (w.toLong * h > (1L << 24)) return None
        decodeRleFrames(raw.toSeq, picked, w, h, palette, bits = 8)
      } else if (compression == 2L && bitCount == 4 && w > 0 && h > 0 &&
        palette != null) {
        // BI_RLE4: the 4-bit sibling — runs alternate the byte's two
        // nibbles, absolute mode packs nibbles two-per-byte; same
        // persistent-canvas delta compositing
        if (w.toLong * h > (1L << 24)) return None
        decodeRleFrames(raw.toSeq, picked, w, h, palette, bits = 4)
      } else {
        // MJPEG (and any codec whose chunk payloads are plain JPEGs —
        // fourcc 'MJPG' or otherwise): each sampled frame that sniffs
        // as JPEG routes through the JPEG decode the engine already
        // has. Frames that don't decode are skipped, not fatal; other
        // compressed codecs yield no frames and fall to the stub path.
        picked.flatMap { fi =>
          val d = raw(fi)
          // header-declared dims bounded BEFORE ImageIO.read — same
          // posture as the DIB branch: the JPEG reader allocates the
          // raster from the SOF header, so a tiny chunk declaring a
          // huge frame must reject pre-allocation
          if (d.length >= 3 && (d(0) & 0xff) == 0xff &&
            (d(1) & 0xff) == 0xd8 &&
            jpegDims(d).exists { case (jw, jh) =>
              jw > 0 && jh > 0 && jw.toLong * jh <= (1L << 24) })
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(d)))
              .map(img => fi -> BinaryFunctions.encodePng(img))
          else None
        }
      }
    if (out.isEmpty) None else Some(out)
  } catch { case _: Exception => None }

  /** BI_RLE8 / BI_RLE4 frame-sequence decode (public Windows BMP/AVI
    * RLE wire formats): byte pairs `(count, v)` paint runs — one
    * index for RLE8, `v`'s two nibbles ALTERNATING for RLE4;
    * `count == 0` escapes to `0`=end-of-line, `1`=end-of-bitmap,
    * `2`=delta (skip `(dx, dy)` — the mechanism delta frames use to
    * leave pixels from the PREVIOUS frame in place), `n>=3`=absolute
    * mode (n literal indices — bytes for RLE8, packed nibbles for
    * RLE4 — word-aligned). Rows are bottom-up like every DIB. The
    * canvas persists across frames, so a frame that only encodes its
    * changed region composites correctly; out-of-bounds paints are
    * clipped (untrusted bytes must not throw past the walk). */
  private def decodeRleFrames(frames: Seq[Array[Byte]], picked: Seq[Int],
      w: Int, h: Int, pal: Array[Int],
      bits: Int): Seq[(Int, Array[Byte])] = {
    val canvas = new Array[Byte](w * h) // palette indices; row 0 = bottom
    val wanted = picked.toSet
    val last = picked.foldLeft(-1)(math.max)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    var fi = 0
    while (fi <= last && fi < frames.length) {
      val d = frames(fi)
      var x = 0; var y = 0; var i = 0; var done = false
      while (!done && i + 2 <= d.length) {
        val c = d(i) & 0xff; val v = d(i + 1) & 0xff; i += 2
        if (c > 0) {
          // encoded run: one index for RLE8, the byte's two nibbles
          // ALTERNATING for RLE4 (the public BMP wire rule)
          var k = 0
          while (k < c) {
            val idx =
              if (bits == 8) v
              else if ((k & 1) == 0) (v >> 4) & 0xf else v & 0xf
            if (x < w && y < h) canvas(y * w + x) = idx.toByte
            x += 1; k += 1
          }
        } else v match {
          case 0 => x = 0; y += 1
          case 1 => done = true
          case 2 =>
            if (i + 2 <= d.length) {
              x += d(i) & 0xff; y += d(i + 1) & 0xff; i += 2
            } else done = true
          case n =>
            if (bits == 8) {
              var k = 0
              while (k < n && i < d.length) {
                if (x < w && y < h) canvas(y * w + x) = d(i)
                x += 1; i += 1; k += 1
              }
              i += (n & 1) // absolute runs pad to a word boundary
            } else {
              // RLE4 absolute: n nibbles packed two-per-byte (high
              // first), total bytes consumed padded to a word
              var k = 0
              while (k < n && i < d.length) {
                val byte = d(i) & 0xff
                val idx = if ((k & 1) == 0) (byte >> 4) & 0xf
                          else byte & 0xf
                if (x < w && y < h) canvas(y * w + x) = idx.toByte
                x += 1
                if ((k & 1) == 1 || k == n - 1) i += 1
                k += 1
              }
              i += (((n + 1) / 2) & 1) // pad bytes-used to a word
            }
        }
      }
      if (wanted(fi)) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var yy = 0
        while (yy < h) {
          var xx = 0
          while (xx < w) {
            img.setRGB(xx, yy, pal(canvas((h - 1 - yy) * w + xx) & 0xff))
            xx += 1
          }
          yy += 1
        }
        out += fi -> BinaryFunctions.encodePng(img)
      }
      fi += 1
    }
    out.toSeq
  }

  /** JPEG dimensions from the first SOFn marker (frame header: u16be
    * height then width) — the allocation guard for the MJPEG branch. */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
          m != 0xcc) {
          if (i + 9 > b.length) return None
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return Some((w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Minimal uncompressed-DIB AVI writer (one 24-bit video stream) —
    * deterministic fixture bytes for specs; frame pixels derive from
    * (seed, frame, x, y). */
  def syntheticAvi(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    def fcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val stride = ((w * 3 + 3) / 4) * 4
    val frameLen = stride * h
    val moviLen = 4 + nFrames * (8 + frameLen + (frameLen & 1))
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    fcc("RIFF"); le32(4 + (8 + hdrlLen) + (8 + moviLen)); fcc("AVI ")
    fcc("LIST"); le32(hdrlLen); fcc("hdrl")
    fcc("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0) // µs/frame, maxBps, pad, flags
    le32(nFrames); le32(0); le32(1); le32(frameLen) // frames, init, streams, buf
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(4 + (8 + 56) + (8 + 40)); fcc("strl")
    fcc("strh"); le32(56); fcc("vids"); fcc("DIB ")
    le32(0); le16(0); le16(0); le32(0) // flags, prio, lang, initFrames
    le32(1); le32(25); le32(0); le32(nFrames) // scale, rate, start, length
    le32(frameLen); le32(0); le32(0) // bufSize, quality, sampleSize
    le16(0); le16(0); le16(w); le16(h) // rcFrame
    fcc("strf"); le32(40)
    le32(40); le32(w); le32(h); le16(1); le16(24) // BITMAPINFOHEADER
    le32(0); le32(frameLen); le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(moviLen); fcc("movi")
    for (f <- 0 until nFrames) {
      fcc("00db"); le32(frameLen)
      for (row <- 0 until h) {
        val y = h - 1 - row // DIB stores the bottom row first
        for (x <- 0 until w) {
          val v = (seed * 2654435761L + f * 101 + x * 31 + y * 17) & 0xffffff
          bos.write((v & 0xff).toInt) // B
          bos.write(((v >> 8) & 0xff).toInt) // G
          bos.write(((v >> 16) & 0xff).toInt) // R
        }
        for (_ <- w * 3 until stride) bos.write(0) // pad row to 4 bytes
      }
      if ((frameLen & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** Minimal BI_RLE8 AVI writer: one 8-bit palettized video stream whose
    * frames are Microsoft-RLE encoded — frame 0 as a run-length KEYFRAME
    * (encoded mode + end-of-line), later frames as DELTAS that re-encode
    * only the rows differing from the previous frame (delta-skip escape
    * + absolute mode), exactly the layout the `mrle` handler produces.
    * `frames` are full logical index canvases (top-down, w*h entries
    * into `palette`); requires 3 <= w <= 255 so one absolute run covers
    * a row. Deterministic fixture bytes for specs. */
  def syntheticAviRle8(palette: Array[Int], frames: Seq[Array[Byte]],
      w: Int, h: Int): Array[Byte] =
    syntheticAviRle(palette, frames, w, h, bits = 8)

  /** The 4-bit sibling of [[syntheticAviRle8]] (BI_RLE4, 16-color
    * palette): encoded runs carry the index in BOTH nibbles, absolute
    * rows pack nibbles two-per-byte — the layout the RLE4 branch of
    * the decoder must walk. */
  def syntheticAviRle4(palette: Array[Int], frames: Seq[Array[Byte]],
      w: Int, h: Int): Array[Byte] =
    syntheticAviRle(palette, frames, w, h, bits = 4)

  private def syntheticAviRle(palette: Array[Int],
      frames: Seq[Array[Byte]], w: Int, h: Int,
      bits: Int): Array[Byte] = {
    require(w >= 3 && w <= 255 && h >= 1 && h <= 255, "fixture-sized only")
    val nPal = if (bits == 4) 16 else 256
    require(palette.length <= nPal)
    if (bits == 4)
      require(frames.forall(_.forall(i => (i & 0xff) < 16)),
        "RLE4 canvases carry 4-bit indices")
    // encode one frame; prev == null → keyframe
    def encode(cur: Array[Byte], prev: Array[Byte]): Array[Byte] = {
      val eb = new java.io.ByteArrayOutputStream()
      def rowAt(yb: Int): Int = (h - 1 - yb) * w // bottom-up row → canvas
      if (prev == null) {
        for (yb <- 0 until h) {
          val r = rowAt(yb)
          var x = 0
          while (x < w) { // encoded mode: (runLen, index)
            var run = 1
            while (x + run < w && cur(r + x + run) == cur(r + x) &&
              run < 255) run += 1
            val v = cur(r + x) & 0xff
            eb.write(run)
            // RLE4: a uniform run repeats the index in both nibbles
            eb.write(if (bits == 8) v else (v << 4) | v)
            x += run
          }
          if (yb < h - 1) { eb.write(0); eb.write(0) } // EOL
        }
      } else {
        val changed = (0 until h).filter { yb =>
          val r = rowAt(yb)
          !java.util.Arrays.equals(cur, r, r + w, prev, r, r + w)
        }
        var atY = 0 // decoder position after the previous op (x always 0)
        for (yb <- changed) {
          if (yb > atY) { // delta escape: skip untouched rows
            eb.write(0); eb.write(2); eb.write(0); eb.write(yb - atY)
          }
          eb.write(0); eb.write(w) // absolute mode: the whole row
          val r = rowAt(yb)
          if (bits == 8) {
            for (x <- 0 until w) eb.write(cur(r + x) & 0xff)
            if ((w & 1) == 1) eb.write(0) // word-align
          } else {
            var x = 0
            while (x < w) { // nibbles packed high-first
              val hi = cur(r + x) & 0xf
              val lo = if (x + 1 < w) cur(r + x + 1) & 0xf else 0
              eb.write((hi << 4) | lo)
              x += 2
            }
            if ((((w + 1) / 2) & 1) == 1) eb.write(0) // word-align
          }
          eb.write(0); eb.write(0) // EOL → (0, yb+1)
          atY = yb + 1
        }
      }
      eb.write(0); eb.write(1) // end of bitmap
      eb.toByteArray
    }
    val payloads = frames.zipWithIndex.map { case (f, i) =>
      encode(f, if (i == 0) null else frames(i - 1))
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    def fcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val strfLen = 40 + 4 * nPal
    val moviLen = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val strlLen = 4 + (8 + 56) + (8 + strfLen)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val bufSize = payloads.map(_.length).max
    fcc("RIFF"); le32(4 + (8 + hdrlLen) + (8 + moviLen)); fcc("AVI ")
    fcc("LIST"); le32(hdrlLen); fcc("hdrl")
    fcc("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0)
    le32(frames.length.toLong); le32(0); le32(1); le32(bufSize.toLong)
    le32(w.toLong); le32(h.toLong); le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(strlLen); fcc("strl")
    fcc("strh"); le32(56); fcc("vids"); fcc("MRLE")
    le32(0); le16(0); le16(0); le32(0)
    le32(1); le32(25); le32(0); le32(frames.length.toLong)
    le32(bufSize.toLong); le32(0); le32(0)
    le16(0); le16(0); le16(w); le16(h)
    fcc("strf"); le32(strfLen.toLong)
    le32(40); le32(w.toLong); le32(h.toLong); le16(1); le16(bits)
    le32(if (bits == 8) 1L else 2L) // biCompression = BI_RLE8 / BI_RLE4
    le32(bufSize.toLong); le32(0); le32(0); le32(nPal.toLong); le32(0)
    for (k <- 0 until nPal) { // RGBQUAD palette: B, G, R, reserved
      val c = if (k < palette.length) palette(k) else 0
      bos.write(c & 0xff); bos.write((c >> 8) & 0xff)
      bos.write((c >> 16) & 0xff); bos.write(0)
    }
    fcc("LIST"); le32(moviLen); fcc("movi")
    for (p <- payloads) {
      fcc("00dc"); le32(p.length.toLong)
      bos.write(p)
      if ((p.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** [[syntheticAvi]] plus a SOUNDTRACK: a second (auds) stream whose
    * `01wb` chunks carry 16-bit PCM from [[amPcm]] — byte-identical to
    * the data section of `syntheticAmWav(audioSeed)`, so the extracted
    * soundtrack's fingerprint provably equals the standalone WAV's.
    * Audio is interleaved one chunk per video frame, the layout real
    * muxers produce. `mjpeg = true` writes the video stream as MJPEG
    * (`00dc` chunks of real ImageIO JPEGs, `MJPG` fourcc) instead of
    * uncompressed DIB — the COMPRESSED-video-next-to-PCM-audio
    * combination, so soundtrack extraction is proven independent of the
    * video codec sharing the container. */
  def syntheticAviWithAudio(videoSeed: Long, audioSeed: Long, w: Int,
      h: Int, nFrames: Int, audioCells: Seq[Int] = Nil,
      rate: Int = 8000, mjpeg: Boolean = false): Array[Byte] = {
    val pcm = amPcm(audioSeed, audioCells, 1.0, 1.0, rate)
    val nSamples = pcm.length / 2
    // per-frame audio slice boundaries (byte offsets, sample-aligned)
    val cuts = (0 to nFrames).map(f => (f.toLong * nSamples / nFrames).toInt * 2)
    val stride = ((w * 3 + 3) / 4) * 4
    def pix(f: Int, x: Int, y: Int): Int =
      ((videoSeed * 2654435761L + f * 101 + x * 31 + y * 17) & 0xffffff).toInt
    // per-frame video payloads: DIB rows (bottom-up BGR) or real JPEGs
    val frames: IndexedSeq[Array[Byte]] = (0 until nFrames).map { f =>
      if (mjpeg) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(f, x, y))
        val jb = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpeg", jb)
        jb.toByteArray
      } else {
        val d = new Array[Byte](stride * h)
        for (row <- 0 until h) {
          val y = h - 1 - row
          for (x <- 0 until w) {
            val v = pix(f, x, y)
            d(row * stride + x * 3) = (v & 0xff).toByte
            d(row * stride + x * 3 + 1) = ((v >> 8) & 0xff).toByte
            d(row * stride + x * 3 + 2) = ((v >> 16) & 0xff).toByte
          }
        }
        d
      }
    }
    val bufSize = frames.map(_.length).max
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    def fcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val audLens = (0 until nFrames).map(f => cuts(f + 1) - cuts(f))
    val moviLen = 4 +
      (0 until nFrames).map(f => (8 + frames(f).length + (frames(f).length & 1)) +
        (8 + audLens(f) + (audLens(f) & 1))).sum
    val strlVidsLen = 4 + (8 + 56) + (8 + 40)
    val strlAudsLen = 4 + (8 + 56) + (8 + 16)
    val hdrlLen = 4 + (8 + 56) + (8 + strlVidsLen) + (8 + strlAudsLen)
    fcc("RIFF"); le32(4 + (8 + hdrlLen) + (8 + moviLen)); fcc("AVI ")
    fcc("LIST"); le32(hdrlLen); fcc("hdrl")
    fcc("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0)
    le32(nFrames); le32(0); le32(2); le32(bufSize.toLong)
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(strlVidsLen); fcc("strl")
    fcc("strh"); le32(56); fcc("vids"); fcc(if (mjpeg) "MJPG" else "DIB ")
    le32(0); le16(0); le16(0); le32(0)
    le32(1); le32(25); le32(0); le32(nFrames)
    le32(bufSize.toLong); le32(0); le32(0)
    le16(0); le16(0); le16(w); le16(h)
    fcc("strf"); le32(40)
    le32(40); le32(w); le32(h); le16(1); le16(24)
    if (mjpeg) fcc("MJPG") else le32(0) // biCompression
    le32(if (mjpeg) w.toLong * h * 3 else stride.toLong * h) // biSizeImage
    le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(strlAudsLen); fcc("strl")
    fcc("strh"); le32(56); fcc("auds"); le32(0) // auds, no handler fourcc
    le32(0); le16(0); le16(0); le32(0)
    le32(1); le32(rate.toLong); le32(0); le32(nSamples.toLong)
    le32(rate.toLong * 2); le32(0); le32(2) // bufSize, quality, sampleSize
    le16(0); le16(0); le16(0); le16(0)
    fcc("strf"); le32(16) // PCMWAVEFORMAT
    le16(1); le16(1); le32(rate.toLong); le32(rate.toLong * 2)
    le16(2); le16(16)
    fcc("LIST"); le32(moviLen); fcc("movi")
    for (f <- 0 until nFrames) {
      fcc(if (mjpeg) "00dc" else "00db"); le32(frames(f).length.toLong)
      bos.write(frames(f))
      if ((frames(f).length & 1) == 1) bos.write(0)
      fcc("01wb"); le32(audLens(f).toLong)
      bos.write(pcm, cuts(f), audLens(f))
      if ((audLens(f) & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** Minimal MJPEG AVI writer (one 'MJPG' video stream whose frame
    * chunks are real ImageIO-encoded JPEGs) — deterministic fixture
    * bytes for specs; same container skeleton as [[syntheticAvi]]. */
  def syntheticMjpegAvi(seed: Long, w: Int, h: Int,
      nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y,
          ((seed * 2654435761L + f * 101 + x * 31 + y * 17) & 0xffffff).toInt)
      val jb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", jb)
      jb.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    def fcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val moviLen = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    fcc("RIFF"); le32(4 + (8 + hdrlLen) + (8 + moviLen)); fcc("AVI ")
    fcc("LIST"); le32(hdrlLen); fcc("hdrl")
    fcc("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0)
    le32(nFrames); le32(0); le32(1); le32(frames.map(_.length).max.toLong)
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(4 + (8 + 56) + (8 + 40)); fcc("strl")
    fcc("strh"); le32(56); fcc("vids"); fcc("MJPG")
    le32(0); le16(0); le16(0); le32(0)
    le32(1); le32(25); le32(0); le32(nFrames)
    le32(frames.map(_.length).max.toLong); le32(0); le32(0)
    le16(0); le16(0); le16(w); le16(h)
    fcc("strf"); le32(40)
    le32(40); le32(w); le32(h); le16(1); le16(24)
    fcc("MJPG"); le32(w.toLong * h * 3); le32(0); le32(0); le32(0); le32(0)
    fcc("LIST"); le32(moviLen); fcc("movi")
    frames.foreach { f =>
      fcc("00dc"); le32(f.length.toLong)
      bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  // --- perceptual image dedup (dHash) -------------------------------------

  /** 64-bit DIFFERENCE HASH: average-pool the image to a 9x8 grayscale
    * grid with deterministic integer box sampling (no Graphics2D
    * scaling — platform-independent, unlike SCALE_SMOOTH), then set one
    * bit per horizontal neighbor pair (left > right). Near-duplicate
    * images — re-encodes, mild resizes, small crops/edits — land within
    * a few bits of hamming distance; the multimodal counterpart of the
    * text pipeline's SimHash. */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val grid = new Array[Double](9 * 8)
    var cy = 0
    while (cy < 8) {
      val y0 = (cy.toLong * h / 8).toInt
      val y1 = math.max(y0 + 1, ((cy + 1).toLong * h / 8).toInt)
      var cx = 0
      while (cx < 9) {
        val x0 = (cx.toLong * w / 9).toInt
        val x1 = math.max(x0 + 1, ((cx + 1).toLong * w / 9).toInt)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = img.getRGB(x, y)
            sum += 299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        val n = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        grid(cy * 9 + cx) = if (n <= 0) 0.0 else sum.toDouble / n
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val row = i / 8; val colIdx = i % 8
      if (grid(row * 9 + colIdx) > grid(row * 9 + colIdx + 1))
        bits |= 1L << i
      i += 1
    }
    bits
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("dhash", LongType)))

  /** (key, dhash) per media row — any of the engine's 7 decodable
    * formats; undecodable bytes yield null (errors are data). One
    * map-side pass, no shuffle. */
  def imageDHashes(media: DataFrame): DataFrame =
    imageHashes(media, dHash)

  /** BOTH kernels in ONE decode pass — what a two-kernel agreement
    * policy (q166) wants at corpus scale: the decode (the dominant
    * cost) runs once, each hash column then feeds its own banding. */
  def imageDualHashes(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("dhash", LongType),
      StructField("phash", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = if (bytes == null) None
          else graft.functions.BinaryFunctions.decode(bytes)
        img match {
          case Some(i) => Row(key, dHash(i), pHash(i))
          case None => Row(key, null, null)
        }
      }
    }(enc).toDF()
  }

  /** One decode-and-hash pass shared by every perceptual kernel —
    * the decode/null contract ("errors are data") lives HERE once. */
  private def imageHashes(media: DataFrame,
      kernel: java.awt.image.BufferedImage => Long): DataFrame = {
    val enc = RowEncoder.encoderFor(dhashSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = if (bytes == null) None
          else graft.functions.BinaryFunctions.decode(bytes)
        img match {
          case Some(i) => Row(key, kernel(i))
          case None => Row(key, null)
        }
      }
    }(enc).toDF()
  }

  /** DCT perceptual hash (pHash) — the FREQUENCY-domain sibling of
    * [[dHash]]: 32×32 box-pooled grayscale → 2-D DCT-II → the 8×8
    * low-frequency block, bit i = coefficient_i > median of the block
    * EXCLUDING the DC term (the standard pHash convention — the DC
    * carries overall brightness, which the median split should not
    * chase). Robust to exactly the transforms that move dHash bits:
    * global brightness/contrast shifts barely touch the low-frequency
    * RATIOS, while dHash's neighbor comparisons survive them too but
    * lose to smooth gradients pHash keeps. Two independent kernels
    * over one banding = a cheap precision boost (agree → dup).
    * All-double arithmetic in fixed iteration order — deterministic
    * across platforms, so the hashes pin as literals like dHash's.
    *
    * Bit 0 (DC vs the AC median) is DELIBERATELY kept: near-constant
    * 1 on real images, so its band discriminates on ~8 of 9 bits — a
    * few extra candidates for the exact popcount filter to kill,
    * never a correctness cost (pigeonhole losslessness unaffected);
    * dropping it would move the same near-constant weakness to an
    * unused bit 63. */
  def pHash(img: java.awt.image.BufferedImage): Long = {
    val N = 32
    val w = img.getWidth; val h = img.getHeight
    // 32x32 box-pooled luma (the dHash pooling at DCT resolution)
    val g = new Array[Double](N * N)
    var cy = 0
    while (cy < N) {
      val y0 = (cy.toLong * h / N).toInt
      val y1 = math.max(y0 + 1, ((cy + 1).toLong * h / N).toInt)
      var cx = 0
      while (cx < N) {
        val x0 = (cx.toLong * w / N).toInt
        val x1 = math.max(x0 + 1, ((cx + 1).toLong * w / N).toInt)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = img.getRGB(x, y)
            sum += 299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        val n = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        g(cy * N + cx) = if (n <= 0) 0.0 else sum.toDouble / n
        cx += 1
      }
      cy += 1
    }
    // separable DCT-II, low 8 frequencies only (all we keep)
    val cosT = phashCosTable
    val rows8 = new Array[Double](8 * N) // DCT over x, per y
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < N) { acc += g(y * N + x) * cosT(u)(x); x += 1 }
        rows8(u * N + y) = acc
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64) // then over y
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += rows8(u * N + yy) * cosT(v)(yy); yy += 1 }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    // median of the 63 non-DC coefficients (sorted copy, lower median)
    val rest = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(rest)
    val med = rest(31)
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (coef(i) > med) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** The fixed DCT cosine table (depends on nothing but the 32/8
    * dimensions) — computed once per JVM, not per image. */
  private lazy val phashCosTable: Array[Array[Double]] =
    Array.tabulate(8, 32)((k, n) =>
      math.cos((2 * n + 1) * k * math.Pi / 64.0))

  /** (key, dhash) per media row under the [[pHash]] kernel — same
    * schema/column as [[imageDHashes]] so the banding, kNN, cluster,
    * and incremental machinery serve both hash spaces unchanged. */
  def imagePHashes(media: DataFrame): DataFrame =
    imageHashes(media, pHash)

  /** Deterministic NEAR-DUPLICATE of the seed's synthetic media
    * ([[graft.functions.BinaryFunctions.syntheticMedia]] — png/tiff/svg
    * by seed, the q38 decode fan-in): decode, whiten the given
    * [[dHash]] grid cells (the 9x8 average-pool boxes, cell = row*9 +
    * col), re-encode PNG. Whitening cell (r,c) can only move the two
    * horizontal-neighbor comparison bits that read it — (r,c-1) vs
    * (r,c) and (r,c) vs (r,c+1) — so |cells| bounds the hamming
    * distance from the unperturbed image at 2*|cells|. The controlled
    * fixture generator behind q104's oracle-pinned pairing. */
  def perturbedMedia(seed: Long, w: Int, h: Int, cells: Seq[Int]): Array[Byte] = {
    import graft.functions.{BinaryFunctions => B}
    // synthetic media always decodes; a None here is a broken build,
    // not data — fail loudly rather than hash a fake
    val img = B.decode(B.syntheticMedia(seed, w, h)).getOrElse(
      sys.error(s"syntheticMedia($seed) failed to decode"))
    cells.foreach { c =>
      val row = c / 9; val cx = c % 9
      var y = row * h / 8
      while (y < (row + 1) * h / 8) {
        var x = cx * w / 9
        while (x < (cx + 1) * w / 9) { img.setRGB(x, y, 0xffffff); x += 1 }
        y += 1
      }
    }
    B.encodePng(img)
  }

  /** Deterministic PIXEL-NOISE near-duplicate of the seed's synthetic
    * media: every pixel's channels shift by a hash-derived value in
    * [-amp, amp]. Spatially-uncorrelated noise spreads across HIGH
    * frequencies, so the [[pHash]] 8×8 low-frequency block barely
    * moves (small hamming distance) while per-pixel content changes
    * everywhere — the fixture that exercises pHash's robustness axis
    * (the [[perturbedMedia]] cell-whitening exercises dHash's). */
  def noisyMedia(seed: Long, w: Int, h: Int, amp: Int): Array[Byte] = {
    import graft.functions.{BinaryFunctions => B}
    val img = B.decode(B.syntheticMedia(seed, w, h)).getOrElse(
      sys.error(s"syntheticMedia($seed) failed to decode"))
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val n = (((seed * 1000003L + y * 131L + x) * 2654435761L >>> 40)
          % (2L * amp + 1)).toInt - amp
        val p = img.getRGB(x, y)
        def ch(v: Int) = math.max(0, math.min(255, v + n))
        img.setRGB(x, y, (ch((p >> 16) & 0xff) << 16) |
          (ch((p >> 8) & 0xff) << 8) | ch(p & 0xff))
        x += 1
      }
      y += 1
    }
    B.encodePng(img)
  }

  /** Near-duplicate image pairs within hamming distance `maxDist` —
    * the shared pigeonhole banding ([[graft.functions.HammingBands]],
    * also the text SimHash pairs' shape): `maxDist + 1` bands over the
    * 64-bit hash, lossless within the bound, no cross join. */
  def dhashNearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7, "bands are >=8-bit: maxDist 0-7")
    val nBands = maxDist + 1
    graft.functions.HammingBands.pairs(hashes, "key", "dhash",
      nBands, 64 / nBands, maxDist)
  }

  /** Per-frame perceptual hashes for VIDEO near-dup detection — the
    * composition the training-data pipeline needs (find re-posted /
    * trimmed / re-encoded videos): [[sampleFrames]] fans each video out
    * to PNG frames through the container decoders, then every frame
    * rides the image [[dHash]] kernel under a composite
    * `videoKey#frameIdx` key. One map-side pass end to end — container
    * parse, frame decode, hash — no shuffle; pairing afterwards is the
    * same banded equi-join as stills ([[dhashNearDupPairs]]), so a
    * video that shares frames with another meets it on band keys
    * without any cross join. */
  def videoFrameDHashes(media: DataFrame, everyNth: Int = 1,
      maxFrames: Int = 32): DataFrame =
    imageDHashes(frameMedia(media, everyNth, maxFrames))

  /** [[videoFrameDHashes]] under the [[pHash]] kernel — the frequency
    * leg of the kernel×modality matrix. */
  def videoFramePHashes(media: DataFrame, everyNth: Int = 1,
      maxFrames: Int = 32): DataFrame =
    imagePHashes(frameMedia(media, everyNth, maxFrames))

  /** Frames as (composite `video#frame` key, bytes) — the shared
    * sampling/keying stage of both kernel legs.
    * stubUndecodable=false: stub frames derive from the KEY, so
    * hashing them would fabricate d=0 pairs between unrelated
    * undecodable videos (and never match the same content under two
    * keys) — errors must stay ABSENT here, not synthetic content. */
  private def frameMedia(media: DataFrame, everyNth: Int,
      maxFrames: Int): DataFrame =
    sampleFrames(media, everyNth, maxFrames, stubUndecodable = false)
      .select(concat_ws("#", col("key"), col("frame_idx")).as("key"),
        col("frame").as("bytes"))

  /** Aggregate COMPOSITE-KEY near-dup pairs (`container#index` — video
    * frames from [[videoFrameDHashes]], audio segments from
    * [[audioSegmentDHashes]]) to a CONTAINER-LEVEL repost verdict: the
    * user-facing answer to "which videos are reposts of each other",
    * not just which frames collide. Per unordered container pair
    * (a < b): `n_matches` matching units, `n_offsets` distinct index
    * shifts among them, and `shift` the smallest shift (index in a
    * minus index in b) — a true trimmed/shifted repost matches many
    * units under ONE consistent shift (n_offsets = 1), while
    * coincidental single-unit collisions are cut by `minMatches`.
    *
    * Scale: input is the banded pair output (never a cross join); this
    * adds one map-side key parse + one groupBy on the container pair —
    * map-side partial aggregation absorbs the per-frame fan-in, so the
    * shuffle carries container pairs, not frame pairs. */
  def repostVerdicts(pairs: DataFrame, minMatches: Int = 2): DataFrame = {
    // composite keys split on the LAST '#' (container keys may carry
    // '#' themselves; the index never does — it's a rendered int)
    def container(k: org.apache.spark.sql.Column) =
      k.substr(lit(1), length(k) - length(substring_index(k, "#", -1)) - 1)
    def idx(k: org.apache.spark.sql.Column) =
      substring_index(k, "#", -1).cast("int")
    val p = pairs.select(
      container(col("a")).as("va"), idx(col("a")).as("fa"),
      container(col("b")).as("vb"), idx(col("b")).as("fb"))
      .filter(col("va") =!= col("vb"))
    val sw = col("va") > col("vb")
    p.select(
      when(sw, col("vb")).otherwise(col("va")).as("a"),
      when(sw, col("va")).otherwise(col("vb")).as("b"),
      when(sw, col("fb") - col("fa")).otherwise(col("fa") - col("fb"))
        .cast("long").as("shift"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_matches"),
        countDistinct(col("shift")).as("n_offsets"),
        min(col("shift")).as("shift"))
      .filter(col("n_matches") >= minMatches)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("rms", DoubleType)))

  /** Audio feature extraction — REAL for PCM WAV (RIFF header parse +
    * 16-bit sample RMS, pure JVM); compressed formats (mp3/ogg/flac) have
    * no codec here and yield null features — same contract as images. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val b = r.getAs[Array[Byte]](1)
        parseWav(b) match {
          case Some((rate, ch, bits, n, rms)) => Row(key, rate, ch, bits, n, rms)
          case None => Row(key, null, null, null, null, null)
        }
      }
    }(enc).toDF()
  }

  /** RIFF/WAVE header walk → (rate, channels, bits, dataOff, nSamples16)
    * — the shared base of [[parseWav]] and [[audioDHash]]. nSamples16
    * counts 16-bit sample units across channels, clamped to what the
    * file actually holds. */
  private def wavRegion(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Long)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong | (u16(i + 2).toLong << 16)) & 0xffffffffL
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
      && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var rate = 0; var ch = 0; var bits = 0
    var dataOff = -1; var dataLen = 0L
    var ok = true
    while (ok && pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      // clamp untrusted chunk length: 2^31+ would wrap negative on toInt
      // and walk pos backwards forever
      val len = math.min(u32(pos + 4), (b.length - pos - 8).toLong)
      if (len < 0) ok = false
      else {
        if (id == "fmt ") {
          ch = u16(pos + 10); rate = u32(pos + 12).toInt; bits = u16(pos + 22)
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len.toInt + (len.toInt & 1)
      }
    }
    if (rate == 0 || ch == 0 || dataOff < 0 || bits != 16) return None
    Some((rate, ch, bits,
      dataOff, math.min(dataLen, (b.length - dataOff).toLong) / 2))
  }

  /** Minimal RIFF/WAVE PCM parser: fmt + data chunks, 16-bit PCM RMS. */
  private[operators] def parseWav(b: Array[Byte])
      : Option[(Int, Int, Int, Long, Double)] = {
    val (rate, ch, bits, dataOff, n) = wavRegion(b).getOrElse(return None)
    var sum = 0.0
    var i = 0L
    while (i < n) {
      val off = dataOff + (i * 2).toInt
      val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort / 32768.0
      sum += s * s
      i += 1
    }
    Some((rate, ch, bits, n / ch, if (n == 0) 0.0 else math.sqrt(sum / n)))
  }

  // --- perceptual audio dedup (energy-envelope dHash) ---------------------

  /** 64-bit audio DIFFERENCE FINGERPRINT over 16-bit PCM WAV: mean-pool
    * the per-sample energy into 65 equal time windows, set bit i when
    * window i's energy exceeds window i+1's — the image [[dHash]] idea
    * on the time axis, completing the perceptual-dedup triad (image
    * q104, video q106, audio here). GAIN-ROBUST: exact amplitude
    * scaling multiplies every window energy by one factor, so no
    * comparison flips; a REAL re-master (scaled then re-quantized to
    * 16-bit) additionally perturbs each window by quantization noise,
    * which can flip a bit only where adjacent windows hold near-equal
    * energy — so loud/quiet copies land at d=0 or within a few bits,
    * inside the banding bound, not necessarily at exact identity (the
    * fixture's stepped envelopes DO hash identically at half volume;
    * that is the fixture's margin, not a universal guarantee).
    * Deterministic integer windowing, pure JVM; the banded pairing is
    * the shared [[graft.functions.HammingBands]] shape. None for
    * non-WAV / non-16-bit bytes (errors are data). */
  def audioDHash(b: Array[Byte]): Option[Long] = try {
    val (_, _, _, dataOff, n) = wavRegion(b).getOrElse(return None)
    pcm16Fingerprint(b, dataOff, n)
  } catch { case _: Exception => None }

  /** The fingerprint core over a raw 16-bit-LE PCM region — shared by
    * the WAV path and the in-container AVI soundtrack path, so the two
    * cannot drift. */
  private def pcm16Fingerprint(b: Array[Byte], dataOff: Int,
      n: Long): Option[Long] = {
    if (n < 65) return None
    // byte offsets below are Int arithmetic: a ~1 GiB+ PCM region would
    // wrap dataOff + i*2 negative and throw mid-task instead of
    // yielding null ("errors are data") — reject oversize regions here
    if (dataOff.toLong + n * 2 > Int.MaxValue) return None
    val energy = new Array[Double](65)
    var w = 0
    while (w < 65) {
      val s0 = w * n / 65
      val s1 = math.max(s0 + 1, (w + 1) * n / 65)
      var sum = 0.0
      var i = s0
      while (i < math.min(s1, n)) {
        val off = dataOff + (i * 2).toInt
        val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort / 32768.0
        sum += s * s
        i += 1
      }
      energy(w) = sum / (math.min(s1, n) - s0)
      w += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (energy(i) > energy(i + 1)) bits |= 1L << i
      i += 1
    }
    Some(bits)
  }

  /** Per-SEGMENT fingerprints for TRIM-ROBUST audio dedup: the
    * whole-file [[audioDHash]] survives gain changes but dies on a cut
    * intro (every energy window shifts); slicing the recording into
    * fixed-duration segments and fingerprinting each one is the video-
    * frame pattern applied to the time axis — a copy trimmed by a
    * whole number of segments still carries byte-identical PCM for the
    * surviving segments, which meet the original's at d=0 under
    * shifted indices, and [[repostVerdicts]] turns those segment pairs
    * into the recording-level answer. Returns (segIdx, hash) per FULL
    * segment (a short tail is dropped — its windows would average over
    * different support and never match anything); None for non-WAV /
    * non-16-bit bytes or when no full segment fits. */
  def audioSegmentDHash(b: Array[Byte],
      segSeconds: Double = 0.5): Option[Seq[(Int, Long)]] = try {
    val (rate, ch, _, dataOff, n) = wavRegion(b).getOrElse(return None)
    // n counts interleaved all-channel 16-bit units, so a fixed-DURATION
    // segment spans rate*ch of them (mono-blind math would halve a
    // stereo file's segment duration and break trim alignment)
    val segSamples = (segSeconds * rate).toLong * ch
    if (segSamples < 65) return None
    val nSegs = (n / segSamples).toInt
    if (nSegs == 0) return None
    val out = (0 until nSegs).flatMap { i =>
      pcm16Fingerprint(b, dataOff + (i * segSamples * 2).toInt, segSamples)
        .map(i -> _)
    }
    if (out.isEmpty) None else Some(out)
  } catch { case _: Exception => None }

  /** (key#segIdx, ahash) per full segment per audio row — one map-side
    * pass; undecodable rows yield NO rows (the [[videoFrameDHashes]]
    * posture: absent, not fabricated). Pairs through the same
    * [[audioNearDupPairs]] banding; [[repostVerdicts]] aggregates to
    * recordings. */
  def audioSegmentDHashes(media: DataFrame,
      segSeconds: Double = 0.5): DataFrame = {
    val enc = RowEncoder.encoderFor(audioDhashSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        audioSegmentDHash(bytes, segSeconds).getOrElse(Nil).map {
          case (i, h) => Row(s"$key#$i", h)
        }
      }
    }(enc).toDF()
  }

  /** Drop the first `skipSeconds` from a 16-bit PCM WAV, rebuilding a
    * minimal mono-layout header over the surviving samples — the
    * trimmed-repost fixture generator (and a real corpus-prep op:
    * cutting a known intro/jingle before fingerprinting). None for
    * non-WAV bytes or when nothing survives the cut. */
  def trimWav(b: Array[Byte], skipSeconds: Double): Option[Array[Byte]] = try {
    val (rate, ch, _, dataOff, n) = wavRegion(b).getOrElse(return None)
    val skip = (skipSeconds * rate).toLong * ch
    if (skip <= 0 || skip >= n) return None
    val remain = ((n - skip) * 2).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    bos.write("RIFF".getBytes); le32(36L + remain); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(ch)
    le32(rate.toLong); le32(rate.toLong * 2 * ch); le16(2 * ch); le16(16)
    bos.write("data".getBytes); le32(remain.toLong)
    bos.write(b, dataOff + (skip * 2).toInt, remain)
    Some(bos.toByteArray)
  } catch { case _: Exception => None }

  /** Fingerprint the SOUNDTRACK inside a RIFF AVI: walk the container
    * for the audio stream's `NNwb` chunks (NN = the stream's hdrl
    * index; video-then-audio layouts make it `01wb`), require 16-bit
    * PCM in its WAVEFORMAT block, reassemble the chunk payloads in file
    * order and run the SAME [[pcm16Fingerprint]] the WAV path uses — so
    * a video's soundtrack and the standalone recording it came from
    * hash identically, and "find re-posted videos by identical
    * soundtrack" is one banded join between [[videoAudioDHashes]] and
    * [[audioDHashes]] outputs. None for non-AVI bytes, AVIs without a
    * PCM audio stream, or fewer than 65 samples (errors are data). */
  def videoAudioDHash(b: Array[Byte]): Option[Long] = try {
    if (b == null || b.length < 12) return None
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (u16(i).toLong | (u16(i + 2).toLong << 16)) & 0xffffffffL
    // pass 1: find the audio stream's index and verify 16-bit PCM
    var streamIdx = -1
    var audioIdx = -1
    var pcm16 = false
    var inAuds = false
    def walkHdr(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 32) return
      var pos = start
      while (pos + 8 <= end && pos + 8 <= b.length) {
        val id = tag(pos)
        val len = math.min(u32(pos + 4), (b.length - pos - 8).toLong).toInt
        if (len < 0) return
        if (id == "LIST") {
          if (pos + 12 <= b.length && tag(pos + 8) == "strl") streamIdx += 1
          walkHdr(pos + 12, math.min(pos + 8 + len, b.length), depth + 1)
        } else if (id == "strh" && len >= 4) {
          inAuds = tag(pos + 8) == "auds"
          if (inAuds && audioIdx < 0) audioIdx = streamIdx
        } else if (id == "strf" && inAuds && len >= 16 &&
          audioIdx == streamIdx) {
          // WAVEFORMAT: wFormatTag(1=PCM) ... wBitsPerSample at +14
          pcm16 = u16(pos + 8) == 1 && u16(pos + 8 + 14) == 16
        }
        pos += 8 + len + (len & 1)
      }
    }
    walkHdr(12, b.length, 0)
    if (audioIdx < 0 || !pcm16) return None
    val chunkId = f"$audioIdx%02dwb"
    // pass 2: reassemble the audio chunks in file order
    val pcm = new java.io.ByteArrayOutputStream()
    def walkData(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 32) return
      var pos = start
      while (pos + 8 <= end && pos + 8 <= b.length) {
        val id = tag(pos)
        val len = math.min(u32(pos + 4), (b.length - pos - 8).toLong).toInt
        if (len < 0) return
        if (id == "LIST")
          walkData(pos + 12, math.min(pos + 8 + len, b.length), depth + 1)
        else if (id == chunkId && len > 0)
          pcm.write(b, pos + 8, len)
        pos += 8 + len + (len & 1)
      }
    }
    walkData(12, b.length, 0)
    val data = pcm.toByteArray
    pcm16Fingerprint(data, 0, data.length / 2)
  } catch { case _: Exception => None }

  /** (key, ahash) for the soundtrack of each video row — one map-side
    * pass, nulls for undecodable/soundtrack-less bytes. */
  def videoAudioDHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioDhashSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        videoAudioDHash(bytes) match {
          case Some(h) => Row(key, h)
          case None => Row(key, null)
        }
      }
    }(enc).toDF()
  }

  val audioDhashSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("ahash", LongType)))

  /** (key, ahash) per audio row — one map-side pass, nulls for
    * undecodable bytes, the [[imageDHashes]] contract. */
  def audioDHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioDhashSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        audioDHash(bytes) match {
          case Some(h) => Row(key, h)
          case None => Row(key, null)
        }
      }
    }(enc).toDF()
  }

  val videoStatsSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("n_frames", LongType),
    StructField("px_per_frame", LongType)))

  /** Frame count + header-declared dimensions from ONE metadata walk
    * of the RIFF container — no frame decodes, no re-encodes (a stats
    * pass that paid the full [[parseAviFrames]] decode+PNG cost per
    * frame would multiply the corpus's dominant cost by F for a
    * two-number answer). The dims are the same BITMAPINFOHEADER
    * values the decoders bound their allocations by; |h| covers the
    * top-down-DIB negative-height convention. None when no video
    * frames or no format block parse. */
  private[operators] def aviContainerStats(b: Array[Byte])
      : Option[(Int, Int, Int)] = try {
    if (b == null || b.length < 12) return None
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var w = 0; var h = 0; var n = 0; var seen = false
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 32) return
      var pos = start
      while (pos + 8 <= end && pos + 8 <= b.length) {
        val id = tag(pos)
        val len =
          math.min(u32le(b, pos + 4), (b.length - pos - 8).toLong).toInt
        if (len < 0) return
        if (id == "LIST")
          walk(pos + 12, math.min(pos + 8 + len, b.length), depth + 1)
        else if (id == "strf" && !seen && len >= 40
          && u32le(b, pos + 8) == 40L) {
          w = u32le(b, pos + 12).toInt
          h = math.abs(u32le(b, pos + 16).toInt)
          seen = true
        } else if ((id == "00db" || id == "00dc") && len > 0
          && pos + 8 + len <= b.length) n += 1
        pos += 8 + len + (len & 1)
      }
    }
    walk(12, b.length, depth = 0)
    if (n > 0 && w > 0 && h > 0) Some((n, w, h)) else None
  } catch { case _: Exception => None }

  /** (key, frame count, pixels per frame) per video row — the
    * duration/resolution quality signal for video retention (q181),
    * the [[imagePixelCounts]] contract one modality up. Frame COUNT
    * comes from [[aviContainerStats]]' metadata-only walk; the
    * DIMENSIONS come from DECODING the first frame (one decode per
    * container, never F — but the quality signal must not trust a
    * header: a container declaring 4096×4096 over garbage chunks
    * would otherwise outscore every honest member of its cluster; a
    * container whose first frame cannot decode is quality-UNKNOWN,
    * which [[Retention.keepBest]] sorts last by design). Residual
    * trust: the chunk COUNT (decoding all frames to verify it would
    * multiply the dominant cost by F) — documented, bounded by the
    * decoded-dims gate. */
  def videoStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(videoStatsSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val stats = aviContainerStats(bytes)
        val firstPx = try {
          parseAviFrames(bytes, 1, 1).flatMap(_.headOption)
            .flatMap(f => graft.functions.BinaryFunctions.decode(f._2))
            .map(i => i.getWidth.toLong * i.getHeight)
        } catch { case _: Exception => None }
        (stats, firstPx) match {
          case (Some((n, _, _)), Some(px)) => Row(key, n.toLong, px)
          case _ => Row(key, null, null)
        }
      }
    }(enc).toDF()
  }

  val imagePixelSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("px", LongType)))

  /** (key, pixel count) per media row through the ENGINE's decode
    * fan-in (the same [[graft.functions.BinaryFunctions.decode]] the
    * perceptual hashes ride, so every hashable image also has a
    * resolution — [[imageFeatures]]'s ImageIO scope would blank the
    * tiff/svg arms). The quality signal for resolution-aware
    * retention (q172); null for undecodable bytes. */
  def imagePixelCounts(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imagePixelSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = try graft.functions.BinaryFunctions.decode(bytes)
          catch { case _: Exception => None }
        img match {
          case Some(i) => Row(key, i.getWidth.toLong * i.getHeight)
          case None => Row(key, null)
        }
      }
    }(enc).toDF()
  }

  /** Integer nearest-neighbor UPSCALE, re-encoded PNG — a corpus-prep
    * op (and q172's higher-resolution-copy fixture generator). Box-
    * pooled perceptual kernels are invariant to it when the original
    * dimensions divide the pool grid: every pool box averages the
    * same source pixels duplicated `factor`× — so the upscaled copy
    * lands at d=0 and clusters with its original, where a
    * resolution-aware retention policy can prefer it. None for
    * undecodable bytes. */
  def upscaleNn(b: Array[Byte], factor: Int): Option[Array[Byte]] = try {
    require(factor >= 1, "factor must be positive")
    graft.functions.BinaryFunctions.decode(b).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new java.awt.image.BufferedImage(w * factor, h * factor,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h * factor) {
        var x = 0
        while (x < w * factor) {
          out.setRGB(x, y, img.getRGB(x / factor, y / factor))
          x += 1
        }
        y += 1
      }
      graft.functions.BinaryFunctions.encodePng(out)
    }
  } catch { case _: Exception => None }

  // --- spectral audio fingerprint (frequency-band energies) --------------

  /** The 9 probe frequencies of [[audioSpectralHash]] (Hz) — fixed,
    * log-spaced under the 4 kHz Nyquist of the 8 kHz fixture rate.
    * Like the pHash DCT matrix, these are part of the kernel's
    * definition: change them and every stored hash invalidates. */
  val spectralProbeHz: Seq[Double] =
    Seq(300, 450, 650, 950, 1400, 2000, 2800, 3400, 3850)

  /** 64-bit SPECTRAL audio fingerprint — the frequency-domain sibling
    * of [[audioDHash]], completing the two-kernel-agreement triad for
    * recordings (images have dHash+pHash, video frames both; audio
    * had only the time-domain envelope). 8 equal time windows × 9
    * Goertzel band energies at [[spectralProbeHz]]; bit `w*8+b` set
    * when window w's band b energy exceeds band b+1's — adjacent-band
    * comparisons, so exact gain scaling (which multiplies every band
    * in a window by one factor) flips nothing, while a change in
    * FREQUENCY CONTENT moves bits the envelope kernel cannot see (and
    * an amplitude-envelope edit moves the envelope kernel while
    * scaling each window's bands near-uniformly — the independence
    * axis q169 pins). All-double fixed-order arithmetic (the pHash
    * discipline) so hashes pin as literals. Channel 0 only on
    * multi-channel audio (interleaved-unit math would alias the probe
    * frequencies on stereo); None for non-WAV / non-16-bit bytes,
    * rates below 2×3850 Hz (aliased probes), or fewer than 32
    * samples per window — errors are data. WAV-only by scope: the
    * AVI-soundtrack path has no sample-rate-free core to share, so
    * the envelope kernel remains the cross-modal workhorse. */
  def audioSpectralHash(b: Array[Byte]): Option[Long] = try {
    val (rate, ch, _, dataOff, units) = wavRegion(b).getOrElse(return None)
    pcm16SpectralFingerprint(b, rate, ch, dataOff, units)
  } catch { case _: Exception => None }

  private def pcm16SpectralFingerprint(b: Array[Byte], rate: Int,
      ch: Int, dataOff: Int, units: Long): Option[Long] = {
    if (rate < 2 * 3850) return None
    val n = units / ch // channel-0 samples
    if (n < 8 * 32) return None
    if (dataOff.toLong + units * 2 > Int.MaxValue) return None
    val energies = Array.ofDim[Double](8, 9)
    var w = 0
    while (w < 8) {
      val s0 = w * n / 8
      val s1 = (w + 1) * n / 8
      var bnd = 0
      while (bnd < 9) {
        // Goertzel power at the probe frequency over this window —
        // O(len) per band, 72 passes total, still one map-side scan
        val omega = 2.0 * math.Pi * spectralProbeHz(bnd) / rate
        val coeff = 2.0 * math.cos(omega)
        var sPrev = 0.0
        var sPrev2 = 0.0
        var i = s0
        while (i < s1) {
          val off = dataOff + (i * ch * 2).toInt
          val x = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort / 32768.0
          val sCur = x + coeff * sPrev - sPrev2
          sPrev2 = sPrev
          sPrev = sCur
          i += 1
        }
        energies(w)(bnd) =
          (sPrev * sPrev + sPrev2 * sPrev2 - coeff * sPrev * sPrev2) /
            (s1 - s0)
        bnd += 1
      }
      w += 1
    }
    var bits = 0L
    var wb = 0
    while (wb < 64) {
      val win = wb / 8
      val bd = wb % 8
      if (energies(win)(bd) > energies(win)(bd + 1)) bits |= 1L << wb
      wb += 1
    }
    Some(bits)
  }

  val audioSpectralSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("shash", LongType)))

  /** (key, shash) per audio row — one map-side pass, nulls for
    * undecodable bytes, the [[audioDHashes]] contract. */
  def audioSpectralHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioSpectralSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        audioSpectralHash(bytes) match {
          case Some(h) => Row(key, h)
          case None => Row(key, null)
        }
      }
    }(enc).toDF()
  }

  val audioDualSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("ahash", LongType),
    StructField("shash", LongType)))

  /** BOTH audio kernels in ONE container-parse pass — the
    * [[imageDualHashes]] pattern (parsing dominates at corpus scale;
    * a policy that decodes twice pays twice). Each null lands
    * independently (a fingerprint needs ≥65 units, the spectral one
    * ≥256 — a short clip can carry one hash and not the other). */
  def audioDualHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioDualSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val region = try wavRegion(bytes) catch { case _: Exception => None }
        region match {
          case Some((rate, ch, _, dataOff, units)) =>
            Row(key,
              pcm16Fingerprint(bytes, dataOff, units).orNull,
              pcm16SpectralFingerprint(bytes, rate, ch, dataOff, units)
                .orNull)
          case None => Row(key, null, null)
        }
      }
    }(enc).toDF()
  }

  /** Near-duplicate pairs under the SPECTRAL kernel — the same shared
    * banding over the `shash` column ([[audioNearDupPairs]]'s shape;
    * one pairing engine, two audio hash spaces). */
  def audioSpectralNearDupPairs(hashes: DataFrame,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7, "bands are >=8-bit: maxDist 0-7")
    val nBands = maxDist + 1
    graft.functions.HammingBands.pairs(hashes, "key", "shash",
      nBands, 64 / nBands, maxDist)
  }

  /** Near-duplicate audio pairs within hamming distance `maxDist` —
    * the shared pigeonhole banding, lossless within the bound. */
  def audioNearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7, "bands are >=8-bit: maxDist 0-7")
    val nBands = maxDist + 1
    graft.functions.HammingBands.pairs(hashes, "key", "ahash",
      nBands, 64 / nBands, maxDist)
  }

  /** CROSS-MODAL matches: which recordings ([[audioDHashes]] output)
    * appear as soundtracks of which videos ([[videoAudioDHashes]]
    * output) — a two-sided banded join over the shared fingerprint
    * space, the side carried structurally (a = recording, b = video),
    * never by key naming conventions. */
  def audioCrossModalMatches(recordings: DataFrame, videos: DataFrame,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7, "bands are >=8-bit: maxDist 0-7")
    val nBands = maxDist + 1
    graft.functions.HammingBands.crossPairs(recordings, videos,
      "key", "ahash", nBands, 64 / nBands, maxDist)
  }

  /** The raw little-endian 16-bit PCM data of [[syntheticAmWav]] —
    * shared with [[syntheticAviWithAudio]] so an AVI's soundtrack is
    * byte-identical to the standalone WAV's data section (and their
    * fingerprints provably agree). */
  private def amPcm(seed: Long, cells: Seq[Int], gain: Double,
      seconds: Double, rate: Int): Array[Byte] = {
    val n = (seconds * rate).toInt
    val env = Array.tabulate(65) { k =>
      if (cells.contains(k)) 1.0
      else 0.2 + 0.8 * graft.functions.VectorFunctions.mix01(seed ^ (k * 0x9e37L))
    }
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val seg = (i.toLong * 65 / n).toInt
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * env(seg) * gain
        * 16384).toInt
      out(i * 2) = (v & 0xff).toByte
      out(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic AMPLITUDE-MODULATED PCM WAV: a 440 Hz carrier under
    * a seed-derived 65-segment envelope (0.2..1.0, splitmix-uniform),
    * segments aligned with [[audioDHash]]'s energy windows so `cells`
    * (segments forced to full scale — the audio [[perturbedMedia]])
    * move at most 2 fingerprint bits each. `gain` scales every sample
    * uniformly — the fingerprint must not care. The controlled fixture
    * generator behind q107's oracle-pinned pairing. */
  def syntheticAmWav(seed: Long, cells: Seq[Int] = Nil, gain: Double = 1.0,
      seconds: Double = 1.0, rate: Int = 8000): Array[Byte] = {
    val pcm = amPcm(seed, cells, gain, seconds, rate)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt) }
    bos.write("RIFF".getBytes); le32(36L + pcm.length); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(1)
    le32(rate.toLong); le32(rate.toLong * 2); le16(2); le16(16)
    bos.write("data".getBytes); le32(pcm.length.toLong)
    bos.write(pcm)
    bos.toByteArray
  }

  /** Deterministic MULTI-TONE PCM WAV — the fixture generator for the
    * spectral kernel the way [[syntheticAmWav]] is for the envelope
    * kernel, with BOTH perturbation axes controllable independently:
    * 8 time windows (aligned with [[audioSpectralHash]]'s) each carry
    * a seed-derived amplitude mix over the 9 [[spectralProbeHz]]
    * tones, all under a seed-derived 65-cell amplitude envelope
    * (aligned with [[audioDHash]]'s windows).
    *  - `bandSwaps`: windows whose band-2 and band-5 mix amplitudes
    *    SWAP — frequency content moves (spectral bits flip) while the
    *    swap preserves the mix's total power, so the energy envelope
    *    barely notices;
    *  - `envCells`: 65-grid cells forced to full scale — the
    *    [[syntheticAmWav]] `cells` axis: envelope bits flip while
    *    every band in the touched window scales near-uniformly;
    *  - `gain`: uniform scaling + 16-bit re-quantization — BOTH
    *    kernels must shrug. */
  def syntheticToneWav(seed: Long, bandSwaps: Seq[Int] = Nil,
      envCells: Seq[Int] = Nil, gain: Double = 1.0,
      seconds: Double = 1.0, rate: Int = 8000): Array[Byte] = {
    val n = (seconds * rate).toInt
    val amps = Array.tabulate(8, 9) { (w, b) =>
      0.25 + 0.75 * graft.functions.VectorFunctions.mix01(
        seed ^ ((w * 9 + b + 1) * 0x9e3779b97f4a7c15L))
    }
    bandSwaps.foreach { w =>
      val t = amps(w)(2); amps(w)(2) = amps(w)(5); amps(w)(5) = t
    }
    val env = Array.tabulate(65) { k =>
      if (envCells.contains(k)) 1.0
      else 0.2 + 0.8 * graft.functions.VectorFunctions.mix01(
        seed ^ ((k + 65) * 0x9e37L))
    }
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 8 / n).toInt
      val seg = (i.toLong * 65 / n).toInt
      var mix = 0.0
      var b = 0
      while (b < 9) {
        mix += amps(w)(b) *
          math.sin(2 * math.Pi * spectralProbeHz(b) * i / rate)
        b += 1
      }
      // 9 unit tones peak at 9.0; 2000/unit keeps worst case < 32767
      val v = (mix * env(seg) * gain * 2000).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt) }
    bos.write("RIFF".getBytes); le32(36L + pcm.length); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(1)
    le32(rate.toLong); le32(rate.toLong * 2); le16(2); le16(16)
    bos.write("data".getBytes); le32(pcm.length.toLong)
    bos.write(pcm)
    bos.toByteArray
  }

  /** Deterministic 16-bit PCM WAV for tests (sine wave). */
  def syntheticWav(freqHz: Double, seconds: Double, rate: Int = 8000): Array[Byte] = {
    val n = (seconds * rate).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt) }
    bos.write("RIFF".getBytes); le32(36L + n * 2); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(1)
    le32(rate.toLong); le32(rate.toLong * 2); le16(2); le16(16)
    bos.write("data".getBytes); le32(n.toLong * 2)
    var i = 0
    while (i < n) {
      le16((math.sin(2 * math.Pi * freqHz * i / rate) * 16384).toInt & 0xffff)
      i += 1
    }
    bos.toByteArray
  }

  /** Embedding stub for media rows (the decode→embed path of a training
    * pipeline): a deterministic D-dim vector from the content hash, so the
    * similarity-search operators (SimilarityQueries) compose with media
    * inputs end to end. */
  def fakeEmbedding(media: DataFrame, dim: Int = 16): DataFrame =
    media.select(col("key"),
      array((0 until dim).map(j =>
        (pmod(xxhash64(col("bytes"), lit(j)), lit(1000)).cast("double")
          / 500.0 - 1.0)): _*).as("emb"))
}
