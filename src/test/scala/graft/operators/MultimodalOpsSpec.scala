package graft.operators

import graft.SparkSpec
import graft.functions.BinaryFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (String, Array[Byte])*) =
    rows.toSeq.toDF("key", "bytes")

  test("imageFeatures decodes real PNGs per-partition, nulls the rest") {
    val png = BinaryFunctions.syntheticPng(3, 8, 6)
    val df = MultimodalOps.imageFeatures(media(
      "a" -> png, "b" -> "not an image".getBytes, "c" -> null))
    val byKey = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byKey("a").getString(1) === "png")
    assert(byKey("a").getInt(2) === 8 && byKey("a").getInt(3) === 6)
    val luma = byKey("a").getDouble(4)
    assert(luma > 0.0 && luma < 255.0)
    assert(byKey("b").isNullAt(2) && byKey("c").isNullAt(2))
  }

  test("imageFeatures is deterministic across partitionings") {
    val rows = (1 to 20).map(i =>
      s"k$i" -> BinaryFunctions.syntheticPng(i.toLong, 8, 6))
    val one = MultimodalOps.imageFeatures(media(rows: _*).repartition(1))
      .orderBy("key").collect().map(_.toString)
    val many = MultimodalOps.imageFeatures(media(rows: _*).repartition(7))
      .orderBy("key").collect().map(_.toString)
    assert(one.toSeq === many.toSeq)
  }

  test("sampleFrames fans out one row per frame with the declared schema") {
    val df = MultimodalOps.sampleFrames(
      media("v1" -> "fakevideo".getBytes), everyNth = 5, maxFrames = 3)
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 5, 10))
    // stub frames are themselves valid PNGs (plumbing is real)
    rows.foreach(r =>
      assert(BinaryFunctions.sniffFormat(r.getAs[Array[Byte]](2)) === "png"))
  }

  test("sampleFrames treats a decodable STILL as a 1-frame video " +
    "(stills are content, not stub fodder)") {
    val png = BinaryFunctions.syntheticPng(5, 16, 12)
    val rows = MultimodalOps.sampleFrames(
      media("img" -> png), everyNth = 2, maxFrames = 4).collect()
    assert(rows.length === 1)
    assert(rows.head.getInt(1) === 0)
    // and so byte-identical stills under different keys MEET in
    // frame-hash dedup instead of diverging through keyed stubs
    val hs = MultimodalOps.videoFrameDHashes(
      media("s1" -> png, "s2" -> png.clone()))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hs("s1#0") === hs("s2#0"))
  }

  test("sampleFrames decodes real uncompressed-DIB AVI frames") {
    val avi = MultimodalOps.syntheticAvi(seed = 9, w = 10, h = 6, nFrames = 7)
    val rows = MultimodalOps.sampleFrames(
      media("v" -> avi), everyNth = 3, maxFrames = 2)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 3))
    rows.foreach { r =>
      val png = r.getAs[Array[Byte]](2)
      assert(BinaryFunctions.sniffFormat(png) === "png")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth === 10 && img.getHeight === 6)
      val f = r.getInt(1)
      // pixel-exact vs the writer's seeded formula
      for (y <- 0 until 6; x <- 0 until 10) {
        val v = (9L * 2654435761L + f * 101 + x * 31 + y * 17) & 0xffffff
        assert((img.getRGB(x, y) & 0xffffff) === v.toInt,
          s"pixel ($x,$y) of frame $f")
      }
    }
  }

  test("sampleFrames decodes MJPEG AVI frames through the JPEG decoder, " +
    "frame-exact with a direct decode of the same chunk bytes") {
    val avi = MultimodalOps.syntheticMjpegAvi(seed = 4, w = 24, h = 16,
      nFrames = 5)
    val rows = MultimodalOps.sampleFrames(
      media("m" -> avi), everyNth = 2, maxFrames = 3)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 2, 4))
    // rebuild the exact JPEG bytes the writer embedded, decode them
    // directly, and demand pixel identity with the sampled frames —
    // JPEG is lossy, so the reference is the decode of the SAME bytes,
    // not the pre-encode pixels
    rows.foreach { r =>
      val f = r.getInt(1)
      val png = r.getAs[Array[Byte]](2)
      assert(BinaryFunctions.sniffFormat(png) === "png")
      val got = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24)
        img.setRGB(x, y,
          ((4L * 2654435761L + f * 101 + x * 31 + y * 17) & 0xffffff).toInt)
      val jb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", jb)
      val want = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jb.toByteArray))
      assert(got.getWidth === 24 && got.getHeight === 16)
      for (y <- 0 until 16; x <- 0 until 24)
        assert((got.getRGB(x, y) & 0xffffff) ===
          (want.getRGB(x, y) & 0xffffff), s"pixel ($x,$y) of frame $f")
    }
    // a non-JPEG compressed stream still takes the stub path: flip the
    // JPEG SOI markers so no frame sniffs as JPEG
    val broken = avi.clone()
    var i = 0
    var n = 0
    while (i + 1 < broken.length) {
      if ((broken(i) & 0xff) == 0xff && (broken(i + 1) & 0xff) == 0xd8 &&
          i >= 8 && new String(broken, i - 8, 4, "US-ASCII") == "00dc") {
        broken(i) = 0; n += 1
      }
      i += 1
    }
    assert(n > 0, "fixture self-check: found no frame chunks to break")
    assert(MultimodalOps.parseAviFrames(broken, 1, 3) === None)
  }

  test("sampleFrames decodes BI_RLE8 AVI frames — keyframe runs, delta " +
    "frames compositing onto the previous frame's canvas") {
    val w = 11; val h = 3 // odd width exercises absolute-mode word padding
    val palette = Array.tabulate(16)(k =>
      (((k * 2654435761L) >>> 4) & 0xffffff).toInt)
    // logical index canvases (top-down): a run-friendly keyframe, then
    // each frame rewrites image row f % h — f=2 hits row h-1 (the
    // bottom DIB row, where the delta encoding needs NO skip escape)
    val canvases = scala.collection.mutable.ArrayBuffer(
      Array.tabulate(w * h)(i => (((i / w) * 3 + (i % w) / 4) % 16).toByte))
    for (f <- 1 until 5) {
      val cur = canvases.last.clone()
      val r = f % h
      for (x <- 0 until w)
        cur(r * w + x) = (((cur(r * w + x) & 0xff) + 1 + f) % 16).toByte
      canvases += cur
    }
    val avi = MultimodalOps.syntheticAviRle8(palette, canvases.toSeq, w, h)
    val rows = MultimodalOps.sampleFrames(
      media("r" -> avi), everyNth = 1, maxFrames = 5)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3, 4))
    rows.foreach { r =>
      val f = r.getInt(1)
      val png = r.getAs[Array[Byte]](2)
      assert(BinaryFunctions.sniffFormat(png) === "png")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) ===
          palette(canvases(f)(y * w + x) & 0xff),
          s"pixel ($x,$y) of frame $f")
    }
    // sub-sampling must still composite the SKIPPED frames' deltas:
    // sampled frame 2 carries frame 1's row rewrite
    val sub = MultimodalOps.sampleFrames(
      media("r" -> avi), everyNth = 2, maxFrames = 2)
      .orderBy("frame_idx").collect()
    assert(sub.map(_.getInt(1)).toSeq === Seq(0, 2))
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sub(1).getAs[Array[Byte]](2)))
    for (y <- 0 until h; x <- 0 until w)
      assert((img2.getRGB(x, y) & 0xffffff) ===
        palette(canvases(2)(y * w + x) & 0xff), s"subsampled pixel ($x,$y)")
    // truncated untrusted bytes must not throw (frames or None, never
    // an exception past the walk)
    MultimodalOps.parseAviFrames(
      java.util.Arrays.copyOf(avi, avi.length - 10), 1, 5)
  }

  test("sampleFrames decodes BI_RLE4 AVI frames — alternating-nibble " +
    "runs, packed-nibble absolute rows, delta compositing") {
    val w = 11; val h = 3 // odd width: the last absolute byte half-used
    val palette = Array.tabulate(16)(k =>
      (((k * 40503L) >>> 2) & 0xffffff).toInt)
    val canvases = scala.collection.mutable.ArrayBuffer(
      Array.tabulate(w * h)(i => (((i / w) * 5 + (i % w) / 3) % 16).toByte))
    for (f <- 1 until 5) {
      val cur = canvases.last.clone()
      val r = f % h
      for (x <- 0 until w)
        cur(r * w + x) = (((cur(r * w + x) & 0xff) + 1 + f) % 16).toByte
      canvases += cur
    }
    val avi = MultimodalOps.syntheticAviRle4(palette, canvases.toSeq, w, h)
    val rows = MultimodalOps.sampleFrames(
      media("r4" -> avi), everyNth = 1, maxFrames = 5)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3, 4))
    rows.foreach { r =>
      val f = r.getInt(1)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) ===
          palette(canvases(f)(y * w + x) & 0xff),
          s"pixel ($x,$y) of frame $f")
    }
    // sub-sampling still composites the SKIPPED frames' deltas
    val sub = MultimodalOps.sampleFrames(
      media("r4" -> avi), everyNth = 2, maxFrames = 2)
      .orderBy("frame_idx").collect()
    assert(sub.map(_.getInt(1)).toSeq === Seq(0, 2))
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sub(1).getAs[Array[Byte]](2)))
    for (y <- 0 until h; x <- 0 until w)
      assert((img2.getRGB(x, y) & 0xffffff) ===
        palette(canvases(2)(y * w + x) & 0xff), s"subsampled ($x,$y)")
    // truncated untrusted bytes must not throw
    MultimodalOps.parseAviFrames(
      java.util.Arrays.copyOf(avi, avi.length - 10), 1, 5)
  }

  test("sampleFrames reassembles animated WebP through WebpAnim") {
    val anim = {
      val in = getClass.getResourceAsStream("/vp8/anim_replace.webp")
      try in.readAllBytes() finally in.close()
    }
    val rows = MultimodalOps.sampleFrames(
      media("w" -> anim), everyNth = 2, maxFrames = 2)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 2))
    rows.foreach { r =>
      val png = r.getAs[Array[Byte]](2)
      assert(BinaryFunctions.sniffFormat(png) === "png")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth === 40 && img.getHeight === 24)
    }
  }

  test("sampleFrames reassembles animated GIF through GifAnim") {
    // two 6x4 full-canvas frames via the JDK GIF writer (fixture
    // recipe proven in GifAnimSpec)
    val cmapA = Array(0xffff0000, 0xff00ff00).map(_.toInt)
    val icm = new java.awt.image.IndexColorModel(8, 2, cmapA, 0, false,
      -1, java.awt.image.DataBuffer.TYPE_BYTE)
    def f(idx: Int) = {
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 4; x <- 0 until 6)
        img.getRaster.setSample(x, y, 0, idx)
      img
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(f(0), f(1)).foreach { img =>
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val rows = MultimodalOps.sampleFrames(
      media("g" -> baos.toByteArray), everyNth = 1, maxFrames = 4)
      .orderBy("frame_idx").collect()
    assert(rows.length === 2)
    val img1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(1).getAs[Array[Byte]](2)))
    assert(img1.getWidth === 6 && img1.getHeight === 4)
    assert((img1.getRGB(3, 2) & 0xffffff) === 0x00ff00)
  }

  test("dHash: re-encode-invariant, locality under small edits, " +
    "distance under different content") {
    def img(seed: Long) = {
      val png = BinaryFunctions.syntheticPng(seed, 64, 48)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    }
    val base = img(7)
    // identical pixels, different container: png vs bmp encode
    val bmp = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(base, "bmp", bos)
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
    }
    assert(MultimodalOps.dHash(base) === MultimodalOps.dHash(bmp))
    // a small local edit moves few bits; different content moves many
    val edited = {
      val c = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = c.createGraphics(); g.drawImage(base, 0, 0, null)
      g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 6, 5)
      g.dispose(); c
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(MultimodalOps.dHash(base), MultimodalOps.dHash(edited)) <= 6)
    assert(dist(MultimodalOps.dHash(base), MultimodalOps.dHash(img(99))) > 10)
  }

  test("imageDHashes + banded near-dup pairs: finds the re-encoded " +
    "twin without a cross join, exact popcount distances") {
    val png = BinaryFunctions.syntheticPng(7, 64, 48)
    val bmp = {
      val i = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "bmp", bos)
      bos.toByteArray
    }
    val far = BinaryFunctions.syntheticPng(99, 64, 48)
    val hashes = MultimodalOps.imageDHashes(media(
      "p" -> png, "q" -> bmp, "z" -> far, "bad" -> "nope".getBytes))
    val hs = hashes.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(hs("bad") === null)
    assert(hs("p") === hs("q"))
    val pairs = MultimodalOps.dhashNearDupPairs(hashes, maxDist = 3)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded pairs must not cross-join:\n$plan")
    val got = pairs.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("p", "q", 0L)))
  }

  test("q104 pinned fixtures: engine dHash equals the oracle's literal " +
    "hashes; banded pairs equal ground-truth all-pairs") {
    import graft.queries.PipelineQueries
    // the hard link behind q104: hash(bytes) == the VALUES literal the
    // DuckDB oracle carries, for every fixture (png, tiff AND svg arms)
    val got = PipelineQueries.dhashFixtureBytes.map { case (k, b) =>
      val img = BinaryFunctions.decode(b).getOrElse(fail(s"$k undecodable"))
      k -> MultimodalOps.dHash(img)
    }
    assert(got === PipelineQueries.pinnedDhashes)
    // the banded join returns exactly the ground-truth <=3 pairs — the
    // d=5/6 decoys collide on a band but must not survive the filter
    val pairs = PipelineQueries.q104DhashPairs(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === Seq(
      ("m01", "m01_dup", 0L), ("m02", "m02_near", 1L),
      ("m07", "m07_near", 1L), ("m09", "m09_near", 2L)))
  }

  test("q158 pinned fixtures: engine pHash equals the oracle's " +
    "literals; noise lands near, re-encode exact, the d=8 cross " +
    "decoy filtered") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.phashFixtureBytes.map { case (k, b) =>
      val img = BinaryFunctions.decode(b).getOrElse(fail(s"$k undecodable"))
      k -> MultimodalOps.pHash(img)
    }
    assert(got === PipelineQueries.pinnedPhashes)
    // per-pixel noise spreads across high frequencies: amp=6 moves 6
    // bits of the low-frequency hash; the byte-level re-encode moves 0
    def d(a: String, b: String): Int = {
      val m = got.toMap
      java.lang.Long.bitCount(m(a) ^ m(b))
    }
    assert(d("p1", "p1_noise") === 6)
    assert(d("p2", "p2_noise") === 6)
    assert(d("p3", "p3_dup") === 0)
    assert(d("p1", "p2") === 8) // the closest UNRELATED pair
    assert(d("p1", "p1_noise9") === 10) // heavier noise past the bound
    // the banded join returns exactly the ground-truth <=6 pairs
    val pairs = PipelineQueries.q158PhashPairs(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === Seq(
      ("p1", "p1_noise", 6L), ("p2", "p2_noise", 6L),
      ("p3", "p3_dup", 0L)))
    // the two kernels are INDEPENDENT evidence: the same noise copy
    // that moves pHash 6 bits moves dHash 0 (8x9 averages absorb it)
    val fx = PipelineQueries.phashFixtureBytes.toMap
    def dhOf(k: String) = MultimodalOps.dHash(
      BinaryFunctions.decode(fx(k)).get)
    assert(dhOf("p1") === dhOf("p1_noise"))
  }

  test("q166 two-kernel agreement: engine pHashes of the q104 " +
    "fixtures equal the pinned literals; only the re-encode dup " +
    "survives both kernels") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.dhashFixtureBytes.map { case (k, b) =>
      k -> MultimodalOps.pHash(
        BinaryFunctions.decode(b).getOrElse(fail(s"$k undecodable")))
    }
    assert(got === PipelineQueries.pinnedImagePhashes)
    val agreed = PipelineQueries.q166KernelAgreement(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // the whitened-cell variants pass dHash (d=1/2) but are HEAVY
    // frequency-domain edits — only the true re-encode dup agrees
    assert(agreed.toSeq === Seq(("m01", "m01_dup")))
  }

  test("q165 pinned video pHashes: engine equals the oracle's " +
    "literals; the shifted copy meets at d=0 under the frequency " +
    "kernel too, vidC decoys filtered") {
    import graft.queries.PipelineQueries
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val got = MultimodalOps.videoFramePHashes(
      PipelineQueries.videoFixtureBytes.toDF("key", "bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === PipelineQueries.pinnedVideoPhashes)
    val pairs = PipelineQueries.q165VideoPhashDedup(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === (0 until 5).map(f =>
      (s"vidA#${f + 1}", s"vidB#$f", 0L)))
  }

  test("q106 pinned videos: per-frame engine dHash equals the oracle's " +
    "literals; banded pairs find exactly the shifted-copy frames") {
    import graft.queries.PipelineQueries
    // engine hash == VALUES literal for every sampled frame (container
    // walk + DIB decode + PNG round-trip + dHash, all pure JVM)
    val got = PipelineQueries.q106VideoFrameDedup(spark, "unused")
    // the fixture's one-frame-shifted copy: vidB frame f IS vidA frame
    // f+1, so exactly five d=0 pairs; vidC's d=4-8 frames band-collide
    // with vidA/vidB but must die at the exact-distance filter
    assert(got.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq === Seq(
      ("vidA#1", "vidB#0", 0L), ("vidA#2", "vidB#1", 0L),
      ("vidA#3", "vidB#2", 0L), ("vidA#4", "vidB#3", 0L),
      ("vidA#5", "vidB#4", 0L)))
    val hashes = MultimodalOps.videoFrameDHashes(
      media(PipelineQueries.videoFixtureBytes.map {
        case (k, b) => k -> b }: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(hashes.toSeq === PipelineQueries.pinnedVideoDhashes)
    // undecodable videos yield NO frame hashes: stub frames derive from
    // the key, so hashing them would fabricate duplicates between
    // unrelated undecodable videos — errors stay absent, never content
    assert(MultimodalOps.videoFrameDHashes(
      media("h264ish" -> "not a decodable container".getBytes)).count()
      === 0)
    // ...while the default sampleFrames path still stubs for plumbing
    assert(MultimodalOps.sampleFrames(
      media("h264ish" -> "not a decodable container".getBytes),
      everyNth = 1, maxFrames = 2).count() === 2)
  }

  test("q107 pinned audio: engine fingerprint equals the oracle's " +
    "literals; gain invariance is exact; pairs find the designed set") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.audioFixtureBytes.map { case (k, b) =>
      k -> MultimodalOps.audioDHash(b).getOrElse(fail(s"$k no fingerprint"))
    }
    assert(got === PipelineQueries.pinnedAudioDhashes)
    // the half-volume copy hashes IDENTICALLY — gain invariance is an
    // equality, not a tolerance
    val byKey = got.toMap
    assert(byKey("a1_gain") === byKey("a1"))
    val pairs = PipelineQueries.q107AudioDedup(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === Seq(("a1", "a1_gain", 0L),
      ("a2", "a2_near", 2L), ("a3", "a3_near", 1L)))
    // non-WAV bytes fingerprint to null through the frame, not a throw
    import spark.implicits._
    val withBad = MultimodalOps.audioDHashes(
      Seq(("ok", PipelineQueries.audioFixtureBytes.head._2),
        ("bad", "not audio".getBytes)).toDF("key", "bytes"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(withBad("bad") === null)
    assert(withBad("ok") === byKey("a1"))
    // same scale posture as the image pairs: banded equi-join, never a
    // cross join
    val plan = PipelineQueries.q107AudioDedup(spark, "unused")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"audio pairs must not cross-join:\n$plan")
  }

  test("q168/q169 spectral audio kernel: engine hashes equal the " +
    "oracle literals; the independence matrix holds both ways; dual " +
    "hashing is one parse; agreement keeps exactly the designed set") {
    import graft.queries.PipelineQueries
    val bytes = PipelineQueries.toneFixtureBytes.toMap
    val gotEnv = PipelineQueries.toneFixtures.map { case (k, _, _, _, _) =>
      k -> MultimodalOps.audioDHash(bytes(k)).getOrElse(
        fail(s"$k no envelope fingerprint"))
    }
    val gotSpec = PipelineQueries.toneFixtures.map { case (k, _, _, _, _) =>
      k -> MultimodalOps.audioSpectralHash(bytes(k)).getOrElse(
        fail(s"$k no spectral fingerprint"))
    }
    assert(gotEnv === PipelineQueries.pinnedToneAhashes)
    assert(gotSpec === PipelineQueries.pinnedToneShashes)
    val env = gotEnv.toMap
    val spec = gotSpec.toMap
    def d(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // gain invariance is an exact equality under BOTH kernels
    assert(env("t1_gain") === env("t1"))
    assert(spec("t1_gain") === spec("t1"))
    // INDEPENDENCE, both directions: the envelope edit moves only the
    // envelope kernel; the band swap moves only the spectral kernel
    assert(d(env("t2"), env("t2_env")) === 7)
    assert(d(spec("t2"), spec("t2_env")) === 0)
    assert(d(env("t3"), env("t3_swap")) === 0)
    assert(d(spec("t3"), spec("t3_swap")) === 5)
    // dual hashing agrees with the single-kernel paths (one parse,
    // same values — the imageDualHashes contract)
    import spark.implicits._
    val dual = MultimodalOps.audioDualHashes(
      PipelineQueries.toneFixtureBytes.toDF("key", "bytes"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    PipelineQueries.toneFixtures.foreach { case (k, _, _, _, _) =>
      assert(dual(k) === ((env(k), spec(k))), k)
    }
    // a short clip can carry the envelope hash and not the spectral
    // one (65 vs 256 units) — nulls land independently
    val shortWav = MultimodalOps.syntheticToneWav(1L, seconds = 0.02)
    assert(MultimodalOps.audioDHash(shortWav).isDefined)
    assert(MultimodalOps.audioSpectralHash(shortWav).isEmpty)
    val dualShort = MultimodalOps.audioDualHashes(
      Seq(("s", shortWav)).toDF("key", "bytes")).collect().head
    assert(!dualShort.isNullAt(1) && dualShort.isNullAt(2))
    // the agreement policy: envelope-only and spectral-only matches
    // both drop; the gain copy and light edits survive
    val agree = PipelineQueries.q169AudioKernelAgreement(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(agree.toSeq === Seq(("t1", "t1_gain"), ("t3", "t3_swap1"),
      ("t3_swap", "t3_swap1"), ("t4", "t4_both")))
    // same scale posture: banded equi-joins only, never a cross join
    val plan = PipelineQueries.q169AudioKernelAgreement(spark, "unused")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"agreement must not cross-join:\n$plan")
  }

  test("q172/q173 retention: NN-upscale is dHash-invariant so the " +
    "hires copy joins its cluster and wins on resolution; the audio " +
    "leg keeps the uncut recording") {
    import graft.queries.PipelineQueries
    val m01 = PipelineQueries.dhashFixtureBytes.find(_._1 == "m01").get._2
    val hires = MultimodalOps.upscaleNn(m01, 2).get
    // box-pool invariance: the 2x NN upscale lands on m01's EXACT hash
    assert(MultimodalOps.dHash(
      graft.functions.BinaryFunctions.decode(hires).get) ===
      PipelineQueries.pinnedDhashes.find(_._1 == "m01").get._2)
    val img = PipelineQueries.q172ImageRetention(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // m01's cluster keeps the 4x-pixel copy and drops BOTH others;
    // resolution-tied clusters keep their min key
    assert(img.toSeq === Seq(
      ("m01", "m01_hires", 13824L, 2L),
      ("m02", "m02", 3456L, 1L),
      ("m07", "m07", 3456L, 1L),
      ("m09", "m09", 3456L, 1L)))
    val aud = PipelineQueries.q173AudioRetention(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // duration decides: the uncut s1 (16000 samples) beats its
    // trimmed repost (12000)
    assert(aud.toSeq === Seq(("s1", "s1", 16000L, 1L)))
    // the VIDEO leg completes the four-modality family: the cut's
    // surviving frames are pixel-identical (hash-equal) to vidA's,
    // the verdict clusters them, frames x pixels keeps the longer
    val vid = PipelineQueries.q181VideoRetention(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(vid.toSeq === Seq(("vidA", "vidA", 20736L, 1L)))
    import spark.implicits._
    val stats = MultimodalOps.videoStats(
      PipelineQueries.videoRetentionBytes.toDF("key", "bytes"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(stats("vidA") === ((6L, 3456L)))
    assert(stats("vidA_cut") === ((5L, 3456L)))
    // unparseable bytes carry null stats, not a throw
    val badStats = MultimodalOps.videoStats(
      Seq(("bad", "not a container".getBytes)).toDF("key", "bytes"))
      .collect().head
    assert(badStats.isNullAt(1) && badStats.isNullAt(2))
  }

  test("q109 in-container soundtrack: extraction equals the standalone " +
    "WAV fingerprint; video frames still decode; pairs find the " +
    "re-posted copy") {
    import graft.queries.PipelineQueries
    // the container-extracted fingerprint EQUALS the standalone WAV's
    // for the same (seed, cells) — one fingerprint core, provably
    val avi = MultimodalOps.syntheticAviWithAudio(11L, 1L, 72, 48, 6)
    val wav = MultimodalOps.syntheticAmWav(1L)
    assert(MultimodalOps.videoAudioDHash(avi) ===
      MultimodalOps.audioDHash(wav))
    // engine hashes equal the oracle's literals for every fixture
    val got = PipelineQueries.avFixtureBytes.map { case (k, b) =>
      k -> MultimodalOps.videoAudioDHash(b).getOrElse(
        fail(s"$k: no soundtrack fingerprint"))
    }
    assert(got === PipelineQueries.pinnedAvAudioDhashes)
    // the two-stream layout still serves the VIDEO path: frame 0 of
    // the same file decodes through parseAviFrames (audio chunks are
    // walked over, not tripped over)
    assert(MultimodalOps.parseAviFrames(avi, 1, 6).map(_.length) ===
      Some(6))
    // soundtrack-less and non-AVI bytes: None, never a throw
    assert(MultimodalOps.videoAudioDHash(
      MultimodalOps.syntheticAvi(11L, 24, 16, 2)) === None)
    assert(MultimodalOps.videoAudioDHash("nope".getBytes) === None)
    // pairing: the re-posted copy at d=0, the envelope edit at d=2,
    // nothing else
    val pairs = PipelineQueries.q109AvSoundtrackDedup(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === Seq(("av1", "av1_re", 0L),
      ("av2", "av2_near", 2L)))
  }

  test("MJPEG video + PCM audio in ONE two-stream container: soundtrack " +
    "extraction equals the standalone WAV hash AND the compressed " +
    "frames still decode — codec independence proven in combination") {
    val avi = MultimodalOps.syntheticAviWithAudio(11L, 1L, 72, 48, 6,
      mjpeg = true)
    val wav = MultimodalOps.syntheticAmWav(1L)
    // the audio chunks are byte-identical to the WAV data section, so
    // extraction through the MJPEG container is an EQUALITY
    assert(MultimodalOps.videoAudioDHash(avi) ===
      MultimodalOps.audioDHash(wav))
    // the video stream is genuinely compressed (JPEG payloads), and
    // all 6 frames route through the JPEG decoder with audio chunks
    // interleaved between them
    val frames = MultimodalOps.parseAviFrames(avi, 1, 6)
      .getOrElse(fail("no frames decoded"))
    assert(frames.length === 6)
    // MJPEG is lossy and the synthetic pattern is per-pixel noise (the
    // worst case for JPEG), so the decoded content check is RELATIVE:
    // each MJPEG frame must be closer to ITS DIB twin than to the next
    // frame — the decoder is reading the right chunks in the right
    // order, not just producing plausible images
    val dib = MultimodalOps.syntheticAviWithAudio(11L, 1L, 72, 48, 6)
    val dibFrames = MultimodalOps.parseAviFrames(dib, 1, 6).get
    def mae(a: Array[Byte], b: Array[Byte]): Double = {
      val (ia, ib) = (BinaryFunctions.decode(a).get,
        BinaryFunctions.decode(b).get)
      var sum = 0L
      for (y <- 0 until ia.getHeight; x <- 0 until ia.getWidth) {
        val (p, q) = (ia.getRGB(x, y), ib.getRGB(x, y))
        sum += math.abs(((p >> 16) & 0xff) - ((q >> 16) & 0xff)) +
          math.abs(((p >> 8) & 0xff) - ((q >> 8) & 0xff)) +
          math.abs((p & 0xff) - (q & 0xff))
      }
      sum.toDouble / (ia.getWidth * ia.getHeight * 3)
    }
    (0 until 5).foreach { f =>
      val same = mae(frames(f)._2, dibFrames(f)._2)
      val cross = mae(frames(f)._2, dibFrames(f + 1)._2)
      assert(same < cross,
        s"frame $f: same-twin MAE $same !< cross-frame MAE $cross")
    }
    // the container stays well-formed for the feature path too
    assert(MultimodalOps.imageDHashes(
      media("f0" -> frames.head._2)).collect().head.get(1) !== null)
  }

  test("q113 video repost verdict: frame pairs aggregate to exactly " +
    "(vidA, vidB, 5 frames, 1 offset, shift +1)") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.q113VideoRepost(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("vidA", "vidB", 5L, 1L, 1L)))
    // the verdict is order-insensitive: feeding the pairs SWAPPED
    // (b, a, d) canonicalizes to the same answer — the composite-key
    // parse does not depend on which side sorted first
    val pairs = MultimodalOps.dhashNearDupPairs(
      MultimodalOps.videoFrameDHashes(media(
        PipelineQueries.videoFixtureBytes.map { case (k, b) => k -> b }: _*)),
      3)
    val swapped = pairs.select(col("b").as("a"), col("a").as("b"), col("d"))
    val got2 = MultimodalOps.repostVerdicts(swapped, minMatches = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got2.toSeq === Seq(("vidA", "vidB", 5L, 1L, 1L)))
    // minMatches cuts coincidental single-unit collisions
    assert(MultimodalOps.repostVerdicts(pairs, minMatches = 6).count() === 0)
    // q119: the verdict edges cluster whole VIDEOS — {vidA, vidB}
    // under canonical vidA, vidC its own singleton
    val clusters = graft.queries.PipelineQueries
      .q119VideoDupClusters(spark, "unused")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(clusters === Map("vidA" -> ("vidA", 2L),
      "vidB" -> ("vidA", 2L), "vidC" -> ("vidC", 1L)))
  }

  test("q114/q115 pinned segments: engine fingerprints equal the " +
    "oracle's literals; a trimmed copy meets its original at d=0 on " +
    "shifted segments; the verdict names the recording pair") {
    import graft.queries.PipelineQueries
    // engine hash == VALUES literal for every (key#segment)
    val got = PipelineQueries.segAudioFixtureBytes.flatMap { case (k, b) =>
      MultimodalOps.audioSegmentDHash(b).getOrElse(
        fail(s"$k: no segments")).map { case (i, h) => (s"$k#$i", h) }
    }
    assert(got === PipelineQueries.pinnedSegmentAhashes)
    // trim semantics: byte-identical PCM after the cut, so the
    // surviving segments hash EQUAL (not near) under shifted indices
    val byKey = got.toMap
    (0 until 3).foreach(i =>
      assert(byKey(s"s1_trim#$i") === byKey(s"s1#${i + 1}")))
    val pairs = PipelineQueries.q114AudioTrimDedup(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === Seq(("s1#1", "s1_trim#0", 0L),
      ("s1#2", "s1_trim#1", 0L), ("s1#3", "s1_trim#2", 0L)))
    val verdict = PipelineQueries.q115AudioTrimVerdict(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(verdict.toSeq === Seq(("s1", "s1_trim", 3L, 1L, 1L)))
  }

  test("trimWav: header rebuilt over the surviving samples; whole-file " +
    "cut and non-WAV bytes are None, never a throw") {
    val wav = MultimodalOps.syntheticAmWav(31L, Nil, 1.0, seconds = 2.0)
    val trimmed = MultimodalOps.trimWav(wav, 0.5).getOrElse(fail("no trim"))
    // the trimmed bytes are a VALID Wav: features parse, 1.5 s remain
    val feats = MultimodalOps.audioFeatures(media("t" -> trimmed))
      .collect().head
    assert(feats.getInt(1) === 8000) // rate survives
    assert(feats.getLong(4) === 12000L) // 1.5 s * 8000
    assert(MultimodalOps.trimWav(wav, 2.5) === None) // nothing survives
    assert(MultimodalOps.trimWav(wav, 0.0) === None) // no-op cut
    assert(MultimodalOps.trimWav("nope".getBytes, 0.5) === None)
    // a truncated fmt chunk at the buffer edge: None, never a throw
    // (the errors-are-data catch the fingerprint paths already carry)
    assert(MultimodalOps.trimWav(
      java.util.Arrays.copyOfRange(wav, 0, 30), 0.1) === None)
    // segment hashing drops the short tail instead of hashing a
    // different-support window: a 1.3 s file at 0.5 s segments → 2
    assert(MultimodalOps.audioSegmentDHash(
      MultimodalOps.syntheticAmWav(7L, Nil, 1.0, seconds = 1.3))
      .map(_.length) === Some(2))
  }

  test("q116/q117: audio kNN ranks the query's own recording first; " +
    "clusters recover the designed components") {
    import graft.queries.PipelineQueries
    val knn = PipelineQueries.q116AudioKnn(spark, "unused")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(knn.take(2).toSeq === Seq(("a2_near", 0L), ("a2", 2L)))
    assert(knn.length === 5)
    val clusters = PipelineQueries.q117AudioDupClusters(spark, "unused")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(clusters("a1") === ("a1", 2L))
    assert(clusters("a1_gain") === ("a1", 2L))
    assert(clusters("a2_near") === ("a2", 2L))
    assert(clusters("a3_near") === ("a3", 2L))
    // the far decoy stays OUT of a2's cluster — banding candidates
    // beyond the bound must not merge components
    assert(clusters("a4_far") === ("a4_far", 1L))
    assert(clusters("a5") === ("a5", 1L))
  }

  test("mutation fuzz: corrupted WAVs and AVIs parse to None or data, " +
    "never an exception or a hang (the animation-decoder harness " +
    "extended to the audio/video kernels)") {
    val wav = MultimodalOps.syntheticAmWav(3, seconds = 0.25)
    val avi = MultimodalOps.syntheticAvi(5, 24, 16, 3)
    val rnd = new scala.util.Random(0xA0D10)
    import scala.concurrent.ExecutionContext.Implicits.global
    def bounded[T](f: => T): T = scala.concurrent.Await.result(
      scala.concurrent.Future(f),
      scala.concurrent.duration.Duration(5, "s"))
    for (_ <- 1 to 150) {
      val m = wav.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      bounded(MultimodalOps.audioDHash(m)) // Option either way, no throw
    }
    for (_ <- 1 to 150) {
      val m = avi.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      bounded(MultimodalOps.parseAviFrames(m, 1, 4))
    }
    val avAvi = MultimodalOps.syntheticAviWithAudio(5, 3, 24, 16, 3)
    for (_ <- 1 to 150) {
      val m = avAvi.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      bounded(MultimodalOps.videoAudioDHash(m))
    }
  }

  test("malicious RIFF chunk lengths terminate, not hang") {
    // 0xFFFFFFFF chunk length wraps negative on toInt — the walk must
    // clamp and exit, not loop forever
    def evil(kind: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes); bos.write(Array[Byte](-1, -1, -1, -1))
      bos.write(kind.getBytes)
      bos.write("JUNK".getBytes); bos.write(Array[Byte](-1, -1, -1, -1))
      bos.write(new Array[Byte](32))
      bos.toByteArray
    }
    assert(MultimodalOps.parseAviFrames(evil("AVI "), 1, 3) === None)
    assert(MultimodalOps.audioFeatures(media("x" -> evil("WAVE")))
      .collect().head.isNullAt(1))
  }

  test("audioFeatures parses real PCM WAV; rejects non-audio") {
    val wav = MultimodalOps.syntheticWav(freqHz = 440, seconds = 0.25)
    val df = MultimodalOps.audioFeatures(media(
      "a" -> wav, "b" -> "mp3-ish garbage".getBytes))
    val byKey = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byKey("a").getInt(1) === 8000)   // sample rate
    assert(byKey("a").getInt(2) === 1)      // mono
    assert(byKey("a").getLong(4) === 2000L) // 0.25s × 8000
    // full-scale/√2 sine at half amplitude → RMS ≈ 0.5/√2 ≈ 0.3536
    assert(math.abs(byKey("a").getDouble(5) - 0.3536) < 0.01)
    assert(byKey("b").isNullAt(1))
  }

  test("fakeEmbedding composes with the similarity kernel") {
    import graft.functions.VectorFunctions
    val df = MultimodalOps.fakeEmbedding(media(
      "a" -> "xx".getBytes, "b" -> "xx".getBytes, "c" -> "yy".getBytes))
    val sims = df.as("x").crossJoin(df.as("y"))
      .select(col("x.key").as("a"), col("y.key").as("b"),
        VectorFunctions.dot(
          VectorFunctions.normalized(col("x.emb")),
          VectorFunctions.normalized(col("y.emb"))).as("sim"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(sims(("a", "b")) - 1.0) < 1e-9) // same bytes → same emb
    assert(sims(("a", "c")) < 1.0)
  }
}
