package graft.functions

import java.awt.image.BufferedImage

/** Pure-JVM lossy WebP ("VP8 ") still decoder — intra/key frames, which
  * is every lossy webp still image (RFC 6386; reference consumes webp
  * via golang.org/x/image/webp, x/imgresizer/resizer.go:244-247).
  *
  * Implements the full keyframe path of the spec: boolean arithmetic
  * decoder (§7), frame/segmentation/filter/quantizer headers (§9),
  * keyframe intra-mode parsing incl. per-subblock B_PRED contexts
  * (§11.5), token-tree residue decoding with coefficient-probability
  * updates (§13), dequantization (§14.1), inverse WHT/DCT (§14.2-14.3),
  * all 16x16/chroma/4x4 intra predictors (§12), and both the normal and
  * simple in-loop deblocking filters (§15) — so output is bit-exact
  * with libwebp at the YUV level (Vp8Spec pins decoded planes against
  * libwebp-produced fixtures). Intra prediction reads UNFILTERED
  * reconstructed neighbors; the loop filter runs as a whole-frame pass
  * afterwards, matching the spec's data flow for a single still.
  *
  * The RGB surface uses BT.601 conversion with 2x2 chroma replication
  * (libwebp's default RGB path adds a "fancy" chroma upsampler — a
  * rendering choice outside the VP8 bitstream; the codec itself is
  * pixel-exact, verified on the YUV planes).
  *
  * Probability/quantizer constants live in [[Vp8Tables]] (generated,
  * see tools/gen_vp8_tables.py). Malformed input returns None, never
  * throws — the reference's log-and-continue posture.
  */
object Vp8 {

  // ---- boolean arithmetic decoder (RFC 6386 §7.3, reference code) ----

  private[functions] final class BoolDec(
      buf: Array[Byte], start: Int, end: Int) {
    private var pos = start + 2
    private var range = 255
    private var value =
      ((byteAt(start) << 8) | byteAt(start + 1)) & 0xffff
    private var bitCount = 0

    private def byteAt(i: Int): Int =
      if (i < end) buf(i) & 0xff else 0

    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1; bitCount += 1
        if (bitCount == 8) {
          bitCount = 0; value |= byteAt(pos); pos += 1
        }
      }
      ret
    }

    def flag(): Int = bit(128)

    /** n-bit unsigned literal, MSB first. */
    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }

    /** magnitude-then-sign value, used by the header deltas. */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bit(128) == 1) -v else v
    }

    /** optional update: flag, then signed literal (else 0). */
    def maySigned(n: Int): Int = if (flag() == 1) signedLiteral(n) else 0

    def tree(t: Array[Int], probs: Array[Int], probOff: Int): Int = {
      var i = t(bit(probs(probOff)))
      while (i > 0) i = t(i + bit(probs(probOff + (i >> 1))))
      -i
    }

    /** token tree walk from an arbitrary start index (coefficient
      * decoding re-enters at index 2 after a zero — §13.3). */
    def treeFrom(t: Array[Int], probs: Array[Int], probOff: Int,
        startIdx: Int): Int = {
      var i = t(startIdx + bit(probs(probOff + (startIdx >> 1))))
      while (i > 0) i = t(i + bit(probs(probOff + (i >> 1))))
      -i
    }
  }

  // ---- mode trees (RFC 6386 §8.2, §11.3, §11.5) ----------------------

  // luma 16x16: 0=DC 1=V 2=H 3=TM 4=B_PRED
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProbs = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProbs = Array(142, 114, 183)
  // 4x4 modes: 0=B_DC 1=B_TM 2=B_VE 3=B_HE 4=B_LD 5=B_RD 6=B_VR 7=B_VL
  // 8=B_HD 9=B_HU
  private val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  private val SegmentTree = Array(2, 4, -0, -1, -2, -3)

  // token tree (§13.2): 0=EOB 1=zero 2=one 3=two 4=three 5=four
  // 6..11 = cat1..cat6
  private val TokenTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, 14, 16, -6, -7, 18, 20,
    -8, -9, -10, -11)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBases = Array(5, 7, 11, 19, 35, 67)

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clipQ(v: Int, hi: Int): Int =
    if (v < 0) 0 else if (v > hi) hi else v

  // ---- decoded-frame state -------------------------------------------

  private final class Frame(val w: Int, val h: Int) {
    val mbW: Int = (w + 15) >> 4
    val mbH: Int = (h + 15) >> 4
    val yStride: Int = mbW * 16
    val uvStride: Int = mbW * 8
    val y = new Array[Int](yStride * mbH * 16)
    val u = new Array[Int](uvStride * mbH * 8)
    val v = new Array[Int](uvStride * mbH * 8)
  }

  private final class MbInfo {
    var yMode = 0 // 0..3 whole-block, 4 = B_PRED
    var uvMode = 0
    var segment = 0
    var skip = false
    var hasCoeffs = false
    val bModes = new Array[Int](16)
    val coeffs = new Array[Int](25 * 16) // 16 Y, 2x4 chroma, 1 Y2
    val nz = new Array[Boolean](25) // per-block has-nonzero flags
  }

  /** Decode a VP8 keyframe payload (the bytes of a "VP8 " chunk).
    * Returns (Y, U, V, width, height, yStride, uvStride) planes,
    * loop-filtered, uncropped. */
  private[functions] def decodePlanes(b: Array[Byte], off: Int, len: Int)
      : Option[(Array[Int], Array[Int], Array[Int], Int, Int, Int, Int)] =
    try {
      val end = off + len
      if (len < 10) return None
      val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16)
      val keyFrame = (tag & 1) == 0
      val part0Len = tag >> 5
      if (!keyFrame) return None // stills are single keyframes
      if (!((b(off + 3) & 0xff) == 0x9d && (b(off + 4) & 0xff) == 0x01 &&
            (b(off + 5) & 0xff) == 0x2a)) return None
      val w = ((b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)) & 0x3fff
      val h = ((b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)) & 0x3fff
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
      // Allocation guard for hostile headers: planes cost ~6 bytes per
      // pixel (Int Y + half-res U/V), so a ~30-byte payload declaring
      // 4096x4096 would allocate ~96 MB before any bitstream check.
      // Even the most degenerate REAL encodes (solid color, quality 10)
      // measure ~0.54 bytes per macroblock; require 1/8 byte per MB —
      // 4x margin under that floor — which bounds allocation to ~12 KB
      // per payload byte and rejects tiny payloads with huge dims.
      val numMbs = ((w + 15) / 16).toLong * ((h + 15) / 16)
      if (len < numMbs / 8) return None
      val part0Start = off + 10
      if (part0Start + part0Len > end) return None
      val bd = new BoolDec(b, part0Start, part0Start + part0Len)

      bd.flag() // color space
      bd.flag() // clamping
      // --- segmentation (§9.3)
      var segEnabled = false
      var segUpdateMap = false
      var segAbsDelta = false
      val segQuant = new Array[Int](4)
      val segFilter = new Array[Int](4)
      val segTreeProbs = Array(255, 255, 255)
      if (bd.flag() == 1) {
        segEnabled = true
        segUpdateMap = bd.flag() == 1
        val updateData = bd.flag() == 1
        if (updateData) {
          segAbsDelta = bd.flag() == 1
          var i = 0
          while (i < 4) { segQuant(i) = bd.maySigned(7); i += 1 }
          i = 0
          while (i < 4) { segFilter(i) = bd.maySigned(6); i += 1 }
        }
        if (segUpdateMap) {
          var i = 0
          while (i < 3) {
            segTreeProbs(i) = if (bd.flag() == 1) bd.literal(8) else 255
            i += 1
          }
        }
      }
      // --- loop filter header (§9.4)
      val simpleFilter = bd.flag() == 1
      val filterLevel = bd.literal(6)
      val sharpness = bd.literal(3)
      val refLfDelta = new Array[Int](4)
      val modeLfDelta = new Array[Int](4)
      var lfDeltaEnabled = false
      if (bd.flag() == 1) {
        lfDeltaEnabled = true
        if (bd.flag() == 1) {
          var i = 0
          while (i < 4) {
            if (bd.flag() == 1) refLfDelta(i) = bd.signedLiteral(6)
            i += 1
          }
          i = 0
          while (i < 4) {
            if (bd.flag() == 1) modeLfDelta(i) = bd.signedLiteral(6)
            i += 1
          }
        }
      }
      // --- token partitions (§9.5)
      val nParts = 1 << bd.literal(2)
      val partsTableAt = part0Start + part0Len
      if (partsTableAt + (nParts - 1) * 3 > end) return None
      val partStarts = new Array[Int](nParts)
      val partEnds = new Array[Int](nParts)
      var dataAt = partsTableAt + (nParts - 1) * 3
      var pi = 0
      while (pi < nParts) {
        val sz =
          if (pi < nParts - 1) {
            val o = partsTableAt + pi * 3
            (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
              ((b(o + 2) & 0xff) << 16)
          } else end - dataAt
        partStarts(pi) = dataAt
        partEnds(pi) = dataAt + sz
        if (partEnds(pi) > end || sz < 0) return None
        dataAt += sz
        pi += 1
      }
      val partitions = partStarts.indices.map(i =>
        new BoolDec(b, partStarts(i), partEnds(i))).toArray

      // --- quantizers (§9.6, dequant factors per §14.1 / libwebp)
      val yacQi = bd.literal(7)
      val ydcDelta = bd.maySigned(4)
      val y2dcDelta = bd.maySigned(4)
      val y2acDelta = bd.maySigned(4)
      val uvdcDelta = bd.maySigned(4)
      val uvacDelta = bd.maySigned(4)
      import Vp8Tables.{acQ, dcQ}
      // per-segment quantizer matrices
      val nSeg = if (segEnabled) 4 else 1
      val qY1 = Array.ofDim[Int](nSeg, 2)
      val qY2 = Array.ofDim[Int](nSeg, 2)
      val qUv = Array.ofDim[Int](nSeg, 2)
      var si = 0
      while (si < nSeg) {
        val base =
          if (!segEnabled) yacQi
          else if (segAbsDelta) segQuant(si)
          else yacQi + segQuant(si)
        val q = clipQ(base, 127)
        qY1(si)(0) = dcQ(clipQ(q + ydcDelta, 127))
        qY1(si)(1) = acQ(q)
        qY2(si)(0) = dcQ(clipQ(q + y2dcDelta, 127)) * 2
        qY2(si)(1) = { val a = acQ(clipQ(q + y2acDelta, 127)) * 155 / 100
          if (a < 8) 8 else a }
        qUv(si)(0) = dcQ(clipQ(q + uvdcDelta, 117))
        qUv(si)(1) = acQ(clipQ(q + uvacDelta, 127))
        si += 1
      }

      bd.flag() // refresh entropy probs (keyframe: parse and ignore)
      // --- coefficient probability updates (§13.4)
      val coeffProbs = Vp8Tables.defaultCoeffProbs.clone()
      var i = 0
      while (i < 4 * 8 * 3 * 11) {
        if (bd.bit(Vp8Tables.coeffUpdateProbs(i)) == 1)
          coeffProbs(i) = bd.literal(8)
        i += 1
      }
      val skipEnabled = bd.flag() == 1
      val skipProb = if (skipEnabled) bd.literal(8) else 0

      // --- per-MB mode parsing (rest of partition 0) + residue decode
      val frame = new Frame(w, h)
      val mbW = frame.mbW; val mbH = frame.mbH
      // B_PRED mode contexts: above[4] per MB column, left[4]
      val aboveBMode = Array.fill(mbW * 4)(0) // B_DC borders (§11.5)
      // nonzero contexts per 4x4 position
      val aboveNzY = new Array[Int](mbW * 4)
      val aboveNzU = new Array[Int](mbW * 2)
      val aboveNzV = new Array[Int](mbW * 2)
      val aboveNzY2 = new Array[Int](mbW)
      val levels = new Array[Int](mbW * mbH) // loop filter level per MB
      val innerFlags = new Array[Boolean](mbW * mbH)

      var mbY = 0
      while (mbY < mbH) {
        val td = partitions(mbY % nParts)
        val leftBMode = Array.fill(4)(0)
        val leftNzY = new Array[Int](4)
        val leftNzU = new Array[Int](2)
        val leftNzV = new Array[Int](2)
        var leftNzY2 = 0
        var mbX = 0
        while (mbX < mbW) {
          val mb = new MbInfo
          mb.segment =
            if (segUpdateMap)
              bd.tree(SegmentTree, segTreeProbs, 0)
            else 0
          if (!segEnabled) mb.segment = 0
          mb.skip = skipEnabled && bd.bit(skipProb) == 1
          // keyframe Y mode (§11.5)
          mb.yMode = bd.tree(KfYModeTree, KfYModeProbs, 0)
          if (mb.yMode == 4) { // B_PRED: 16 sub-modes with contexts
            var sb = 0
            while (sb < 16) {
              val sx = sb & 3; val sy = sb >> 2
              val above =
                if (sy == 0) aboveBMode(mbX * 4 + sx) else mb.bModes(sb - 4)
              val left =
                if (sx == 0) leftBMode(sy) else mb.bModes(sb - 1)
              val probOff = (above * 10 + left) * 9
              mb.bModes(sb) =
                bd.tree(BModeTree, Vp8Tables.kfBModeProbs, probOff)
              sb += 1
            }
          } else {
            // whole-block modes imply a uniform B mode for context
            // purposes (§11.3: DC->B_DC, V->B_VE, H->B_HE, TM->B_TM)
            val implied = mb.yMode match {
              case 0 => 0; case 1 => 2; case 2 => 3; case _ => 1
            }
            java.util.Arrays.fill(mb.bModes, implied)
          }
          var k = 0
          while (k < 4) {
            aboveBMode(mbX * 4 + k) = mb.bModes(12 + k)
            leftBMode(k) = mb.bModes(k * 4 + 3)
            k += 1
          }
          mb.uvMode = bd.tree(UvModeTree, KfUvModeProbs, 0)

          // ---- residuals (§13) from this row's token partition
          val hasY2 = mb.yMode != 4
          if (mb.skip) {
            java.util.Arrays.fill(leftNzY, 0)
            java.util.Arrays.fill(leftNzU, 0)
            java.util.Arrays.fill(leftNzV, 0)
            var t = 0
            while (t < 4) { aboveNzY(mbX * 4 + t) = 0; t += 1 }
            t = 0
            while (t < 2) {
              aboveNzU(mbX * 2 + t) = 0; aboveNzV(mbX * 2 + t) = 0; t += 1
            }
            if (hasY2) { leftNzY2 = 0; aboveNzY2(mbX) = 0 }
            mb.hasCoeffs = false
          } else {
            var anyCoeffs = false
            val qy1 = qY1(if (segEnabled) mb.segment else 0)
            val qy2 = qY2(if (segEnabled) mb.segment else 0)
            val quv = qUv(if (segEnabled) mb.segment else 0)
            // Y2 first (block type 1)
            if (hasY2) {
              val ctx = aboveNzY2(mbX) + leftNzY2
              val nz = decodeCoeffs(td, coeffProbs, 1, ctx, 0,
                qy2, mb.coeffs, 24 * 16)
              aboveNzY2(mbX) = if (nz) 1 else 0
              leftNzY2 = aboveNzY2(mbX)
              if (nz) anyCoeffs = true
            }
            // 16 luma blocks (type 0 with Y2, else 3), raster order
            val yType = if (hasY2) 0 else 3
            val firstCoeff = if (hasY2) 1 else 0
            var sb = 0
            while (sb < 16) {
              val sx = sb & 3; val sy = sb >> 2
              val ctx = (if (sy == 0) aboveNzY(mbX * 4 + sx)
                         else if (nzAt(mb, (sy - 1) * 4 + sx)) 1 else 0) +
                (if (sx == 0) leftNzY(sy)
                 else if (nzAt(mb, sy * 4 + sx - 1)) 1 else 0)
              val nz = decodeCoeffs(td, coeffProbs, yType, ctx, firstCoeff,
                qy1, mb.coeffs, sb * 16)
              setNz(mb, sb, nz)
              if (sy == 0 && sx == 0) () // contexts updated below
              if (nz) anyCoeffs = true
              sb += 1
            }
            var t = 0
            while (t < 4) {
              aboveNzY(mbX * 4 + t) = if (nzAt(mb, 12 + t)) 1 else 0
              leftNzY(t) = if (nzAt(mb, t * 4 + 3)) 1 else 0
              t += 1
            }
            // chroma blocks (type 2): U 16..19, V 20..23
            var plane = 0
            while (plane < 2) {
              val aboveNzC = if (plane == 0) aboveNzU else aboveNzV
              val leftNzC = if (plane == 0) leftNzU else leftNzV
              val blockBase = 16 + plane * 4
              var cb = 0
              while (cb < 4) {
                val cx = cb & 1; val cy = cb >> 1
                val ctx = (if (cy == 0) aboveNzC(mbX * 2 + cx)
                           else if (nzAt(mb, blockBase + cx)) 1 else 0) +
                  (if (cx == 0) leftNzC(cy)
                   else if (nzAt(mb, blockBase + cy * 2)) 1 else 0)
                val nz = decodeCoeffs(td, coeffProbs, 2, ctx, 0,
                  quv, mb.coeffs, (blockBase + cb) * 16)
                setNz(mb, blockBase + cb, nz)
                if (nz) anyCoeffs = true
                cb += 1
              }
              t = 0
              while (t < 2) {
                aboveNzC(mbX * 2 + t) =
                  if (nzAt(mb, blockBase + 2 + t)) 1 else 0
                leftNzC(t) = if (nzAt(mb, blockBase + t * 2 + 1)) 1 else 0
                t += 1
              }
              plane += 1
            }
            mb.hasCoeffs = anyCoeffs
          }

          // ---- reconstruct this MB (prediction + inverse transforms)
          reconstruct(frame, mb, mbX, mbY)

          // loop filter bookkeeping
          var lvl =
            if (!segEnabled) filterLevel
            else if (segAbsDelta) segFilter(mb.segment)
            else filterLevel + segFilter(mb.segment)
          if (lfDeltaEnabled) {
            lvl += refLfDelta(0) // keyframe: always the intra delta
            if (mb.yMode == 4) lvl += modeLfDelta(0)
          }
          levels(mbY * mbW + mbX) = clipQ(lvl, 63)
          innerFlags(mbY * mbW + mbX) = mb.hasCoeffs || mb.yMode == 4
          mbX += 1
        }
        mbY += 1
      }

      // ---- loop filter, whole frame, MB raster order (§15)
      if (filterLevel > 0)
        loopFilter(frame, levels, innerFlags, simpleFilter, sharpness)
      Some((frame.y, frame.u, frame.v, w, h, frame.yStride, frame.uvStride))
    } catch { case _: Exception => None }

  private def nzAt(mb: MbInfo, i: Int): Boolean = mb.nz(i)
  private def setNz(mb: MbInfo, i: Int, v: Boolean): Unit = mb.nz(i) = v

  // ---- coefficient decoding (§13.3) ----------------------------------

  /** Decode one 4x4 block's coefficients into `out` (already zeroed),
    * dequantized, in raster order. Returns whether any coeff != 0. */
  private def decodeCoeffs(bd: BoolDec, probs: Array[Int], blockType: Int,
      initialCtx: Int, firstCoeff: Int, q: Array[Int],
      out: Array[Int], outOff: Int): Boolean = {
    import Vp8Tables.{bands, zigzag}
    java.util.Arrays.fill(out, outOff, outOff + 16, 0)
    var n = firstCoeff
    var ctx = initialCtx
    var nz = false
    var prevZero = false
    var done = false
    while (!done && n < 16) {
      val probOff = ((blockType * 8) + bands(n)) * 3 * 11 + ctx * 11
      val tok =
        if (prevZero) bd.treeFrom(TokenTree, probs, probOff, 2)
        else bd.treeFrom(TokenTree, probs, probOff, 0)
      if (tok == 0) done = true // EOB
      else if (tok == 1) { // zero
        prevZero = true; ctx = 0; n += 1
      } else {
        prevZero = false
        var v = 0
        if (tok <= 5) v = tok - 1
        else {
          val cat = tok - 6
          val cp = CatProbs(cat)
          var extra = 0
          var i = 0
          while (i < cp.length) { extra = (extra << 1) | bd.bit(cp(i)); i += 1 }
          v = CatBases(cat) + extra
        }
        ctx = if (v == 1) 1 else 2
        if (bd.flag() == 1) v = -v
        val pos = zigzag(n)
        out(outOff + pos) = v * (if (n == 0) q(0) else q(1))
        nz = true
        n += 1
      }
    }
    nz
  }

  // ---- inverse transforms (§14.2, §14.3) -----------------------------

  private def iwht(in: Array[Int], inOff: Int, dst: Array[Int],
      dstBase: Int): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(inOff + i) + in(inOff + 12 + i)
      val b1 = in(inOff + 4 + i) + in(inOff + 8 + i)
      val c1 = in(inOff + 4 + i) - in(inOff + 8 + i)
      val d1 = in(inOff + i) - in(inOff + 12 + i)
      tmp(i) = a1 + b1; tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1; tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3); val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2); val d1 = tmp(o) - tmp(o + 3)
      // each output is the DC (coeff 0) of one luma block, raster order
      dst(dstBase + (i * 4) * 16) = (a1 + b1 + 3) >> 3
      dst(dstBase + (i * 4 + 1) * 16) = (c1 + d1 + 3) >> 3
      dst(dstBase + (i * 4 + 2) * 16) = (a1 - b1 + 3) >> 3
      dst(dstBase + (i * 4 + 3) * 16) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** 4x4 inverse DCT, adding to the prediction in `plane`. */
  private def idctAdd(coeffs: Array[Int], off: Int, plane: Array[Int],
      base: Int, stride: Int): Unit = {
    val C1 = 20091; val C2 = 35468
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = coeffs(off + i) + coeffs(off + 8 + i)
      val b1 = coeffs(off + i) - coeffs(off + 8 + i)
      val t1 = (coeffs(off + 4 + i) * C2) >> 16
      val t2 = coeffs(off + 12 + i) + ((coeffs(off + 12 + i) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = coeffs(off + 4 + i) + ((coeffs(off + 4 + i) * C1) >> 16)
      val t4 = (coeffs(off + 12 + i) * C2) >> 16
      val d1 = t3 + t4
      tmp(i) = a1 + d1; tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1; tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      val t1 = (tmp(o + 1) * C2) >> 16
      val t2 = tmp(o + 3) + ((tmp(o + 3) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = tmp(o + 1) + ((tmp(o + 1) * C1) >> 16)
      val t4 = (tmp(o + 3) * C2) >> 16
      val d1 = t3 + t4
      val p = base + i * stride
      plane(p) = clip255(plane(p) + ((a1 + d1 + 4) >> 3))
      plane(p + 3) = clip255(plane(p + 3) + ((a1 - d1 + 4) >> 3))
      plane(p + 1) = clip255(plane(p + 1) + ((b1 + c1 + 4) >> 3))
      plane(p + 2) = clip255(plane(p + 2) + ((b1 - c1 + 4) >> 3))
      i += 1
    }
  }

  // ---- reconstruction ------------------------------------------------

  private def reconstruct(f: Frame, mb: MbInfo, mbX: Int, mbY: Int)
      : Unit = {
    // Y2: inverse WHT scatters DCs into the 16 luma blocks
    if (mb.yMode != 4) iwht(mb.coeffs, 24 * 16, mb.coeffs, 0)

    val yBase = mbY * 16 * f.yStride + mbX * 16
    if (mb.yMode == 4) {
      var sb = 0
      while (sb < 16) {
        val sx = sb & 3; val sy = sb >> 2
        val base = yBase + sy * 4 * f.yStride + sx * 4
        predict4x4(f.y, base, f.yStride, mb.bModes(sb),
          sx, sy, mbX, mbY, f.mbW)
        idctAdd(mb.coeffs, sb * 16, f.y, base, f.yStride)
        sb += 1
      }
    } else {
      predictBlock(f.y, yBase, f.yStride, 16, mb.yMode,
        mbX > 0, mbY > 0)
      var sb = 0
      while (sb < 16) {
        val sx = sb & 3; val sy = sb >> 2
        idctAdd(mb.coeffs, sb * 16, f.y,
          yBase + sy * 4 * f.yStride + sx * 4, f.yStride)
        sb += 1
      }
    }
    // chroma
    val uBase = mbY * 8 * f.uvStride + mbX * 8
    predictBlock(f.u, uBase, f.uvStride, 8, mb.uvMode, mbX > 0, mbY > 0)
    predictBlock(f.v, uBase, f.uvStride, 8, mb.uvMode, mbX > 0, mbY > 0)
    var cb = 0
    while (cb < 4) {
      val cx = cb & 1; val cy = cb >> 1
      val o = uBase + cy * 4 * f.uvStride + cx * 4
      idctAdd(mb.coeffs, (16 + cb) * 16, f.u, o, f.uvStride)
      idctAdd(mb.coeffs, (20 + cb) * 16, f.v, o, f.uvStride)
      cb += 1
    }
  }

  /** Whole-block prediction (16x16 luma or 8x8 chroma): DC/V/H/TM with
    * the §12.2 edge rules — the off-frame above row reads 127, the
    * off-frame left column 129, and the corner follows the above row
    * when that row is off-frame (127), the left column otherwise
    * (129), matching the reference decoder's boundary init. */
  private def predictBlock(plane: Array[Int], base: Int, stride: Int,
      size: Int, mode: Int, hasLeft: Boolean, hasAbove: Boolean): Unit = {
    def above(i: Int): Int = if (hasAbove) plane(base - stride + i) else 127
    def left(j: Int): Int = if (hasLeft) plane(base + j * stride - 1) else 129
    val tl: Int =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else plane(base - stride - 1)
    mode match {
      case 0 => // DC: average of available edges, 128 with neither
        var sum = 0; var n = 0
        if (hasAbove) { var i = 0; while (i < size) { sum += above(i); i += 1 }; n += size }
        if (hasLeft) { var j = 0; while (j < size) { sum += left(j); j += 1 }; n += size }
        val dc = if (n == 0) 128 else (sum + n / 2) / n
        var j = 0
        while (j < size) {
          var i = 0
          while (i < size) { plane(base + j * stride + i) = dc; i += 1 }
          j += 1
        }
      case 1 => // V
        var j = 0
        while (j < size) {
          var i = 0
          while (i < size) { plane(base + j * stride + i) = above(i); i += 1 }
          j += 1
        }
      case 2 => // H
        var j = 0
        while (j < size) {
          val l = left(j)
          var i = 0
          while (i < size) { plane(base + j * stride + i) = l; i += 1 }
          j += 1
        }
      case _ => // TM
        var j = 0
        while (j < size) {
          val l = left(j)
          var i = 0
          while (i < size) {
            plane(base + j * stride + i) = clip255(l + above(i) - tl)
            i += 1
          }
          j += 1
        }
    }
  }

  /** 4x4 luma prediction, all ten B modes (§12.3), written as the
    * reference decoder's per-pixel assignments. Above-right (A4..A7)
    * follows the spec's macroblock-level rule: every right-column
    * subblock sees the MB's OWN top-right four pixels (row above the
    * MB), replicated from the MB's last above pixel at the rightmost
    * MB column, 127 on the first row — never pixels of later blocks. */
  private def predict4x4(y: Array[Int], base: Int, stride: Int, mode: Int,
      sx: Int, sy: Int, mbX: Int, mbY: Int, mbW: Int): Unit = {
    val hasAbove = sy > 0 || mbY > 0
    val hasLeft = sx > 0 || mbX > 0
    val A = new Array[Int](8)
    var i = 0
    if (!hasAbove) { while (i < 8) { A(i) = 127; i += 1 } }
    else {
      while (i < 4) { A(i) = y(base - stride + i); i += 1 }
      if (sx < 3) { // above-right pixels already reconstructed
        while (i < 8) { A(i) = y(base - stride + i); i += 1 }
      } else if (mbY == 0) { // MB top-right row is the frame border
        while (i < 8) { A(i) = 127; i += 1 }
      } else {
        // MB-level top-right: the row ABOVE the MB at columns 16..19,
        // replicated from its column 15 at the rightmost MB
        val aboveRowBase = (mbY * 16 - 1) * stride + mbX * 16
        if (mbX == mbW - 1) {
          val rep = y(aboveRowBase + 15)
          while (i < 8) { A(i) = rep; i += 1 }
        } else {
          while (i < 8) { A(i) = y(aboveRowBase + 12 + i); i += 1 }
        }
      }
    }
    val L = new Array[Int](4)
    var j = 0
    while (j < 4) {
      L(j) = if (hasLeft) y(base + j * stride - 1) else 129
      j += 1
    }
    val tl: Int =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else y(base - stride - 1)
    def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2
    def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
    def set(x: Int, yy: Int, v: Int): Unit = y(base + yy * stride + x) = v
    mode match {
      case 0 => // B_DC: always all eight edge pixels, no edge variants
        var sum = 4
        i = 0; while (i < 4) { sum += A(i) + L(i); i += 1 }
        val dc = sum >> 3
        j = 0
        while (j < 4) { i = 0; while (i < 4) { set(i, j, dc); i += 1 }; j += 1 }
      case 1 => // B_TM
        j = 0
        while (j < 4) {
          i = 0
          while (i < 4) { set(i, j, clip255(L(j) + A(i) - tl)); i += 1 }
          j += 1
        }
      case 2 => // B_VE
        val t = Array(avg3(tl, A(0), A(1)), avg3(A(0), A(1), A(2)),
          avg3(A(1), A(2), A(3)), avg3(A(2), A(3), A(4)))
        j = 0
        while (j < 4) { i = 0; while (i < 4) { set(i, j, t(i)); i += 1 }; j += 1 }
      case 3 => // B_HE
        val ls = Array(avg3(tl, L(0), L(1)), avg3(L(0), L(1), L(2)),
          avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
        j = 0
        while (j < 4) { i = 0; while (i < 4) { set(i, j, ls(j)); i += 1 }; j += 1 }
      case 4 => // B_LD (down-left)
        set(0, 0, avg3(A(0), A(1), A(2)))
        val v1 = avg3(A(1), A(2), A(3)); set(1, 0, v1); set(0, 1, v1)
        val v2 = avg3(A(2), A(3), A(4))
        set(2, 0, v2); set(1, 1, v2); set(0, 2, v2)
        val v3 = avg3(A(3), A(4), A(5))
        set(3, 0, v3); set(2, 1, v3); set(1, 2, v3); set(0, 3, v3)
        val v4 = avg3(A(4), A(5), A(6))
        set(3, 1, v4); set(2, 2, v4); set(1, 3, v4)
        val v5 = avg3(A(5), A(6), A(7)); set(3, 2, v5); set(2, 3, v5)
        set(3, 3, avg3(A(6), A(7), A(7)))
      case 5 => // B_RD (down-right)
        set(0, 3, avg3(L(1), L(2), L(3)))
        val e0 = avg3(L(0), L(1), L(2)); set(0, 2, e0); set(1, 3, e0)
        val e1 = avg3(tl, L(0), L(1))
        set(0, 1, e1); set(1, 2, e1); set(2, 3, e1)
        val e2 = avg3(A(0), tl, L(0))
        set(0, 0, e2); set(1, 1, e2); set(2, 2, e2); set(3, 3, e2)
        val e3 = avg3(A(1), A(0), tl)
        set(1, 0, e3); set(2, 1, e3); set(3, 2, e3)
        val e4 = avg3(A(2), A(1), A(0)); set(2, 0, e4); set(3, 1, e4)
        set(3, 0, avg3(A(3), A(2), A(1)))
      case 6 => // B_VR
        val v0 = avg2(tl, A(0)); set(0, 0, v0); set(1, 2, v0)
        val v1 = avg2(A(0), A(1)); set(1, 0, v1); set(2, 2, v1)
        val v2 = avg2(A(1), A(2)); set(2, 0, v2); set(3, 2, v2)
        set(3, 0, avg2(A(2), A(3)))
        set(0, 3, avg3(L(2), L(1), L(0)))
        set(0, 2, avg3(L(1), L(0), tl))
        val v4 = avg3(L(0), tl, A(0)); set(0, 1, v4); set(1, 3, v4)
        val v5 = avg3(tl, A(0), A(1)); set(1, 1, v5); set(2, 3, v5)
        val v6 = avg3(A(0), A(1), A(2)); set(2, 1, v6); set(3, 3, v6)
        set(3, 1, avg3(A(1), A(2), A(3)))
      case 7 => // B_VL
        set(0, 0, avg2(A(0), A(1)))
        set(0, 1, avg3(A(0), A(1), A(2)))
        val v0 = avg2(A(1), A(2)); set(0, 2, v0); set(1, 0, v0)
        val v1 = avg3(A(1), A(2), A(3)); set(0, 3, v1); set(1, 1, v1)
        val v2 = avg2(A(2), A(3)); set(1, 2, v2); set(2, 0, v2)
        val v3 = avg3(A(2), A(3), A(4)); set(1, 3, v3); set(2, 1, v3)
        val v4 = avg2(A(3), A(4)); set(2, 2, v4); set(3, 0, v4)
        val v5 = avg3(A(3), A(4), A(5)); set(2, 3, v5); set(3, 1, v5)
        set(3, 2, avg3(A(4), A(5), A(6)))
        set(3, 3, avg3(A(5), A(6), A(7)))
      case 8 => // B_HD
        val v0 = avg2(L(0), tl); set(0, 0, v0); set(2, 1, v0)
        val v1 = avg2(L(1), L(0)); set(0, 1, v1); set(2, 2, v1)
        val v2 = avg2(L(2), L(1)); set(0, 2, v2); set(2, 3, v2)
        set(0, 3, avg2(L(3), L(2)))
        set(3, 0, avg3(A(0), A(1), A(2)))
        set(2, 0, avg3(tl, A(0), A(1)))
        val v3 = avg3(L(0), tl, A(0)); set(1, 0, v3); set(3, 1, v3)
        val v4 = avg3(tl, L(0), L(1)); set(1, 1, v4); set(3, 2, v4)
        val v5 = avg3(L(0), L(1), L(2)); set(1, 2, v5); set(3, 3, v5)
        set(1, 3, avg3(L(1), L(2), L(3)))
      case _ => // B_HU
        set(0, 0, avg2(L(0), L(1)))
        set(1, 0, avg3(L(0), L(1), L(2)))
        val v0 = avg2(L(1), L(2)); set(2, 0, v0); set(0, 1, v0)
        val v1 = avg3(L(1), L(2), L(3)); set(3, 0, v1); set(1, 1, v1)
        val v2 = avg2(L(2), L(3)); set(2, 1, v2); set(0, 2, v2)
        val v3 = avg3(L(2), L(3), L(3)); set(3, 1, v3); set(1, 2, v3)
        set(2, 2, L(3)); set(3, 2, L(3))
        set(0, 3, L(3)); set(1, 3, L(3)); set(2, 3, L(3)); set(3, 3, L(3))
    }
  }

  // ---- loop filter (§15) --------------------------------------------

  private def loopFilter(f: Frame, levels: Array[Int],
      inner: Array[Boolean], simple: Boolean, sharpness: Int): Unit = {
    var mbY = 0
    while (mbY < f.mbH) {
      var mbX = 0
      while (mbX < f.mbW) {
        val level = levels(mbY * f.mbW + mbX)
        if (level > 0) {
          var ilimit = level
          if (sharpness > 0) {
            ilimit >>= (if (sharpness > 4) 2 else 1)
            if (ilimit > 9 - sharpness) ilimit = 9 - sharpness
          }
          if (ilimit < 1) ilimit = 1
          val hev = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val mbLimit = (level + 2) * 2 + ilimit
          val subLimit = level * 2 + ilimit
          val doInner = inner(mbY * f.mbW + mbX)
          val yB = mbY * 16 * f.yStride + mbX * 16
          val cB = mbY * 8 * f.uvStride + mbX * 8
          if (simple) {
            if (mbX > 0) simpleHEdge(f.y, yB, f.yStride, mbLimit)
            if (doInner) {
              simpleHEdge(f.y, yB + 4, f.yStride, subLimit)
              simpleHEdge(f.y, yB + 8, f.yStride, subLimit)
              simpleHEdge(f.y, yB + 12, f.yStride, subLimit)
            }
            if (mbY > 0) simpleVEdge(f.y, yB, f.yStride, mbLimit)
            if (doInner) {
              simpleVEdge(f.y, yB + 4 * f.yStride, f.yStride, subLimit)
              simpleVEdge(f.y, yB + 8 * f.yStride, f.yStride, subLimit)
              simpleVEdge(f.y, yB + 12 * f.yStride, f.yStride, subLimit)
            }
          } else {
            if (mbX > 0) {
              mbHEdge(f.y, yB, f.yStride, 16, mbLimit, ilimit, hev)
              mbHEdge(f.u, cB, f.uvStride, 8, mbLimit, ilimit, hev)
              mbHEdge(f.v, cB, f.uvStride, 8, mbLimit, ilimit, hev)
            }
            if (doInner) {
              var o = 4
              while (o < 16) {
                subHEdge(f.y, yB + o, f.yStride, 16, subLimit, ilimit, hev)
                o += 4
              }
              subHEdge(f.u, cB + 4, f.uvStride, 8, subLimit, ilimit, hev)
              subHEdge(f.v, cB + 4, f.uvStride, 8, subLimit, ilimit, hev)
            }
            if (mbY > 0) {
              mbVEdge(f.y, yB, f.yStride, 16, mbLimit, ilimit, hev)
              mbVEdge(f.u, cB, f.uvStride, 8, mbLimit, ilimit, hev)
              mbVEdge(f.v, cB, f.uvStride, 8, mbLimit, ilimit, hev)
            }
            if (doInner) {
              var o = 4
              while (o < 16) {
                subVEdge(f.y, yB + o * f.yStride, f.yStride, 16,
                  subLimit, ilimit, hev)
                o += 4
              }
              subVEdge(f.u, cB + 4 * f.uvStride, f.uvStride, 8,
                subLimit, ilimit, hev)
              subVEdge(f.v, cB + 4 * f.uvStride, f.uvStride, 8,
                subLimit, ilimit, hev)
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  private def sclip(v: Int): Int = // signed clamp to [-128, 127]
    if (v < -128) -128 else if (v > 127) 127 else v
  private def u2s(v: Int): Int = v - 128
  private def s2u(v: Int): Int = clip255(v + 128)

  /** §15.2 filter_common for two pixels each side. `useOuter` = the
    * "use_outer_taps" flag (normal sub-block filter inner part). */
  private def commonFilter(p: Array[Int], i1: Int, step: Int,
      useOuter: Boolean): Unit = {
    val p1 = u2s(p(i1 - 2 * step)); val p0 = u2s(p(i1 - step))
    val q0 = u2s(p(i1)); val q1 = u2s(p(i1 + step))
    var a = sclip((if (useOuter) sclip(p1 - q1) else 0) + 3 * (q0 - p0))
    val f1 = sclip(a + 4) >> 3
    val f2 = sclip(a + 3) >> 3
    p(i1) = s2u(q0 - f1)
    p(i1 - step) = s2u(p0 + f2)
    if (!useOuter) {
      val a2 = (f1 + 1) >> 1
      p(i1 + step) = s2u(q1 - a2)
      p(i1 - 2 * step) = s2u(p1 + a2)
    }
  }

  private def filterMask(p: Array[Int], i: Int, step: Int, limit: Int,
      ilimit: Int): Boolean = {
    val p3 = p(i - 4 * step); val p2 = p(i - 3 * step)
    val p1 = p(i - 2 * step); val p0 = p(i - step)
    val q0 = p(i); val q1 = p(i + step); val q2 = p(i + 2 * step)
    val q3 = p(i + 3 * step)
    (Math.abs(p0 - q0) * 2 + Math.abs(p1 - q1) / 2) <= limit &&
    Math.abs(p3 - p2) <= ilimit && Math.abs(p2 - p1) <= ilimit &&
    Math.abs(p1 - p0) <= ilimit && Math.abs(q1 - q0) <= ilimit &&
    Math.abs(q2 - q1) <= ilimit && Math.abs(q3 - q2) <= ilimit
  }

  private def hevMask(p: Array[Int], i: Int, step: Int, t: Int): Boolean =
    Math.abs(p(i - 2 * step) - p(i - step)) > t ||
      Math.abs(p(i + step) - p(i)) > t

  /** §15.3 six-tap macroblock edge filter. */
  private def mbFilter(p: Array[Int], i: Int, step: Int): Unit = {
    val p2 = u2s(p(i - 3 * step)); val p1 = u2s(p(i - 2 * step))
    val p0 = u2s(p(i - step)); val q0 = u2s(p(i))
    val q1 = u2s(p(i + step)); val q2 = u2s(p(i + 2 * step))
    val w = sclip(sclip(p1 - q1) + 3 * (q0 - p0))
    var a = (27 * w + 63) >> 7
    p(i) = s2u(q0 - a); p(i - step) = s2u(p0 + a)
    a = (18 * w + 63) >> 7
    p(i + step) = s2u(q1 - a); p(i - 2 * step) = s2u(p1 + a)
    a = (9 * w + 63) >> 7
    p(i + 2 * step) = s2u(q2 - a); p(i - 3 * step) = s2u(p2 + a)
  }

  private def edge(p: Array[Int], base: Int, stride: Int, n: Int,
      step: Int, limit: Int, ilimit: Int, hev: Int, isMb: Boolean)
      : Unit = {
    var k = 0
    while (k < n) {
      val i = base + k * (if (step == 1) stride else 1)
      if (filterMask(p, i, step, limit, ilimit)) {
        if (hevMask(p, i, step, hev)) commonFilter(p, i, step, true)
        else if (isMb) mbFilter(p, i, step)
        else commonFilter(p, i, step, false)
      }
      k += 1
    }
  }

  private def mbHEdge(p: Array[Int], base: Int, stride: Int, n: Int,
      limit: Int, il: Int, hev: Int): Unit =
    edge(p, base, stride, n, 1, limit, il, hev, isMb = true)
  private def subHEdge(p: Array[Int], base: Int, stride: Int, n: Int,
      limit: Int, il: Int, hev: Int): Unit =
    edge(p, base, stride, n, 1, limit, il, hev, isMb = false)
  private def mbVEdge(p: Array[Int], base: Int, stride: Int, n: Int,
      limit: Int, il: Int, hev: Int): Unit =
    edge(p, base, stride, n, stride, limit, il, hev, isMb = true)
  private def subVEdge(p: Array[Int], base: Int, stride: Int, n: Int,
      limit: Int, il: Int, hev: Int): Unit =
    edge(p, base, stride, n, stride, limit, il, hev, isMb = false)

  /** §15.1 simple filter (luma only), 2-pixel variant. */
  private def simpleHEdge(p: Array[Int], base: Int, stride: Int,
      limit: Int): Unit = {
    var k = 0
    while (k < 16) {
      val i = base + k * stride
      if (simpleMask(p, i, 1, limit)) commonFilter(p, i, 1, true)
      k += 1
    }
  }
  private def simpleVEdge(p: Array[Int], base: Int, stride: Int,
      limit: Int): Unit = {
    var k = 0
    while (k < 16) {
      val i = base + k
      if (simpleMask(p, i, stride, limit)) commonFilter(p, i, stride, true)
      k += 1
    }
  }
  private def simpleMask(p: Array[Int], i: Int, step: Int,
      limit: Int): Boolean =
    Math.abs(p(i - step) - p(i)) * 2 +
      Math.abs(p(i - 2 * step) - p(i + step)) / 2 <= limit

  // ---- public surface ------------------------------------------------

  /** Decode a "VP8 " chunk payload to an image. None on malformed /
    * non-keyframe input. */
  // libwebp's fixed-point YUV420->RGB (yuv.h): 14-bit BT.601 constants
  // with the studio-range Y scale (1.164 = 255/219), products taken at
  // (v*k)>>8 then the sum clipped at >>6. Combined with the fancy
  // upsampler below, Vp8RgbSpec proves the RGB output BYTE-EXACT
  // against WebPDecodeRGBA on every still fixture.
  private final val kYScale = 19077
  private final val kVToR = 26149
  private final val kUToG = 6419
  private final val kVToG = 13320
  private final val kUToB = 33050
  @inline private def mul(v: Int, k: Int): Int = (v * k) >> 8
  // yuv.h spells these out: R = (Y*19077/256 + V*26149/256 - 14234)>>6
  // etc. Note kGCst is 8708, ONE LESS than re-deriving it as
  // -(16*kY>>8) + (128*kUToG>>8) + (128*kVToG>>8) + 32 would give
  // (the 128*6419 product halves to x.5 and their derivation truncates
  // the other way) — Vp8RgbSpec catches the difference on ~1/64 of
  // pixels, so the literals are pinned, not derived.
  private final val kRCst = -14234
  private final val kGCst = 8708
  private final val kBCst = -17685
  @inline private def clipShift6(v: Int): Int = {
    val s = v >> 6
    if (s < 0) 0 else if (s > 255) 255 else s
  }

  @inline private def toRgb(y8: Int, uu: Int, vv: Int): Int = {
    val yy = mul(y8, kYScale)
    val r = clipShift6(yy + mul(vv, kVToR) + kRCst)
    val g = clipShift6(yy - mul(uu, kUToG) - mul(vv, kVToG) + kGCst)
    val bl = clipShift6(yy + mul(uu, kUToB) + kBCst)
    (r << 16) | (g << 8) | bl
  }

  /** libwebp's FANCY UPSAMPLER (upsampling.c UPSAMPLE_FUNC — the
    * library default): chroma is bilinearly interpolated on the 2x
    * grid with 9/3/3/1 weights, computed in the same staged integer
    * arithmetic (diagonal averages then per-pixel halving) so the
    * rounding matches bit for bit. One call emits one luma row pair
    * ((2r-1, 2r) against chroma rows (r-1, r)); the first and — for
    * even heights — last rows pass jBot < 0 and duplicate their
    * nearest chroma row, exactly as io.c EmitFancyRGB drives it. */
  private def upsamplePair(img: BufferedImage, y: Array[Int],
      u: Array[Int], v: Array[Int], ys: Int, uvs: Int, w: Int,
      jTop: Int, jBot: Int, cjTop: Int, cjBot: Int): Unit = {
    val lastPair = (w - 1) >> 1
    val t0 = cjTop * uvs
    val c0 = cjBot * uvs
    var tlU = u(t0); var tlV = v(t0) // top-left chroma sample
    var lU = u(c0); var lV = v(c0) // left chroma sample (bottom row)
    img.setRGB(0, jTop, toRgb(y(jTop * ys),
      (3 * tlU + lU + 2) >> 2, (3 * tlV + lV + 2) >> 2))
    if (jBot >= 0)
      img.setRGB(0, jBot, toRgb(y(jBot * ys),
        (3 * lU + tlU + 2) >> 2, (3 * lV + tlV + 2) >> 2))
    var x = 1
    while (x <= lastPair) {
      val tU = u(t0 + x); val tV = v(t0 + x)
      val cU = u(c0 + x); val cV = v(c0 + x)
      val avgU = tlU + tU + lU + cU + 8
      val avgV = tlV + tV + lV + cV + 8
      val d12U = (avgU + 2 * (tU + lU)) >> 3
      val d12V = (avgV + 2 * (tV + lV)) >> 3
      val d03U = (avgU + 2 * (tlU + cU)) >> 3
      val d03V = (avgV + 2 * (tlV + cV)) >> 3
      img.setRGB(2 * x - 1, jTop, toRgb(y(jTop * ys + 2 * x - 1),
        (d12U + tlU) >> 1, (d12V + tlV) >> 1))
      if (2 * x < w)
        img.setRGB(2 * x, jTop, toRgb(y(jTop * ys + 2 * x),
          (d03U + tU) >> 1, (d03V + tV) >> 1))
      if (jBot >= 0) {
        img.setRGB(2 * x - 1, jBot, toRgb(y(jBot * ys + 2 * x - 1),
          (d03U + lU) >> 1, (d03V + lV) >> 1))
        if (2 * x < w)
          img.setRGB(2 * x, jBot, toRgb(y(jBot * ys + 2 * x),
            (d12U + cU) >> 1, (d12V + cV) >> 1))
      }
      tlU = tU; tlV = tV; lU = cU; lV = cV
      x += 1
    }
    if ((w & 1) == 0 && w > 1) {
      img.setRGB(w - 1, jTop, toRgb(y(jTop * ys + w - 1),
        (3 * tlU + lU + 2) >> 2, (3 * tlV + lV + 2) >> 2))
      if (jBot >= 0)
        img.setRGB(w - 1, jBot, toRgb(y(jBot * ys + w - 1),
          (3 * lU + tlU + 2) >> 2, (3 * lV + tlV + 2) >> 2))
    }
  }

  def decodeFrame(b: Array[Byte], off: Int, len: Int)
      : Option[BufferedImage] =
    decodePlanes(b, off, len).map { case (y, u, v, w, h, ys, uvs) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      // row driver (io.c EmitFancyRGB): row 0 alone with chroma row 0
      // duplicated; pairs (2r-1, 2r) with chroma (r-1, r); for even
      // heights, the last row alone with the last chroma row duplicated
      upsamplePair(img, y, u, v, ys, uvs, w, 0, -1, 0, 0)
      var r = 1
      while (2 * r < h) {
        upsamplePair(img, y, u, v, ys, uvs, w, 2 * r - 1, 2 * r, r - 1, r)
        r += 1
      }
      if ((h & 1) == 0 && h > 1)
        upsamplePair(img, y, u, v, ys, uvs, w, h - 1, -1,
          (h - 1) >> 1, (h - 1) >> 1)
      img
    }
}
