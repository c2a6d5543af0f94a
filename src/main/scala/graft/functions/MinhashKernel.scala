package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Fused minhash/shingle kernel: tokenize → shingle → k seeded hashes →
  * per-seed min, in ONE compiled loop over the UTF8 bytes of the document.
  *
  * Replaces the declarative
  * `array((0..k).map(j => array_min(transform(shingles, s =>
  * xxhash64(lit(j), s)))))` stack, which pays interpreted-HOF dispatch per
  * shingle per seed and materializes every shingle string. Bit-for-bit
  * equivalent (verified by spec): a word-n-gram's joined string is exactly
  * the byte range of the original text from token i's first byte to token
  * i+n-1's last byte (split-on-space/join-with-space identity), so the
  * kernel hashes byte ranges in place — zero shingle allocation; and the
  * seed chain matches Spark's XxHash64 semantics
  * (`xxhash64(lit(j), s)` = hash bytes of s with seed `hashInt(j, 42)`).
  */
object MinhashKernel {

  private val DefaultSeed = 42L

  /** seed_j as Spark computes it for xxhash64(lit(j), s). */
  def seed(j: Int): Long = XXH64.hashInt(j, DefaultSeed)

  private def tokenStarts(s: UTF8String): (Array[Int], Int) = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var m = 1
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') m += 1
      i += 1
    }
    val starts = new Array[Int](m + 1)
    var t = 1
    i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(m) = nb + 1 // sentinel: token end = starts(i+1) - 1
    (starts, m)
  }

  /** MinHash signature (length k) over word-n-gram shingles; null when the
    * document has fewer than n tokens. */
  def signature(text: UTF8String, k: Int, n: Int): ArrayData = {
    val (starts, m) = tokenStarts(text)
    if (m < n) return null
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = seed(j); j += 1 }
    var i = 0
    val nShingles = m - n + 1
    while (i < nShingles) {
      val s0 = starts(i)
      val len = (starts(i + n) - 1) - s0
      j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(base, off + s0, len, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Marker-hit counting for language ID — the fused form of
    * `TextFunctions.langId` (stopwordHits argmax, first-lang-wins on ties,
    * "und" when nothing hits): one pass over the token byte ranges, each
    * token compared against the marker table. */
  def langId(text: UTF8String,
      markers: Array[Array[Array[Byte]]],
      langs: Array[UTF8String]): UTF8String = {
    val (starts, m) = tokenStarts(text)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val hits = new Array[Int](langs.length)
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      val len = (starts(i + 1) - 1) - s0
      var l = 0
      while (l < markers.length) {
        val words = markers(l)
        var w = 0
        while (w < words.length) {
          val word = words(w)
          if (word.length == len && org.apache.spark.unsafe.array
            .ByteArrayMethods.arrayEquals(base, off + s0, word,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)) {
            hits(l) += 1
          }
          w += 1
        }
        l += 1
      }
      i += 1
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < hits.length) {
      if (hits(l) > bestScore) { bestScore = hits(l); best = l }
      l += 1
    }
    if (best < 0) MinhashKernel.und else langs(best)
  }

  private val und = UTF8String.fromString("und")

  /** md5-derived SimHash — the fused form of TextFunctions.simhashBits
    * (bit-for-bit: token hash = first 15 hex digits of md5 = the top 60
    * bits of the digest's first 8 bytes, exactly what
    * conv(substring(md5(tok),1,15),16,10) yields). MessageDigest per token
    * replaces bits× interpreted HOF passes. */
  def simhashMd5(text: UTF8String, bits: Int): Long = {
    val (starts, m) = tokenStarts(text)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      val len = starts(i + 1) - 1 - s0
      val tok = new Array[Byte](len)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + s0, tok,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len.toLong)
      md.reset()
      val d = md.digest(tok)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = h >>> 4 // 15 hex digits = top 60 bits
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every k-byte gram, slide a window of w hashes, keep
    * the RIGHTMOST minimum per window, dedup consecutive picks. Guarantees:
    * any shared substring of length ≥ w+k-1 yields at least one shared
    * fingerprint, and local edits only perturb nearby windows — the
    * rolling-hash fingerprint the north star asks for. Returns sorted
    * distinct fingerprints; empty for docs shorter than k+w-1 bytes. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nb = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nGrams = nb - k + 1
    if (nGrams < w) return new GenericArrayData(Array.emptyLongArray)
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = XXH64.hashUnsafeBytes(base, off + i, k, DefaultSeed)
      i += 1
    }
    val picked = new java.util.TreeSet[java.lang.Long]()
    var lastPick = -1
    i = 0
    while (i + w <= nGrams) {
      var minIdx = i
      var j = i + 1
      while (j < i + w) {
        if (grams(j) <= grams(minIdx)) minIdx = j // rightmost minimum
        j += 1
      }
      if (minIdx != lastPick) { picked.add(grams(minIdx)); lastPick = minIdx }
      i += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct shingle hashes (xxhash64 with Spark's default seed) — the
    * fused form of `array_distinct(transform(shingles(text,n), xxhash64))`.
    * Empty array when fewer than n tokens. */
  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val (starts, m) = tokenStarts(text)
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nShingles = m - n + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val s0 = starts(i)
      val len = (starts(i + n) - 1) - s0
      seen.add(XXH64.hashUnsafeBytes(base, off + s0, len, DefaultSeed))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Word-n-gram shingles as STRINGS — the fused form of
    * `transform(sequence(1, m-n+1), i -> concat_ws(" ", slice(toks, i, n)))`
    * over `split(text, " ")`. Because the separators are single spaces,
    * each shingle is exactly the original byte span from the start of
    * token i to the end of token i+n-1, so the kernel copies byte ranges
    * instead of re-joining token objects (and stays inside whole-stage
    * codegen, unlike the HOF form). One entry per position, duplicates
    * kept — identical to TextFunctions.shingles. */
  def stringShingles(text: UTF8String, n: Int): ArrayData = {
    val (starts, m) = tokenStarts(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nSh = m - n + 1
    val out = new Array[Any](nSh)
    var i = 0
    while (i < nSh) {
      val s0 = starts(i)
      val len = (starts(i + n) - 1) - s0
      val bytes = new Array[Byte](len)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + s0, bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISTINCT word-n-gram shingle strings — [[stringShingles]] with the
    * per-document dedup fused into the kernel. For consumers that count
    * DOCUMENTS per gram (the q95/q96 df side, IncrementalSpans deltas),
    * within-document duplicates are pure aggregate input that a
    * downstream distinct would immediately discard; deduping here turns
    * the two-phase (gram, doc) distinct aggregate into a plain partial
    * count — one exchange instead of two, and only distinct grams ever
    * leave the row. Insertion order preserved (first occurrence). */
  def distinctStringShingles(text: UTF8String, n: Int): ArrayData = {
    val (starts, m) = tokenStarts(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nSh = m - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](nSh * 2)
    var i = 0
    while (i < nSh) {
      val s0 = starts(i)
      val len = (starts(i + n) - 1) - s0
      val bytes = new Array[Byte](len)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + s0, bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      seen.add(UTF8String.fromBytes(bytes))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
