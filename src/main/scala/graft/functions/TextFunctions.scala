package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis / dedup primitives for the LLM-data-pipeline surface
  * (north star in BASELINE.json; SURVEY §2.10).
  *
  * Everything here is built from org.apache.spark.sql.functions (including
  * higher-order array functions) — no Scala UDFs — so the expressions stay
  * inside Catalyst, serialize into the plan, and never force a JVM round-trip
  * per row. Hashes are derived from md5 (a cross-engine primitive) so every
  * operator has an exactly-reproducible DuckDB oracle; at 100 TB the same
  * expressions run unchanged because they are per-row/narrow (no shuffle).
  */
object TextFunctions {

  /** Whitespace tokenizer (the reference's signer split analog,
    * x/common/types.go:181-190 uses comma-join/split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical normalization for fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint = md5 of normalized text (content-addressed
    * identity, reference x/imgstorage/storage.go:37-62). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Word n-gram shingles: ["a b c", "b c d", ...]. Empty array when the
    * document has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Unicode NFC normalization as a native codegen [[Expression]] —
    * the canonicalization step every multilingual corpus needs before
    * hashing/dedup: the SAME text arriving precomposed ("é", U+00E9)
    * and decomposed ("e" + U+0301) hashes identically only after a
    * canonical form is fixed. NFC is the W3C-recommended interchange
    * form; `java.text.Normalizer` implements the Unicode algorithm and
    * DuckDB's `nfc_normalize` replays it exactly, so the operator is
    * oracle-checkable. Per-row, no shuffle — rides the corpus scan at
    * any scale. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column, got ${other.sql}")
      }
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(a: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        a.asInstanceOf[UTF8String].toString,
        java.text.Normalizer.Form.NFC))

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        s"""
           |${ev.value} = org.apache.spark.unsafe.types.UTF8String
           |  .fromString(java.text.Normalizer.normalize($x.toString(),
           |    java.text.Normalizer.Form.NFC));
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): NfcNormalize = copy(child = newChild)
  }

  /** Unseeded 60-bit hash from md5 (first 15 hex chars < 2^60, fits a
    * signed long) — THE recipe `OracleSql.ddbHash` replays; every
    * md5-derived hash in the engine goes through here or
    * [[seededHash]] so the cross-engine lockstep has one definition. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded 60-bit hash from md5 — deterministic and reproducible in any
    * engine with md5 (first 15 hex chars < 2^60, fits a signed long). */
  def seededHash(c: Column, seed: Int): Column =
    hash60(concat(c, lit(s"#$seed")))

  /** MinHash signature: k independent min-hashes over the shingle set.
    * Null when the shingle set is empty. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(j => array_min(transform(sh, seededHash(_, j)))): _*)

  /** Estimated Jaccard similarity from two equal-length signatures:
    * fraction of agreeing positions. */
  def minhashJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => (a === b).cast("int")),
      lit(0), (acc, x) => acc + x).cast("double") / k

  /** LSH band keys: md5 over each contiguous slice of the signature.
    * Docs sharing any band key are candidate duplicates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws(",",
        slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  // --- Fast (xxhash64-seeded) variants -------------------------------------
  // The md5-derived forms above exist so DuckDB can replay them bit-for-bit
  // (the oracle contract). The operators below are the production/scale path:
  // xxhash64 is codegen'd and ~20× cheaper than md5+hex+conv per shingle, and
  // seeding via an extra hashed column avoids wrap-around arithmetic (which
  // ANSI mode — Spark 4's default — would reject on overflow).

  /** k-row MinHash signature via seeded xxhash64; the per-seed hash is
    * xxhash64(seed, shingle). Null signature for empty shingle sets. */
  def fastMinhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(sh, s => xxhash64(lit(j), s)))): _*)

  /** Murmur3 band keys over signature slices (int keys, cheap shuffle). */
  def fastLshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      hash(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Shingle set hashed to longs: set-similarity math (intersect/union)
    * then compares 8-byte values instead of full strings. (Measured note:
    * hashing token triples via 3×element_at per shingle is SLOWER than
    * building the shingle string with one slice+concat_ws pass — in
    * interpreted HOF evaluation, expression-node count dominates, so the
    * fewer-nodes form wins.) */
  def hashedShingles(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n), s => xxhash64(s)))

  /** SimHash (md5-derived so the oracle can replicate it): per-bit
    * majority vote over the token hash set. `bits` ≤ 60 (the hash width). */
  def simhashBits(text: Column, bits: Int): Column = {
    val hashes = transform(tokens(text), tok =>
      conv(substring(md5(tok), 1, 15), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { b =>
      val vote = aggregate(
        transform(hashes, h => (shiftright(h, b) % 2) * 2 - 1),
        lit(0L), (acc, x) => acc + x)
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  def simhash16(text: Column): Column = simhashBits(text, 16)

  /** Hamming distance between two simhash values (bit-population of XOR). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Stopword hit count for a language's marker list. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t =>
      stopwords.map(t === _).reduce(_ || _)))

  /** Language marker lists for the n-gram/stopword language-ID heuristic.
    * Order matters: ties resolve to the first language in this list. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有"))

  /** Predicted language: argmax of marker hits, 'und' when no marker hits;
    * ties break in langMarkers order (first wins, strictly-greater compare). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (lang, words) =>
      (lang, stopwordHits(toks, words))
    }
    val best = scored.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl),
          when(sc > bs, sc).otherwise(bs))
    }
    best._1
  }
}
