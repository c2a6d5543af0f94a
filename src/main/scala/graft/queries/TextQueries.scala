package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Materialize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + document-dedup query surface over the `documents` table
  * (north-star operators; SURVEY §2.10/§2.11 Q21–Q22 plus the dedup /
  * text-quality inventory from the project brief).
  *
  * Scale posture: every per-document computation is narrow (no shuffle);
  * the only shuffles are the final groupBy/join on hash keys, which
  * partition evenly because the keys are uniform md5-derived hashes. LSH
  * banding turns the O(n²) near-dup join into an equi-join on band keys —
  * the standard 100 TB-safe plan (band key is the shuffle key; bucket sizes
  * stay bounded because banding is selective).
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The documents frame for cross-package composition (the frozen
    * freeze paths take frames, not dirs). */
  private[graft] def docsFrame(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)

  /** Rounds the last q62 label propagation took (diagnostics/specs). */
  @volatile private[graft] var q62LastRounds: Int = 0

  /** Q21 — per-language corpus stats. */
  def q21TextStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"),
        countDistinct(col("source")).as("srcs"))
      .orderBy("lang")

  /** Q22 — exact-duplicate histogram via content hash. */
  def q22ExactDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(md5(col("text")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n_dups"))
      .groupBy("n_dups").agg(count(lit(1)).as("groups"))
      .orderBy("n_dups")

  /** Token counting (whitespace tokenizer). */
  def q25TokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .orderBy("doc_id")
      .limit(300)

  /** Language-ID heuristic: stopword-marker argmax, aggregated to a
    * (predicted, actual) confusion-style matrix. */
  def q26LangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), graft.functions.TextKernelExpressions
        .langIdFast(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")

  /** Q159 — CLASSIFIER EVALUATION: per-language precision / recall /
    * F1 of the lang-id heuristic against the labeled corpus — the
    * metric sheet a pipeline reads before trusting a filter (q26's
    * confusion matrix, reduced to the numbers decisions use). All
    * folds run over the class-sized confusion counts (one corpus
    * pass, then joins of ≤|languages| rows); never-predicted classes
    * answer null precision (0/0 stays undefined, not NaN). */
  def q159LangIdEval(s: SparkSession, dir: String): DataFrame = {
    val cm = docs(s, dir)
      .select(col("lang"), graft.functions.TextKernelExpressions
        .langIdFast(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val act = cm.groupBy("lang").agg(sum(col("n")).as("na"))
    val prd = cm.groupBy(col("lang_pred").as("lang"))
      .agg(sum(col("n")).as("np"))
    val tp = cm.filter(col("lang") === col("lang_pred"))
      .select(col("lang"), col("n").as("ntp"))
    val m = act.join(prd, Seq("lang"), "left")
      .join(tp, Seq("lang"), "left")
      .withColumn("ntp", coalesce(col("ntp"), lit(0L)))
      .withColumn("p", col("ntp") / col("np"))
      .withColumn("r", col("ntp") / col("na"))
    m.select(col("lang"), col("na").as("n_true"),
        round(col("p"), 4).as("precision"),
        round(col("r"), 4).as("recall"),
        round(when(col("p") + col("r") > 0,
          lit(2.0) * col("p") * col("r") / (col("p") + col("r"))), 4)
          .as("f1"))
      .orderBy("lang")
  }

  /** Quality scoring: avg word length + vocabulary-uniqueness ratio. */
  def q27Quality(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    docs(s, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(col("n_chars").cast("double") / size(toks), 4)
          .as("avg_wlen"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("uniq_ratio"))
      .orderBy("doc_id")
      .limit(300)
  }

  /** Q41 — full quality-ratio scoring (north-star quality filters:
    * punctuation density + stopword density, the classic heuristic pair for
    * corpus filtering). Oracle-checked. */
  def q41QualityRatios(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val en = graft.functions.TextFunctions.langMarkers.head._2
    docs(s, dir)
      .select(col("doc_id"),
        round(length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", ""))
          .cast("double") / length(col("text")), 4).as("punct_ratio"),
        round(stopwordHits(toks, en).cast("double") / size(toks), 4)
          .as("stop_ratio"))
      .orderBy("doc_id")
      .limit(300)
  }

  /** Q42 — BPE-ish subword token counting (north-star token counting:
    * whitespace q25 + this regex variant). The pattern is the classic
    * GPT-2-style pre-tokenizer shape — contraction suffixes, letter runs,
    * digit runs, punctuation runs, each with optional leading space —
    * RE2-safe so DuckDB replays it exactly. */
  val bpePattern = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def q42BpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
          .cast("long").as("n_bpe"))
      .orderBy("doc_id")
      .limit(300)

  /** Q43 — winnowing (rolling-hash) fingerprints, the MOSS substring-
    * robust document identity (north-star "document fingerprinting
    * (rolling hash)"). Rows-only: the window-min selection has no cheap
    * SQL replay; the algorithm's guarantees are spec-tested. */
  def q43Winnowing(s: SparkSession, dir: String): DataFrame = {
    val fps = graft.functions.TextKernelExpressions
      .winnow(col("text"), 8, 16)
    docs(s, dir)
      .select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
        element_at(col("fps"), 1).as("min_fp"))
      .orderBy("doc_id")
      .limit(300)
  }

  /** Document fingerprinting: md5 over canonicalized text. */
  def q28Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
      .limit(300)

  /** MinHash signatures (k=4, word-3-gram shingles) — the per-document half
    * of MinHash/LSH dedup, oracle-checkable because hashes are md5-derived. */
  def q29MinhashSig(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignature(graft.functions.TextKernelExpressions
      .wordShinglesFast(col("text"), 3), 4)
    docs(s, dir)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"),
        element_at(col("sig"), 1).as("s0"), element_at(col("sig"), 2).as("s1"),
        element_at(col("sig"), 3).as("s2"), element_at(col("sig"), 4).as("s3"))
      .orderBy("doc_id")
      .limit(300)
  }

  /** MinHash + LSH near-duplicate pairs: signature (k=16) → 8 bands × 2 rows
    * → candidate pairs via band-key equi-join → estimated-Jaccard filter.
    * This is the 100 TB dedup plan: no cross join, shuffle only on band key. */
  def q30MinhashPairs(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val k = 16
    // Signature computed by the fused codegen kernel (one compiled loop per
    // document — graft.functions.MinhashKernel), then pinned
    // (Materialize.pin: MEMORY_AND_DISK, checkpoint-able) before the band
    // explode references it 8× — Catalyst would otherwise inline the
    // signature expression into every band slice. Materializing the
    // signature table before the LSH join is also the production shape.
    val sigd = docs(s, dir)
      .select(col("doc_id"),
        graft.functions.TextKernelExpressions
          .minhashSig(col("text"), k, 3).as("sig"))
      .filter(col("sig").isNotNull)
      .transform(Materialize.pin)
    val signed = sigd
      .withColumn("band", explode(fastLshBands(col("sig"), 8, 2)))
    val a = signed.select(col("doc_id").as("a"), col("sig").as("sig_a"),
      col("band"))
    val b = signed.select(col("doc_id").as("b"), col("sig").as("sig_b"),
      col("band"))
    a.join(b, Seq("band"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        minhashJaccard(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** Q51 — MinHash+LSH near-dup pairs, md5-derived twin of q30: same
    * banding algorithm (k=8 signature, 4 bands × 2 rows, est-Jaccard
    * filter) over the engine-portable md5 hashes, so DuckDB replays the
    * WHOLE pair pipeline — this is the oracle anchor for the LSH-pair
    * algorithm, with q30 as the xxhash64 fast path (same plan shape).
    * The shingle set and signature are each pinned (Materialize.pin) before
    * fan-out — Catalyst re-inlines non-cheap array expressions into every
    * consumer, which would recompute shingles k× and the signature 4×.
    * Docs are pre-limited (first 1000 by id) because the md5→hex→conv
    * chain is interpreted-expression-expensive — the algorithm anchor only
    * needs a fixed slice; q30's xxhash kernel is the full-corpus path. */
  def q51MinhashPairsMd5(s: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val k = 8
    val shd = docs(s, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(1000)
      .select(col("doc_id"), graft.functions.TextKernelExpressions
        .wordShinglesFast(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Materialize.pin)
    val sigd = shd
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig"))
      .transform(Materialize.pin)
    val signed = sigd.withColumn("band",
      explode(lshBands(col("sig"), 4, 2)))
    val a = signed.select(col("doc_id").as("a"), col("sig").as("sig_a"),
      col("band"))
    val b = signed.select(col("doc_id").as("b"), col("sig").as("sig_b"),
      col("band"))
    a.join(b, Seq("band"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        minhashJaccard(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** Cross-corpus MinHash near-dup pairs — the FUZZY decontamination
    * primitive: candidate pairs BETWEEN two corpora (train vs eval,
    * crawl vs golden set), never within one side. The side is carried
    * STRUCTURALLY (left rows come back as `a`, right rows as `b`) —
    * no key-naming conventions to silently break, the
    * [[graft.functions.HammingBands.crossPairs]] posture applied to
    * the MinHash space. md5-derived hashes so DuckDB replays the whole
    * pipeline (q51's contract); q30's xxhash64 kernel drops in for the
    * full-corpus fast path with the identical plan shape.
    *
    * Scale posture: two signature scans + ONE equi-join on the band
    * key — no cross join, and no within-side candidate blowup (a
    * self-join over train would dominate every decontamination run:
    * |train| >> |eval|); the est-Jaccard bound filters BELOW the
    * pair-dedup exchange (the HammingBands lesson), and exactness is
    * restored by the agreement count after the probabilistic banding
    * recall. */
  def minhashCrossPairsMd5(left: DataFrame, right: DataFrame,
      k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    def sigs(df: DataFrame): DataFrame = df
      .select(col("doc_id"), graft.functions.TextKernelExpressions
        .wordShinglesFast(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig"))
      .transform(Materialize.pin)
    val l = sigs(left)
      .withColumn("band", explode(lshBands(col("sig"), bands, rowsPerBand)))
      .select(col("doc_id").as("a"), col("sig").as("sig_a"), col("band"))
    val r = sigs(right)
      .withColumn("band", explode(lshBands(col("sig"), bands, rowsPerBand)))
      .select(col("doc_id").as("b"), col("sig").as("sig_b"), col("band"))
    l.join(r, Seq("band"))
      .select(col("a"), col("b"),
        minhashJaccard(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .distinct()
  }

  /** Q125 — fuzzy decontamination: the train split probed against its
    * OWN eval (val+test) splits through [[minhashCrossPairsMd5]] —
    * near-matches exact decontamination (q64's 5-gram overlap) misses:
    * light rewrites, truncation, whitespace drift. Composes q54's
    * deterministic split with q51's oracle-replayable pair pipeline;
    * the answer is the (train_doc, eval_doc, est_jaccard) pairs a
    * pipeline would quarantine. Docs pre-limited like q51 (the md5
    * chain is the algorithm anchor; the xxhash kernel is the
    * full-corpus path). */
  def q125CrossDecontam(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(1000)
      .withColumn("split", splitCol)
    minhashCrossPairsMd5(
      base.filter(col("split") === "train").select("doc_id", "text"),
      base.filter(col("split") =!= "train").select("doc_id", "text"))
      .orderBy("a", "b")
  }

  /** Q52 — winnowing fingerprints, md5/char-gram twin of q43: the
    * fingerprint SET equals the distinct sliding-window minima (the
    * rightmost-min tie rule only picks WHICH index, never a different
    * VALUE), so both engines compute: char-8-gram md5 hashes → min over
    * each 16-window → distinct. q43 stays the byte-gram xxhash fast path.
    * Docs are pre-limited (orderBy+limit 300) BEFORE the per-char hashing
    * so the expensive stage runs on exactly the output rows; the hash
    * array is pinned (Materialize.pin) before the window-min pass for the
    * same inlining reason as q51. */
  def q52WinnowMd5(s: SparkSession, dir: String,
      k: Int = 8, w: Int = 16): DataFrame = {
    val top = docs(s, dir).select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(300)
    val hs = when(length(col("text")) < k, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => conv(substring(md5(col("text").substr(i, lit(k))
          .cast("binary")), 1, 15), 16, 10).cast("long")))
    val withHs = top.select(col("doc_id"), hs.as("hs"))
      .transform(Materialize.pin)
    val fps = when(size(col("hs")) < w, array().cast("array<long>"))
      .otherwise(array_sort(array_distinct(transform(
        sequence(lit(1), size(col("hs")) - (w - 1)),
        i => array_min(slice(col("hs"), i, lit(w)))))))
    withHs.select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
        try_element_at(col("fps"), lit(1)).as("min_fp"))
      .orderBy("doc_id")
  }

  /** SimHash values (16-bit md5-derived) per document (fused kernel;
    * bit-equivalent to the declarative simhash16 — spec-verified). */
  def q31Simhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), graft.functions.TextKernelExpressions
        .simhashMd5(col("text"), 16).as("sh"))
      .orderBy("doc_id")
      .limit(300)

  /** Q48 — SimHash near-duplicate pairs within Hamming distance 3 over a
    * 32-bit simhash (16 bits is too coarse to discriminate beyond ~1k
    * docs): 8-bit band keys (pigeonhole: distance ≤ 3 over 4 bands forces
    * ≥ 1 identical band, so banding is LOSSLESS here) turn the pair scan
    * into an equi-join; candidates pay one bit_count. Oracle: DuckDB
    * recomputes the md5-derived simhash and brute-forces the predicate. */
  def q48SimhashPairs(s: SparkSession, dir: String,
      maxDist: Int = 3): DataFrame =
    simhashPairsRaw(s, dir, maxDist).orderBy("a", "b")

  /** q48 without the presentation sort — the form compositions (q62,
    * q70) consume. EliminateSorts has no case for a Sort under the Union
    * that componentLabels builds, so feeding the SORTED variant into a
    * composition would really pay the range-exchange + global sort. */
  private[graft] def simhashPairsRaw(s: SparkSession, dir: String,
      maxDist: Int = 3): DataFrame = {
    val sh = docs(s, dir)
      .select(col("doc_id"), graft.functions.TextKernelExpressions
        .simhashMd5(col("text"), 32).as("sh"))
      .transform(Materialize.pin)
    // shared pigeonhole banding (graft.functions.HammingBands — also
    // the image dHash pairs' shape): 4 x 8-bit bands over the 32-bit
    // simhash, lossless for maxDist <= 3
    graft.functions.HammingBands.pairs(sh, "doc_id", "sh",
      nBands = 4, bandBits = 8, maxDist = maxDist)
  }

  /** Q54 — deterministic hash-based dataset split (train/val/test), the
    * backbone of any training pipeline: assignment = content-stable hash of
    * the document id mod 10 (8/1/1), so the split is reproducible across
    * runs, engines and re-partitions — never rand(). md5-derived hash so
    * DuckDB replays it; a map-side projection + one count shuffle. */
  def q54HashSplit(s: SparkSession, dir: String): DataFrame =
    splitAssignments(s, dir)
      .groupBy("split")
      .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("langs"))
      .orderBy("split")

  /** Q55 — stratified deterministic sampling: a fixed-rate (10%) sample
    * per language stratum selected by hash threshold (pmod(h,100) < 10) —
    * the reproducible alternative to rand()-sampling for corpus
    * subsetting. Reports per-stratum sampled/total/rate. */
  def q55StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val h = seededHash(col("doc_id").cast("string"), 1)
    docs(s, dir)
      .select(col("lang"), (pmod(h, lit(100)) < 10).as("sel"))
      .groupBy("lang")
      .agg(sum(col("sel").cast("long")).as("n_sampled"),
        count(lit(1)).as("n_total"))
      .withColumn("rate",
        round(col("n_sampled").cast("double") / col("n_total"), 4))
      .orderBy("lang")
  }

  /** Q59 — PII redaction (corpus-prep sanitization): RE2-safe email
    * pattern replaced with a fixed token, with a per-doc redaction count
    * and the redacted content hash as the audit trail. The fixture text
    * has no addresses, so a deterministic synthetic contact line is
    * prepended — both engines construct the identical input. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  private[graft] val phonePattern = "\\b\\d{3}-\\d{4}\\b"
  private[graft] val ipPattern =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Q136 — MULTI-CLASS PII scan + redaction: emails, phone-shaped
    * numbers and IPv4 literals counted per class and redacted in one
    * deterministic order (email → IP → phone, so a class's replacement
    * token can never feed a later pattern). PII is synthesized from
    * doc_id (the q59 posture) so every class provably fires; patterns
    * stay inside the Java-regex/RE2 common subset and ride into the
    * DuckDB oracle verbatim. Per-row projection, no shuffle. */
  def q136PiiClasses(s: SparkSession, dir: String): DataFrame = {
    val synth = concat(lit("call 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" or ping 10.1.2."), (col("doc_id") % 256).cast("string"),
      lit(" mail u"), col("doc_id"), lit("@example.com "), col("text"))
    docs(s, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(300)
      .select(col("doc_id"), synth.as("raw"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailPattern), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("raw"), lit(phonePattern), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all(col("raw"), lit(ipPattern), lit(0)))
          .cast("long").as("n_ip"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("raw"),
          emailPattern, "[EMAIL]"), ipPattern, "[IP]"),
          phonePattern, "[PHONE]")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** Q137 — Unicode NFC canonicalization through the codegen
    * [[graft.functions.TextFunctions.NfcNormalize]] expression: a
    * decomposed accent sequence (e + COMBINING ACUTE) is prepended per
    * document, and the query reports pre/post lengths plus the md5 of
    * the NORMALIZED text — proving the engine's normal form matches
    * DuckDB's `nfc_normalize` byte-for-byte (the precondition for any
    * cross-engine dedup over multilingual text). */
  def q137NfcNormalize(s: SparkSession, dir: String): DataFrame = {
    val synth = concat(lit("Cafe\u0301 nai\u0308ve "), col("text"))
    docs(s, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(300)
      .select(col("doc_id"), synth.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("len_raw"),
        length(graft.functions.TextFunctions.nfc(col("raw")))
          .cast("long").as("len_nfc"),
        md5(graft.functions.TextFunctions.nfc(col("raw")))
          .as("nfc_md5"))
      .orderBy("doc_id")
  }

  /** Q138 — FUZZY term matching (edit distance <= 1) against the
    * corpus vocabulary: the typo-tolerant lookup a retrieval stack
    * bolts onto BM25 (q77/q82) when queries carry misspellings.
    *
    * Scale path is the SymSpell deletion neighborhood: every word maps
    * to {itself} ∪ {itself minus one character}; two words are within
    * edit distance 1 ONLY IF they share a key (substitutions meet at
    * the common deletion, insert/delete pairs at the shorter word), so
    * candidates come from one EQUI-join on the key — never a
    * |vocab| × |terms| cross product — and the exact codegen
    * `levenshtein` confirm restores precision, the
    * bloom-then-confirm/band-then-verify posture this repo uses
    * everywhere. The oracle MAY pay the cross join (DuckDB's native
    * levenshtein over the full vocabulary), which independently proves
    * the neighborhood lost nothing. */
  def q138FuzzyTerms(s: SparkSession, dir: String,
      terms: Seq[String] = Seq("joinn", "windo", "hash")): DataFrame = {
    def delKeys(w: org.apache.spark.sql.Column) =
      array_union(array(w), transform(
        sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - 1),
          w.substr(i + 1, length(w)))))
    // the deletion-key DICTIONARY is index state (a typo-corrector
    // builds it once per corpus snapshot and serves many requests) —
    // pinned per (session, dir) like the other serving indexes; each
    // call pays the request-side join + confirm
    val vocab = graft.FixtureCache.once(s, s"fuzzy_vocab|$dir") {
      docs(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0).distinct()
        .select(col("word"), explode(delKeys(col("word"))).as("k"))
        .localCheckpoint(true)
    }
    import s.implicits._
    val q = terms.toDF("term")
      .select(col("term"), explode(delKeys(col("term"))).as("k"))
    q.join(vocab, Seq("k"))
      .select(col("term"), col("word"))
      .distinct() // many shared keys per near-pair
      .filter(levenshtein(col("term"), col("word")) <= 1)
      .select(col("term"), col("word"),
        levenshtein(col("term"), col("word")).cast("long").as("dist"))
      .orderBy("term", "word")
  }

  /** Q139 — EXPLICIT null placement (Hasura's `asc_nulls_first` /
    * `desc_nulls_last` order_by family): a synthesized nullable column
    * (src3 sources nulled) ordered nulls-FIRST under a limit that cuts
    * before the non-null tail — an engine on the default asc-nulls-LAST
    * rule returns a different row SET, so the oracle catches placement,
    * not just order. Served through [[graft.api.QueryBuilder.runRoot]]
    * so the Order(nullsFirst) compilation is what executes. */
  def q139NullsOrder(s: SparkSession, dir: String): DataFrame = {
    import graft.api.QueryBuilder
    val base = docs(s, dir)
      .select(col("doc_id"),
        nullif(col("source"), lit("src3")).as("src_n"))
    QueryBuilder.runRoot(base, QueryBuilder.Request(
      "documents", Seq("doc_id", "src_n"),
      orderBy = Seq(
        QueryBuilder.Order("src_n", nullsFirst = Some(true)),
        QueryBuilder.Order("doc_id")),
      limit = Some(350)))
  }

  /** Q141 — TYPO-TOLERANT retrieval: [[q138FuzzyTerms]]'s candidates
    * collapse to one best correction per query term (min edit
    * distance, then alphabetical — deterministic), and the corrected
    * set scores through the UNCHANGED q77 BM25 chain. Uncorrectable
    * terms drop (no match within distance 1 — Hasura-style loudness is
    * wrong here: search engines degrade, they don't error). The
    * correction collect is bounded by the REQUEST's term count, never
    * the corpus. */
  def q141FuzzyBm25(s: SparkSession, dir: String,
      typos: Seq[String] = Seq("joinn", "windo", "hash"),
      k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("dist"), col("word"))
    val corrected = q138FuzzyTerms(s, dir, typos)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("word").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    q77Bm25Topk(s, dir, k, corrected)
  }

  /** Q142 — SCRIPT-CLASS histogram: per-document counts of Latin /
    * CJK / Cyrillic / digit characters and the Latin ratio — the
    * script-mix signal multilingual pipelines use next to lang-id
    * (q26) to catch mixed-script spam and mislabeled documents. A
    * multiscript prefix is synthesized so every class provably fires;
    * counts via the length-minus-stripped trick, which both engines
    * spell identically over literal-range character classes. Per-row,
    * no shuffle. */
  def q142ScriptMix(s: SparkSession, dir: String): DataFrame = {
    val synth = concat(lit("\u6570\u636e\u5904\u7406 " +
      "\u043f\u0440\u0438\u043c\u0435\u0440 "), col("text"))
    def cnt(c: org.apache.spark.sql.Column, cls: String) =
      (length(c) - length(regexp_replace(c, cls, ""))).cast("long")
    docs(s, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(300)
      .select(col("doc_id"), synth.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("n_chars"),
        cnt(col("raw"), "[A-Za-z]").as("n_latin"),
        cnt(col("raw"), "[\u4e00-\u9fff]").as("n_cjk"),
        cnt(col("raw"), "[\u0430-\u044f\u0410-\u042f\u0451\u0401]")
          .as("n_cyrillic"),
        cnt(col("raw"), "[0-9]").as("n_digit"),
        round(cnt(col("raw"), "[A-Za-z]").cast("double") /
          length(col("raw")), 4).as("latin_ratio"))
      .orderBy("doc_id")
  }

  def q59PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val synth = concat(lit("contact u"), col("doc_id"),
      lit("@example.com or admin@test.org "), col("text"))
    // pre-limit before the regex/md5 projection (cf. q60): the sort+limit
    // commutes with a per-row projection keyed on doc_id
    docs(s, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(300)
      .select(col("doc_id"), synth.as("raw"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailPattern), lit(0)))
          .cast("long").as("n_redacted"),
        md5(regexp_replace(col("raw"), emailPattern, "[EMAIL]"))
          .as("redacted_md5"))
      .orderBy("doc_id")
      .limit(300)
  }

  /** Q60 — duplicate n-gram fraction (the Gopher-style repetition signal
    * for corpus filtering): 1 − distinct/total word-3-grams per doc. The
    * WITHIN-document counterpart of the cross-document dedup operators. */
  def q60DupNgrams(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.functions.TextKernelExpressions
      .wordShinglesFast(col("text"), 3)
    // pre-limit BEFORE the shingle projection: orderBy+limit after it
    // would shingle the whole corpus for a 300-row answer (cf. q52)
    docs(s, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(400)
      .select(col("doc_id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_grams"),
        round(lit(1.0) - size(array_distinct(col("sh"))).cast("double") /
          size(col("sh")), 4).as("dup_frac"))
      .orderBy("doc_id")
      .limit(300)
  }

  /** Q62 — near-duplicate CLUSTERS: connected components over the q48
    * simhash pair graph, every document labeled with its cluster's
    * canonical (minimum) doc_id plus the cluster size. This is the step a
    * dedup pipeline actually acts on: pairs alone over-remove (for a~b,
    * b~c the pair list names b AND c as duplicates, but the cluster
    * {a,b,c} keeps exactly one canonical survivor).
    *
    * Distributed min-label propagation WITH pointer jumping: each round
    * takes label(v) ← min over v's neighborhood, then halves paths with
    * label(v) ← label(label(v)) — O(log diameter) rounds (chain-shaped
    * dup families make plain propagation O(diameter): the sf0.1 fixture
    * needs 10 plain rounds but 4 jumped ones). Each round is two
    * shuffle-joins + a groupBy, and its result is EAGERLY
    * localCheckpoint-ed: the next plan references the previous labels
    * more than once, so without lineage truncation the logical plan
    * doubles per round (persist alone does not truncate it). No
    * driver-side graph: at 100 TB the edge list and labels stay
    * distributed; only the per-round convergence COUNT comes back.
    * Oracle: DuckDB recursive-CTE transitive closure over the same pair
    * set.
    *
    * Small-graph fast path: the mined pair graph is orders of magnitude
    * smaller than the corpus (that is what LSH banding is FOR), so when
    * it fits one task a single-partition union-find replaces log-many
    * distributed rounds — each round is several job launches, which at
    * fixture scale costs more than the entire graph. The distributed
    * loop stays the >limit path; both produce identical labels
    * (spec-asserted). */
  def q62DupClusters(s: SparkSession, dir: String): DataFrame =
    dupClusters(s, dir, smallGraphLimit = 5000000L)

  private[graft] def dupClusters(s: SparkSession, dir: String,
      smallGraphLimit: Long): DataFrame =
    clusterOutput(s, dir,
      componentLabels(s, simhashPairsRaw(s, dir).select(col("a"), col("b")),
        smallGraphLimit))

  /** Q151 — dedup RETENTION policy: inside every near-dup cluster
    * (q62's components over the SimHash pair graph), keep the
    * highest-quality member — score = q27's unique-token ratio,
    * doc_id breaking ties — and report what was dropped. The step
    * between detecting duplicates and actually shrinking the corpus:
    * "fuzzy dedup, keep best" rather than keep-first. Covers only
    * clusters (docs appearing in a pair); singletons are trivially
    * kept and stay out of the report.
    *
    * Scale posture: component labels are the audited q62 engine; the
    * keep decision is one row_number window + fold on the SAME
    * cluster key (the window's hash shuffle is reused by the
    * groupBy), nothing corpus-squared. */
  def q151DedupRetention(s: SparkSession, dir: String): DataFrame = {
    // the pair graph + its component labels are the DETECT step's
    // output (benched honestly as q48/q62); retention consumes them
    // as a once-per-process fixture and measures the KEEP policy
    val labels = graft.FixtureCache.once(s, s"simhash_labels|$dir") {
      componentLabels(s,
        simhashPairsRaw(s, dir).select(col("a"), col("b")))
        .localCheckpoint(true)
    }
    val toks = tokens(col("text"))
    val scored = docs(s, dir).select(col("doc_id").as("key"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("score"))
    // the SHARED keep-best policy (graft.operators.Retention) — one
    // retention operator across text/image/audio clusters
    graft.operators.Retention.keepBest(
      labels.select(col("id").as("key"), col("label").as("canonical")),
      scored)
      .select(col("canonical"), col("kept_key").as("kept_doc"),
        col("kept_score"), col("n_dropped"))
  }

  /** Connected-component labels over an undirected pair graph: one row
    * per node that appears in a pair, `label` = minimum id reachable from
    * it (the component canonical). Generic over any (a, b) pair source —
    * simhash pairs for q62, embedding-LSH pairs for q67. */
  private[graft] def componentLabels(s: SparkSession, pairs: DataFrame,
      smallGraphLimit: Long = 5000000L): DataFrame = {
    import s.implicits._
    val ab = pairs.toDF("a", "b")
    // LAZY checkpoint + count in one action (r22, guide §1.5): the
    // eager form ran one job to materialize the edge blocks and a
    // second to count them; count() on the lazy checkpoint does both
    // in a single job. Every dup-clusters key pays this path.
    val edges = ab.union(ab.select(col("b"), col("a")))
      .toDF("id", "nb").localCheckpoint(eager = false)
    if (edges.count() <= smallGraphLimit) {
      val labels = edges.repartition(1).as[(Long, Long)]
        .mapPartitions { it =>
          val parent = scala.collection.mutable.HashMap.empty[Long, Long]
          def find(x0: Long): Long = {
            var x = x0
            while (parent.getOrElse(x, x) != x) x = parent(x)
            var y = x0 // path compression
            while (parent.getOrElse(y, y) != y) {
              val n = parent(y); parent(y) = x; y = n
            }
            x
          }
          it.foreach { case (a, b) =>
            parent.getOrElseUpdate(a, a)
            parent.getOrElseUpdate(b, b)
            val ra = find(a); val rb = find(b)
            if (ra != rb) parent(ra) = rb
          }
          val nodes = parent.keys.toArray
          val minOf = scala.collection.mutable.HashMap.empty[Long, Long]
          nodes.foreach { v =>
            val r = find(v)
            if (v < minOf.getOrElse(r, Long.MaxValue)) minOf(r) = v
          }
          nodes.iterator.map(v => (v, minOf(find(v))))
        }.toDF("id", "label")
      q62LastRounds = 0
      labels
    } else propagateLabels(edges)
  }

  /** The distributed min-label/pointer-jump loop (the >1-task path). */
  private def propagateLabels(edges: DataFrame): DataFrame = {
    var labels = edges.select(col("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val prop = edges
        .join(labels.select(col("id").as("nb"), col("label").as("nl")), "nb")
        .groupBy("id").agg(min("nl").as("nl"))
      // carry the previous label inside the round's frame: convergence is
      // a filter over the checkpointed result, not another join
      val stepped = labels.join(prop, Seq("id"), "left")
        .select(col("id"), col("label").as("_old"),
          least(col("label"), coalesce(col("nl"), col("label")))
            .as("label"))
      // pointer jump (path halving): a label is always another node's id,
      // so label(label(v)) is one more self-join; min-labels only shrink,
      // so the jump never overshoots the component minimum
      val next = stepped.join(
          stepped.select(col("id").as("_lid"), col("label").as("_ll")),
          col("label") === col("_lid"), "left")
        .select(col("id"), col("_old"),
          coalesce(col("_ll"), col("label")).as("label"))
        // lazy: the convergence count below materializes the checkpoint
        // in the SAME action (guide §1.5 — one job per round, not two);
        // next round's joins then read the materialized blocks
        .localCheckpoint(eager = false)
      changed = next.filter(col("label") < col("_old")).count()
      labels = next.drop("_old")
      rounds += 1
    }
    if (changed > 0)
      // never silent: unconverged labels would split connected components
      throw new IllegalStateException(
        s"label propagation did not converge in $rounds rounds " +
          s"($changed labels still moving)")
    q62LastRounds = rounds
    labels
  }

  /** Join cluster labels back to the full corpus: singletons are their
    * own canonical; cluster_size counts members per canonical. */
  private def clusterOutput(s: SparkSession, dir: String,
      labels: DataFrame): DataFrame = {
    val out = docs(s, dir).select(col("doc_id"))
      .join(labels.select(col("id").as("doc_id"),
        col("label").as("_canon")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_canon"), col("doc_id")).as("canonical"))
    out.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("canonical"))))
      .orderBy("doc_id")
  }

  /** Q63 — corpus mixing to a per-language token budget: the data-mixing
    * step of a training pipeline (rebalance languages/domains before
    * training). Docs are admitted per language in DETERMINISTIC hash
    * order (content-stable like q54/q55 — never rand()) until the
    * language's cumulative token count hits the budget; output is the
    * realized mix. One window + one aggregate, partitioned by lang — at
    * 100 TB the per-lang window sort is the only shuffle, and the hash
    * order means re-runs and engines agree row-for-row. */
  def q63CorpusMix(s: SparkSession, dir: String,
      budget: Long = 3000): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      size(tokens(col("text"))).cast("long").as("ntok"),
      seededHash(col("doc_id").cast("string"), 1).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    d.withColumn("cum", sum(col("ntok")).over(w))
      .filter(col("cum") <= budget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .orderBy("lang")
  }

  /** Q157 — TEMPERATURE-weighted corpus mixing (the multilingual-LM
    * resampling rule: language budgets ∝ size^α, α = 0.5 — upweights
    * low-resource languages relative to proportional sampling without
    * q63's hand-set per-language budgets). Budgets derive from the
    * corpus itself: budget_l = ⌊T · √n_l / Σ√n_m⌋ over token counts,
    * then q63's deterministic hash-order admission per language up to
    * the budget. √ (not pow(·, α)) keeps each weight IEEE-exact on
    * both engines; Σ√n however SUMS in engine-dependent order, so a
    * 1-ulp z difference could flip the floor exactly at an integer
    * boundary — the share is therefore rounded to 9 decimals first
    * (absorbs ulp noise; a boundary within 1e-16 of a half-1e-9 is
    * not a real corpus). The budget table is languages-sized —
    * broadcast — and the admission is the same one window per
    * language. */
  def q157TemperatureMix(s: SparkSession, dir: String,
      total: Long = 5000): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      size(tokens(col("text"))).cast("long").as("ntok"),
      seededHash(col("doc_id").cast("string"), 1).as("h"))
    val langTok = d.groupBy("lang")
      .agg(sum(col("ntok")).cast("double").as("n_l"))
      .withColumn("wr", sqrt(col("n_l")))
    val z = langTok.agg(sum(col("wr")).as("z"))
    val budgets = broadcast(langTok.crossJoin(z)
      .select(col("lang"),
        floor(lit(total.toDouble) * round(col("wr") / col("z"), 9))
          .cast("long").as("budget")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    d.join(budgets, "lang")
      .withColumn("cum", sum(col("ntok")).over(w))
      .filter(col("cum") <= col("budget"))
      .groupBy("lang", "budget")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .orderBy("lang")
  }

  /** Q64 — benchmark decontamination: flag corpus docs sharing ANY word
    * 5-gram with the eval set (stand-in: doc_id < 10) — the standard
    * leakage guard before training. Inverted-index shape: explode both
    * sides to (doc, shingle), broadcast the tiny distinct eval-shingle
    * set, count distinct shared shingles per corpus doc. Never a
    * corpus×eval scan; the only shuffle is the final per-doc groupBy. */
  def q64Decontaminate(s: SparkSession, dir: String,
      n: Int = 5): DataFrame = {
    import graft.functions.TextKernelExpressions.wordShinglesFast
    val evalSh = docs(s, dir).filter(col("doc_id") < 10)
      .select(explode(wordShinglesFast(col("text"), n)).as("sh")).distinct()
    val corpus = docs(s, dir).filter(col("doc_id") >= 10)
      .select(col("doc_id"), explode(wordShinglesFast(col("text"), n)).as("sh"))
    corpus.join(broadcast(evalSh), Seq("sh"))
      .groupBy("doc_id").agg(count_distinct(col("sh")).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Q65 — sequence packing: lay documents out into fixed-budget context
    * windows ("packs") for training, the concat-and-chunk step that
    * follows corpus mixing (q63). The corpus is sharded by a
    * content-stable hash; within a shard docs are placed in deterministic
    * hash order and a doc belongs to the pack where it STARTS (greedy
    * boundary packing — docs straddle pack boundaries and are split at
    * tokenization time, the standard dense layout: zero padding waste,
    * unlike first-fit whole-doc packing). Output: per-pack doc/token
    * counts.
    *
    * Scale posture: the only shuffle is the per-shard window sort, and
    * shards are the parallelism unit — at 100 TB raise `shards` to a
    * multiple of the cluster's cores and each shard sorts independently;
    * there is no global order and no driver state. Hash sharding/order
    * makes the layout reproducible across engines and re-runs (never
    * rand(), like q54/q55). */
  def q65SeqPack(s: SparkSession, dir: String, budget: Long = 2048,
      shards: Int = 8): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ntok"),
        seededHash(col("doc_id").cast("string"), 5).as("h"))
      // seededHash is a 60-bit non-negative long, so % is already pmod
      .withColumn("shard", (col("h") % shards).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col("doc_id"))
    d.withColumn("strt", sum(col("ntok")).over(w) - col("ntok"))
      .withColumn("pack_id", floor(col("strt") / budget))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .orderBy("shard", "pack_id")
  }

  /** Q74 — CONTAINMENT detection (asymmetric near-dup): score
    * |A∩B| / min(|A|,|B|) over trigram shingle sets — the doc-inside-doc
    * signal (quotes, supersets, partial mirrors) that symmetric Jaccard
    * under-scores, so a length-bucketed blocking key (q32's) cannot be
    * used: containment pairs differ in length by construction.
    *
    * Scale posture: same sparse inverted-index join as q32 (only pairs
    * sharing a shingle are scored), blocked by language. The hot-key
    * guard is a STOP-SHINGLE cap (document frequency ≤ maxDf): the
    * postings lists that explode quadratically at scale are exactly the
    * boilerplate shingles that carry no discriminating signal, so they
    * are dropped from the intersection (set sizes stay uncapped; the
    * oracle applies the identical cap). */
  def q74Containment(s: SparkSession, dir: String, threshold: Double = 0.8,
      maxDf: Int = 100): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
        graft.functions.TextKernelExpressions
          .hashedShinglesFast(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Materialize.pin)
    val sizes = d.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = d.select(col("doc_id"), col("lang"), explode(col("sh")).as("h"))
    val kept = ex.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("h")
    // pinned: both sides of the self-join consume exk; without the pin
    // the explode+df-join subtree executes once per side (the two
    // aliases shuffle on different key sets — (lang,h) vs the join's
    // build side — so ReuseExchange does not fire; the probe showed 6
    // scans / 0 reuses)
    val exk = Materialize.pin(ex.join(kept, "h"))
    val shared = exk.as("x").join(exk.as("y"),
        col("x.lang") === col("y.lang") && col("x.h") === col("y.h")
          && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("n", "nb"), "b")
      .select(col("a"), col("b"),
        round(col("c").cast("double") / least(col("na"), col("nb")), 4)
          .as("containment"))
      .filter(col("containment") >= threshold)
      .orderBy("a", "b")
  }

  /** Q75 — boilerplate detection: the 50-token windows (q73's chunks)
    * whose content fingerprint recurs across ≥ 2 documents — the
    * repeated-header/footer/mirror signal a cleaning pipeline strips
    * corpus-wide (the chunk-level complement of doc-level dedup).
    *
    * Scale posture: one groupBy on the uniform md5 fingerprint over
    * q73's zero-shuffle chunk stream (EliminateSorts drops q73's
    * presentation sort under the aggregate — spec-pinned pattern). */
  def q75Boilerplate(s: SparkSession, dir: String): DataFrame =
    q73Chunks(s, dir)
      .groupBy("chunk_fp")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("chunk_fp"))

  /** Exact n-gram Jaccard similarity for candidate pairs that share a
    * cheap blocking key (same lang + same token-count bucket), so the
    * pair space stays linear-ish instead of O(n²). */
  def q32NgramJaccard(s: SparkSession, dir: String,
      threshold: Double = 0.2): DataFrame = {
    // Sparse inverted-index join: |A∩B| is counted by an equi-join on the
    // shingle hash, so only pairs that actually share a shingle are ever
    // scored (a pair with no shared shingle has jaccard 0 < threshold in the
    // oracle too — identical result set). The shuffle key is the shingle
    // hash, which is uniform — the 100 TB-safe plan; the dense
    // array_intersect-per-candidate-pair formulation was quadratic per
    // (lang, bucket) block. Shingles hashed to longs (collision odds ~2^-64
    // per in-bucket pair, so Jaccard VALUES match the string-set oracle).
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      graft.functions.TextKernelExpressions
        .hashedShinglesFast(col("text"), 3).as("sh"),
      floor(size(tokens(col("text"))) / 32).cast("int").as("bucket"))
      .filter(size(col("sh")) > 0)
      .transform(Materialize.pin)
    val sizes = d.select(col("doc_id"), col("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"))
    val ex = d.select(col("doc_id"), col("lang"), col("bucket"),
      explode(col("sh")).as("h"))
    val shared = ex.as("x").join(ex.as("y"),
        col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket")
          && col("x.h") === col("y.h")
          && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("n", "nb"), "b")
      .select(col("a"), col("b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** Q66 — count-based bigram-LM quality score: train a corpus-level
    * Laplace-smoothed bigram model in one pass (unigram + bigram count
    * tables), then score every document by its cross-entropy under that
    * model — the perplexity-style quality filter of a training-data
    * pipeline (very low probability = gibberish, very high =
    * boilerplate), expressed entirely in count joins so any engine
    * reproduces it bit-for-bit.
    *
    * Scale posture: the model IS a DataFrame (vocab-sized, distributed —
    * never a driver-side dictionary). The per-bigram negative log-prob is
    * a function of the bigram alone, so it is FOLDED INTO THE MODEL
    * first (distinct-bigram-sized joins between the two count tables);
    * the full probe stream then pays exactly ONE shuffle join on the
    * bigram key plus the per-doc aggregate. Stopword-grade hot keys skew
    * the probe side, but the model side is unique per key, so AQE's
    * skew-join split applies cleanly; the top-k hottest bigrams could
    * also ride a broadcast side-table (SkewJoin's hot/cold split) at
    * 100 TB. |V| is the one scalar (a count, like q11's). */
  def q66LmXent(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // pinned: uni feeds the |V| count AND the model join; bg feeds the
    // model aggregate AND the probe — without materialization each
    // consumer re-scans and re-tokenizes the corpus (the exchanges
    // differ, so ReuseExchange cannot dedupe them)
    val uni = d.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .transform(Materialize.pin)
    val vocab = uni.count() // |V| for the Laplace denominator
    val bg = d.select(col("doc_id"), explode(graft.functions
        .TextKernelExpressions.wordShinglesFast(col("text"), 2)).as("bg"))
      .transform(Materialize.pin)
    val model = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .select(col("bg"),
        (-log((col("c12") + lit(1.0)) / (col("c1") + lit(vocab.toDouble))))
          .as("_nll"))
    bg.join(model, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), avg(col("_nll")).as("_x"))
      .select(col("doc_id"), col("n_bigrams"),
        format_string("%.3f", round(col("_x"), 3)).as("xent"))
      .orderBy("doc_id")
  }

  /** Q68 — tf-idf top-k terms per document (domain/topic signal for
    * corpus analysis and mixing decisions). The document-frequency table
    * is derived from the tf table (one extra aggregate, no second scan);
    * scoring joins on the term key and ranks per doc. The ranking key is
    * the score ROUNDED to 6 decimals: mathematically equal scores from
    * different (tf, df) pairs — e.g. 1·ln(2500) vs 2·ln(50) — can differ
    * by an ulp between engines' ln implementations, and rounding
    * collapses that before the term-string tiebreak, so the ranking is
    * engine-stable.
    *
    * Scale posture: two-phase aggregates + one vocab-keyed shuffle join
    * (same skew story as q66) + a per-doc window over ≤vocab rows. N is
    * a count scalar. */
  def q68TfidfTopk(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val d = docs(s, dir)
    val nDocs = d.count()
    // pinned: tf feeds BOTH the df aggregate and the scoring join, and
    // the two consumers shuffle on different keys ((doc_id,w) vs w), so
    // ReuseExchange cannot dedupe them — without the pin the corpus is
    // scanned and tokenized twice (same reasoning as q66's model pin)
    val tf = d.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .transform(Materialize.pin)
    val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("_score").desc, col("w"))
    // broadcast the VOCABULARY-sized df table explicitly: AQE's
    // stats-based pick broadcast the (corpus-sized, merely
    // locally-small) cached tf side instead — a per-run 500k-row
    // driver collect + hash build here, an OOM at corpus scale
    tf.join(broadcast(dfc), "w")
      .withColumn("_score",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("w").as("term"),
        format_string("%.3f", round(col("_score"), 3)).as("score"))
      .orderBy("doc_id", "rk")
  }

  /** Q69 — quality-filter funnel with audit counts: the Gopher-style
    * rule cascade (length bounds → mean word length → English stopword
    * presence → vocabulary-uniqueness ratio) applied cumulatively, with
    * the survivor count after each stage — the per-stage audit a
    * production filtering pipeline publishes so a rule that nukes the
    * corpus is visible immediately.
    *
    * Scale posture: ONE scan; every stage predicate is a narrow
    * projection and the funnel is a single partial-aggregated fold to
    * one row (then stack()ed into presentation rows) — no shuffle of
    * document data at any width, so it runs at scan speed at 100 TB. */
  def q69FilterFunnel(s: SparkSession, dir: String): DataFrame =
    funnelCounts(docs(s, dir))
      .select(expr(
        "stack(5, 0, 'input', n0, 1, 'length', n1, 2, 'word_len', n2, " +
          "3, 'stopword_en', n3, 4, 'uniq_ratio', n4) " +
          "AS (stage_id, stage, n_kept)"))
      .orderBy("stage_id")

  /** The funnel's one-row cumulative survivor counts (n0..n4) — shared
    * by q69 and its streaming twin (the sums are trivially mergeable, so
    * the same fold runs as a complete-mode streaming aggregate). */
  private[graft] def funnelCounts(d0: DataFrame): DataFrame = {
    val d = d0.select(
      size(tokens(col("text"))).cast("double").as("nt"),
      col("n_chars").cast("double").as("nc"),
      size(array_distinct(tokens(col("text")))).cast("double").as("uq"),
      lower(col("text")).as("lt"))
    val s1 = col("nt") >= 20 && col("nt") <= 5000
    val s2 = col("nc") / col("nt") >= 2.0 && col("nc") / col("nt") <= 6.0
    val s3 = col("lt").contains(" the ")
    val s4 = col("uq") / col("nt") >= 0.4
    def kept(c: org.apache.spark.sql.Column) =
      sum(when(c, lit(1L)).otherwise(lit(0L)))
    d.agg(
      count(lit(1)).as("n0"), kept(s1).as("n1"), kept(s1 && s2).as("n2"),
      kept(s1 && s2 && s3).as("n3"), kept(s1 && s2 && s3 && s4).as("n4"))
  }

  /** Q70 — duplication ATTRIBUTION: fold the mined near-dup pair graph
    * (q48's simhash pairs) back onto document provenance, counting pairs
    * per unordered source pair — the diagnostic that tells a corpus
    * owner WHICH feeds copy from each other (mirror sites, scraper
    * overlap) and therefore which source-level dedup rules to add
    * upstream.
    *
    * Scale posture: the pair graph is LSH-mined (orders of magnitude
    * smaller than the corpus), so both provenance joins shuffle only
    * pair rows against the (doc_id, source) projection; the final
    * aggregate is source-cardinality-sized. */
  def q70DupSources(s: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairsRaw(s, dir).select(col("a"), col("b"))
    val src = docs(s, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("a"), col("source").as("sa")), "a")
      .join(src.select(col("doc_id").as("b"), col("source").as("sb")), "b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** Q71 — per-language document-length profile: exact interpolated
    * percentiles (p50/p90/p99) of the token count per language — the
    * corpus-profiling step that drives packing budgets (q65) and length
    * filters (q69).
    *
    * Scale posture: exact percentile sorts each group's values, which is
    * the right tool only while groups fit a partition; the 100 TB path
    * is `approx_percentile` (a mergeable t-digest-style sketch, pure
    * map-side + one tiny merge) — the spec pins the sketch to within 5%
    * of these exact values, with a 1-token floor because the sketch
    * returns actual elements while the exact form interpolates between
    * them, so the swap is a one-liner. The %.2f render keeps
    * interpolation FP out of the comparison hash. */
  def q71LenProfile(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("double").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        format_string("%.2f",
          round(expr("percentile(nt, 0.5)"), 2)).as("p50"),
        format_string("%.2f",
          round(expr("percentile(nt, 0.9)"), 2)).as("p90"),
        format_string("%.2f",
          round(expr("percentile(nt, 0.99)"), 2)).as("p99"))
      .orderBy("lang")

  /** Q162 — IQR OUTLIER FENCES per language (the Tukey rule the
    * quality-filter stage uses to prune length outliers without
    * hand-set thresholds): fences = Q1/Q3 ∓ 1.5·IQR over token
    * counts, then the count of docs outside them. Exact interpolated
    * quantiles (the q71 cross-engine percentile contract), one
    * corpus pass for the quartiles + one for the fence counts —
    * joined on the languages-sized fence table (broadcast). */
  def q162OutlierFences(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("double")
        .as("nt"))
    val fences = d.groupBy("lang")
      .agg(expr("percentile(nt, 0.25)").as("q1"),
        expr("percentile(nt, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
    d.join(broadcast(fences), "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("nt") < col("lo") || col("nt") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("lo")), 4).as("lo"),
        round(max(col("hi")), 4).as("hi"))
      .orderBy("lang")
  }

  /** The sketch twin of [[q71LenProfile]] (the actual 100 TB plan). */
  def q71Approx(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("double").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(nt, 0.5, 10000)").as("p50"),
        expr("approx_percentile(nt, 0.9, 10000)").as("p90"),
        expr("approx_percentile(nt, 0.99, 10000)").as("p99"))
      .orderBy("lang")

  /** Q73 — document chunking: fixed-size token windows with stride
    * overlap (the retrieval/embedding prep step that follows cleaning),
    * each chunk carrying a content-addressed md5 fingerprint so
    * downstream chunk-level dedup and stable chunk identity come free.
    * Every doc yields ceil(nt/stride) chunks; the last window truncates.
    *
    * Scale posture: narrow per-doc projection (window starts come from a
    * bounded `sequence`, chunks from `slice`) — zero shuffle before the
    * presentation sort; fingerprints are uniform hash keys for any
    * downstream chunk-dedup groupBy. */
  def q73Chunks(s: SparkSession, dir: String, win: Int = 50,
      stride: Int = 25): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      // a null-text doc yields no chunks (matches the oracle, where the
      // null propagates into range() and unnests to zero rows); without
      // this, Spark's null-skipping least/greatest would fabricate a
      // phantom 50-token chunk of md5("")
      .filter(col("tk").isNotNull)
      .select(col("doc_id"), size(col("tk")).as("nt"), col("tk"))
      .select(col("doc_id"), col("nt"), col("tk"),
        explode(sequence(lit(0), greatest(col("nt") - 1, lit(0)),
          lit(stride))).as("st"))
      .select(col("doc_id"),
        (col("st") / stride).cast("long").as("chunk_id"),
        least(lit(win), col("nt") - col("st")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(col("tk"), col("st") + 1, lit(win))))
          .as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")

  /** Q72 — BPE merge-candidate mining (the first merge iteration of
    * byte-pair-encoding vocabulary induction): the top-k most frequent
    * adjacent character pairs across the corpus, each occurrence
    * weighted by how often its word occurs.
    *
    * Scale posture: pair counting runs over the DISTINCT-WORD frequency
    * table, not the raw corpus — exactly how production BPE trainers
    * scale (corpus → word-count table once, then every merge iteration
    * is vocab-sized). Two two-phase aggregates; the final ranked top-k
    * windows over the aggregated pair table, whose cardinality is
    * bounded by alphabet² — tiny by construction at any corpus size.
    * The corpus is scanned once. */
  def q72BpePairs(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val wc = docs(s, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val pairs = wc
      .select(col("c"), explode(
        when(length(col("w")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))))
        .as("pair"))
    pairs.groupBy("pair").agg(sum(col("c")).as("cnt"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("pair"), col("cnt"))
      .orderBy("rank")
  }

  /** Q77 — Okapi BM25 top-k retrieval (k1=1.2, b=0.75) for a fixed query
    * term set — the lexical-retrieval primitive a training-data pipeline
    * uses for targeted corpus search and RAG-style evidence pull, one
    * step up from q68's tf-idf (BM25 adds document-length normalization
    * and the saturating tf term).
    *
    * Engine stability: like q68, the ranking key is the score rounded to
    * 6 decimals (ln/÷ can differ by an ulp across engines) and every
    * float constant is written as the same decimal literal both here and
    * in the oracle SQL, so both engines parse the identical double.
    *
    * Scale posture: the corpus is scanned once, projected to
    * (doc_id, dl, token) and FILTERED to the query terms before any
    * shuffle — the aggregate and join see query-term postings only (the
    * inverted-index access pattern, without materializing an index).
    * The per-term df table is query-term-sized and broadcast; avgdl and
    * N are driver scalars from a narrow second scan (two column-pruned
    * reads beat shuffling doc lengths for all docs). Top-k is a sort of
    * the per-doc aggregate, which TakeOrderedAndProject bounds. */
  def q77Bm25Topk(s: SparkSession, dir: String, k: Int = 20,
      qTerms: Seq[String] = Seq("join", "hash", "window")): DataFrame = {
    val d = docs(s, dir)
    // two driver scalars over one narrow pass (no token row explosion)
    val stats = d
      .agg(count(lit(1)).cast("double").as("n"),
        avg(size(tokens(col("text")))).as("avgdl"))
      .head
    val nDocs = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = d
      .select(col("doc_id"), size(tokens(col("text"))).cast("double").as("dl"),
        explode(tokens(col("text"))).as("w"))
      .filter(col("w").isin(qTerms: _*))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).cast("double").as("tf"))
    bm25Rank(tf, nDocs, avgdl, k)
  }

  /** THE BM25 scorer/ranker — q77's scan path and
    * `graft.search.InvertedIndex.search` both rank through this single
    * definition, so their spec-pinned row-identity (and the shared
    * DuckDB oracle) hold by construction instead of by hand-synchronized
    * copies. `postings`: (doc_id, dl double, w, tf double).
    *
    * Top-k FIRST via orderBy+limit (TakeOrderedAndProject —
    * per-partition heaps, never a global sort); the rank window then
    * runs over k rows, not a single-partition shuffle of every scored
    * document. */
  private[graft] def bm25Rank(postings: DataFrame, nDocs: Double,
      avgdl: Double, k: Int): DataFrame = {
    val dfc = postings.groupBy("w")
      .agg(count(lit(1)).cast("double").as("df"))
    val topk = postings.join(broadcast(dfc), "w")
      .withColumn("_idf",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("_c",
        col("_idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
      .groupBy("doc_id").agg(round(sum(col("_c")), 6).as("_score"))
      .orderBy(col("_score").desc, col("doc_id")).limit(k)
    topk
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("_score").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"),
        format_string("%.3f", round(col("_score"), 3)).as("bm25"))
      .orderBy("rank")
  }

  /** Conjunctive (AND) BM25 ranker — q88's scan path and
    * `graft.search.InvertedIndex.searchConjunctive` both rank through
    * this single definition (the [[bm25Rank]] sharing pattern). Only
    * documents matching ALL `nTerms` distinct query terms survive into
    * scoring; df is therefore the per-term document frequency within
    * the conjunctive candidate set — self-consistent and
    * oracle-replayable. The membership check is one window over the
    * (already query-term-pruned) postings slice: no second corpus scan,
    * no join. */
  private[graft] def bm25AndRank(postings: DataFrame, nTerms: Int,
      nDocs: Double, avgdl: Double, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val conj = postings
      .withColumn("_nw", size(collect_set(col("w")).over(w)))
      .filter(col("_nw") === nTerms)
      .drop("_nw")
    bm25Rank(conj, nDocs, avgdl, k)
  }

  /** Phrase BM25 ranker — q89's index probe and the scan twin rank
    * through this single definition. `postings` must carry the sorted
    * position list per (doc, term) (the format-v2 positional layout);
    * the phrase's in-order adjacent occurrence count becomes the tf of
    * ONE virtual term (w = the phrase string), which then scores
    * through the unchanged [[bm25Rank]] — df is the number of documents
    * containing the phrase at least once. The adjacency fold runs
    * entirely inside the query-term-pruned slice: per doc it is
    * |positions(t0)| membership probes per extra term, never a token
    * re-scan. */
  private[graft] def bm25PhraseRank(postings: DataFrame,
      terms: Seq[String], nDocs: Double, avgdl: Double,
      k: Int): DataFrame = {
    val n = terms.size
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      first(when(col("w") === t, col("pos")), ignoreNulls = true)
        .as(s"_p$i")
    }
    val byDoc = postings.filter(col("w").isin(terms.distinct: _*))
      .groupBy("doc_id", "dl")
      .agg(perTerm.head, perTerm.tail: _*)
      .filter(terms.indices.map(i => col(s"_p$i").isNotNull)
        .reduce(_ && _))
    val matches = (1 until n).foldLeft(col("_p0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"_p$i"), p + i))
    }
    val virtual = byDoc
      .select(col("doc_id"), col("dl"),
        lit(terms.mkString(" ")).as("w"),
        size(matches).cast("double").as("tf"))
      .filter(col("tf") > 0)
    bm25Rank(virtual, nDocs, avgdl, k)
  }

  /** Q78 — top-k most frequent tokens via Misra-Gries candidate pruning:
    * the sketch pass folds every partition into a capacity-bounded
    * counter map ([[graft.functions.FrequencyFunctions]]) so only
    * capacity-sized summaries cross the wire; the exact pass re-counts
    * ONLY the survivors (broadcast semi-join — survivors ≤ capacity
    * rows) and ranks them. Same prune-then-confirm shape as q76's
    * bloom: the sketch sheds the vocabulary tail before any shuffle,
    * the exact pass makes the answer exact.
    *
    * Exactness: every token with frequency > n/(capacity+1) is in the
    * sketch (MG bound), so when the k-th ranked SURVIVOR's exact count
    * clears that threshold, survivors ⊇ true top-k and the re-count
    * ranks them exactly — any non-survivor sits at-or-under the
    * threshold, strictly below the k-th survivor. That precondition is
    * VALIDATED AT RUNTIME here (n rides out of the same sketch pass as
    * one extra count column): if data drift ever pushes the k-th count
    * to the bound — or fewer than k survivors remain — the query falls
    * back to the exact full group-by instead of silently returning a
    * wrong top-k. FrequencyFunctionsSpec checks the bound adversarially;
    * the fixture never triggers the fallback, so the benched plan is
    * the sketch one. At 100 TB a full `groupBy(token)` shuffles the
    * billions-of-distinct-tokens vocabulary; this plan shuffles ≤
    * capacity summaries plus ≤ capacity re-count groups (the survivor
    * re-count filter is an IN over ≤ capacity literals applied before
    * the re-count's shuffle). */
  def q78HeavyHitters(s: SparkSession, dir: String, k: Int = 20,
      capacity: Int = 256): DataFrame = {
    val sket = q78Sketch(s, dir, capacity).head
    val n = sket.getLong(1)
    val cand = sket.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getAs[String]("w")).toSeq
    val survivors = q78Recount(s, dir, cand, k)
      .collect() // ≤ k rows — the query's whole result, driver-small
    val exact = survivors.length == k &&
      survivors.last.getLong(1).toDouble > n.toDouble / (capacity + 1)
    if (exact) {
      import s.implicits._
      survivors.toSeq.zipWithIndex
        .map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }
        .toDF("rank", "w", "cnt")
    } else { // bound not met: the sketch may have shed a true top-k token
      val full = docs(s, dir)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(k)
      full.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("w"))).cast("long"))
        .select(col("rank"), col("w"), col("cnt"))
        .orderBy("rank")
    }
  }

  /** q78's first distributed stage (exposed for plan audits): ONE sketch
    * pass carrying both the MG summary and the stream length n the
    * exactness bound needs. */
  private[graft] def q78Sketch(s: SparkSession, dir: String,
      capacity: Int): DataFrame = {
    import graft.functions.FrequencyFunctions.misraGries
    docs(s, dir).select(explode(tokens(col("text"))).as("w"))
      .agg(misraGries(col("w"), capacity).as("mg"), count(lit(1)).as("n"))
  }

  /** q78's second distributed stage (exposed for plan audits): exact
    * re-count of the ≤ capacity sketch survivors — a broadcast semi-join
    * prunes the token stream before its only shuffle. */
  private[graft] def q78Recount(s: SparkSession, dir: String,
      cand: Seq[String], k: Int): DataFrame = {
    import s.implicits._
    docs(s, dir).select(explode(tokens(col("text"))).as("w"))
      .join(broadcast(cand.toDF("w")), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(k)
  }

  // learned merge lists are deterministic per (dir, nMerges): train once
  // per JVM, reuse across Verify/Bench calls (a deployment trains the
  // tokenizer offline and applies it to every corpus pass)
  private val bpeMergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  /** Q80 — BPE tokenization with a TRAINED vocabulary: the apply side of
    * the tokenizer story (q72 mines merge candidates, `BpeTrainer` learns
    * the ordered merge list, this query runs it over the corpus and
    * reports real-vocab token counts next to the whitespace count — the
    * numbers a training pipeline budgets context windows and compute
    * with).
    *
    * Scale posture: training is vocab-sized (never re-reads the corpus)
    * and cached per JVM; the encode pass is ONE narrow scan through the
    * codegen'd [[graft.functions.TextKernelExpressions.BpeEncode]]
    * kernel (merge list rides as a codegen reference object), no
    * shuffle before the final doc_id sort. Not SQL-replicable (the
    * training loop) → rows-only driver check; BpeTrainerSpec pins the
    * kernel's equivalence with the trained segmentation. */
  def q80BpeEncode(s: SparkSession, dir: String,
      nMerges: Int = 30): DataFrame = {
    val merges = bpeMergeCache.computeIfAbsent(s"$dir#$nMerges",
      _ => graft.operators.BpeTrainer.train(docs(s, dir), nMerges)._1)
    docs(s, dir).select(col("doc_id"),
        size(graft.functions.TextKernelExpressions
          .bpeEncode(col("text"), merges)).cast("long").as("n_bpe_tokens"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"))
      .orderBy("doc_id")
  }

  // one inverted-index build per (JVM, dir) — a deployment builds the
  // index offline and probes it many times (same policy as q79's PQ index)
  private val invBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Q82 — BM25 over the PERSISTED inverted index
    * ([[graft.search.InvertedIndex]]): identical rows to q77 (same
    * constants, rank key and tie-break — they share the DuckDB oracle),
    * but served from the bucket-partitioned postings layout: the probe
    * reads only the query terms' term-hash buckets (file-listing
    * pruning) with the term IN-filter pushed into the parquet scan, and
    * document length rides denormalized in each posting so scoring
    * never joins a doc-length table. At 100 TB q77 re-scans the corpus
    * per query; this touches |terms|/nBuckets of an index that is a
    * fraction of corpus size. */
  def q82Bm25Indexed(s: SparkSession, dir: String, k: Int = 20,
      qTerms: Seq[String] = Seq("join", "hash", "window")): DataFrame =
    graft.search.InvertedIndex.search(s, sharedIndex(s, dir), qTerms, k)

  /** The per-JVM shared index q82/q89 probe (built once per dir). The
    * index root derives from the `graft.index.dir` session conf,
    * falling back to the JVM temp dir — never a hardcoded repo path. */
  private def sharedIndex(s: SparkSession, dir: String): String = {
    val root = s.conf.get("graft.index.dir",
      sys.props.getOrElse("java.io.tmpdir", "/tmp")).stripSuffix("/")
    val path = s"$root/graft_inv_index_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    invBuilt.computeIfAbsent(path, _ => {
      graft.search.InvertedIndex.build(docs(s, dir), path)
      true
    })
    path
  }

  /** Q88 — conjunctive (AND) BM25: q77's corpus, constants and ranking,
    * restricted to documents containing EVERY query term — the
    * retrieval semantics users actually type (all words must appear),
    * where q77/q82 score any-term bag matches. Ranks through
    * [[bm25AndRank]], the definition the index probe
    * (`InvertedIndex.searchConjunctive`) also uses — spec-pinned
    * row-identical. Scale posture is q77's: the corpus scan projects
    * and filters to query-term postings before any shuffle; the AND
    * membership check is one window over that slice. */
  def q88Bm25And(s: SparkSession, dir: String, k: Int = 20,
      qTerms: Seq[String] = Seq("join", "hash", "window")): DataFrame = {
    val d = docs(s, dir)
    val stats = d
      .agg(count(lit(1)).cast("double").as("n"),
        avg(size(tokens(col("text")))).as("avgdl"))
      .head
    val tf = d
      .select(col("doc_id"), size(tokens(col("text"))).cast("double").as("dl"),
        explode(tokens(col("text"))).as("w"))
      .filter(col("w").isin(qTerms.distinct: _*))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).cast("double").as("tf"))
    bm25AndRank(tf, qTerms.distinct.size, stats.getDouble(0),
      stats.getDouble(1), k)
  }

  /** Q89 — phrase BM25 over the PERSISTED positional index: the exact
    * in-order adjacent occurrences of the phrase become one virtual
    * term's tf, scored with q77's constants ([[bm25PhraseRank]]). The
    * probe is the same |terms|/nBuckets pruned read as q82 — positions
    * ride inside the pruned postings, so adjacency never re-touches the
    * corpus (the reason the v2 index stores them). The scan twin
    * [[q89ScanTwin]] computes the identical rows from raw documents —
    * spec-pinned, and the DuckDB oracle replays the scan formulation. */
  def q89Bm25Phrase(s: SparkSession, dir: String, k: Int = 20,
      phrase: Seq[String] = Seq("hash", "join")): DataFrame =
    graft.search.InvertedIndex.searchPhrase(s, sharedIndex(s, dir),
      phrase, k)

  /** THE rank-fusion core — Reciprocal Rank Fusion over any number of
    * ranked lists, each (doc_id, rank): score = Σ 1/(rrfK + rank), a
    * doc absent from a list contributes nothing there. Integer ranks
    * make the fused doubles engine-identical; the 6-decimal round is
    * the rank key (the engine-stability pattern every retrieval query
    * here uses). Exposed for q93 and spec-testable on toy lists. */
  private[graft] def rrfFuse(lists: Seq[DataFrame], k: Int,
      rrfK: Int): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val legs = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("doc_id"), col("rank").as(s"_r$i"))
    }
    val joined = legs.reduce(_.join(_, Seq("doc_id"), "full_outer"))
    val score = legs.indices.map(i =>
      coalesce(lit(1.0) / (lit(rrfK) + col(s"_r$i")), lit(0.0)))
      .reduce(_ + _)
    joined.select(col("doc_id"), round(score, 6).as("_s"))
      .orderBy(col("_s").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("_s").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"),
        format_string("%.6f", col("_s")).as("rrf"))
      .orderBy("rank")
  }

  /** Q93 — HYBRID retrieval: Reciprocal Rank Fusion of the lexical leg
    * (q82's persisted-index BM25 probe at candidate depth 50) and the
    * vector leg (q23's cosine kNN at the same depth), the
    * sparse+dense fusion every RAG stack runs. Both legs are
    * independently oracle-proven; the fusion itself is pure rank
    * arithmetic ([[rrfFuse]]), so the whole query DuckDB-replays.
    * Scale posture: each leg is its own bounded top-k (index probe /
    * broadcast-scan TakeOrdered); the fusion joins two ≤depth-row
    * lists — the expensive parts stay in the legs, which already have
    * scale paths (inverted index, IVF). */
  def q93HybridRrf(s: SparkSession, dir: String, k: Int = 20,
      depth: Int = 50, rrfK: Int = 60): DataFrame = {
    val lex = graft.search.InvertedIndex.search(s, sharedIndex(s, dir),
        Seq("join", "hash", "window"), depth)
      .select(col("doc_id"), col("rank"))
    val vec = SimilarityQueries.cosineRanked(s, dir, depth)
    rrfFuse(Seq(lex, vec), k, rrfK)
  }

  /** q89's scan-path twin (no index): positional postings built inline
    * from the corpus, same [[bm25PhraseRank]]. */
  private[graft] def q89ScanTwin(s: SparkSession, dir: String,
      k: Int = 20,
      phrase: Seq[String] = Seq("hash", "join")): DataFrame = {
    val d = docs(s, dir)
    val stats = d
      .agg(count(lit(1)).cast("double").as("n"),
        avg(size(tokens(col("text")))).as("avgdl"))
      .head
    val postings = d
      .select(col("doc_id"), size(tokens(col("text"))).cast("double").as("dl"),
        posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.distinct: _*))
      .groupBy("doc_id", "dl", "w")
      .agg(count(lit(1)).cast("double").as("tf"),
        sort_array(collect_list(col("pos"))).as("pos"))
    bm25PhraseRank(postings, phrase, stats.getDouble(0),
      stats.getDouble(1), k)
  }

  /** Q83 — split-leakage audit: near-duplicate pairs (q48's simhash
    * mining) that CROSS the deterministic train/val/test boundary (q54's
    * hash split) — the eval-integrity check a pipeline must run after
    * splitting, because a near-dup of a test doc inside train leaks the
    * benchmark even when exact dedup is clean. Composes the two audited
    * primitives; output is pair counts per unordered split pair, so
    * off-diagonal rows ARE the leak.
    *
    * Scale posture: q70's shape — the LSH-mined pair graph is orders of
    * magnitude smaller than the corpus, so both provenance joins shuffle
    * pair rows against a narrow (doc_id, split) projection; the final
    * aggregate is 6 rows max. */
  /** The deterministic (doc_id, split) assignment — ONE definition for
    * q54 (aggregated report), q83 (leakage audit) and q85 (quarantine
    * list): a ratio/seed change propagates to every consumer, or the
    * audits silently disagree with the split they claim to check. */
  /** The q54 split assignment as a column — ONE definition for every
    * consumer (q54/q83/q85/q125), so the split can never drift between
    * the audit queries and the decontamination probes. */
  private[graft] def splitCol: org.apache.spark.sql.Column = {
    val h = seededHash(col("doc_id").cast("string"), 0)
    when(pmod(h, lit(10)) < 8, "train")
      .when(pmod(h, lit(10)) === 8, "val")
      .otherwise("test")
  }

  private[graft] def splitAssignments(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("lang"), splitCol.as("split"))

  def q83SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairsRaw(s, dir).select(col("a"), col("b"))
    val splits = splitAssignments(s, dir).select("doc_id", "split")
    pairs
      .join(splits.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(splits.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("split_a", "split_b")
  }

  /** Q85 — train-set quarantine list: the actionable half of q83's
    * audit. Every TRAIN document with a near-dup partner (q48 pairs) in
    * val/test is listed with its eval-partner count — the rows a
    * pipeline drops (or reassigns) from train to restore benchmark
    * integrity after the leak is found.
    *
    * Scale posture: identical join shape to q83 (pair graph × narrow
    * split projection); the quarantine list is bounded by the pair
    * count. */
  def q85TrainQuarantine(s: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairsRaw(s, dir).select(col("a"), col("b"))
    val splits = splitAssignments(s, dir).select("doc_id", "split")
    val tagged = pairs
      .join(splits.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(splits.select(col("doc_id").as("b"), col("split").as("sb")), "b")
    // both orientations in ONE pass over the tagged pairs — a unionAll
    // of two filters would execute the whole pair-mining subtree twice
    tagged
      .select(
        when(col("sa") === "train" && col("sb") =!= "train", col("a"))
          .when(col("sb") === "train" && col("sa") =!= "train", col("b"))
          .as("doc_id"))
      .filter(col("doc_id").isNotNull)
      .groupBy("doc_id").agg(count(lit(1)).as("n_eval_partners"))
      .orderBy("doc_id")
  }

  /** Q76 — decontamination via a distributed Bloom filter: q64's exact
    * semantics, restructured for an eval/blocklist set too large to
    * broadcast as rows. The eval shingle set is folded into a Bloom
    * filter by a distributed two-phase aggregate (partial filters
    * OR-merged; only the serialized filter reaches the driver), the
    * corpus scan is pruned by the codegen'd `might_contain` predicate
    * BEFORE any shuffle, and the survivors — true hits plus a bounded
    * false-positive trickle — are exact-confirmed with the equi-join,
    * so the result is identical to q64 and shares its oracle.
    *
    * Scale posture: at 100 TB the corpus side sheds ~everything at the
    * scan (filter FPP ~3%), so the confirm join shuffles survivors
    * only; the filter is MBs regardless of corpus size. This is the
    * same build/probe pair Catalyst injects for runtime bloom-filter
    * joins, applied where the optimizer can't see the opportunity
    * (the probe key is a computed shingle, not a scan column). */
  def q76DecontaminateBloom(s: SparkSession, dir: String,
      n: Int = 5): DataFrame = {
    import graft.functions.BloomFunctions.{bloomAgg, mightContain}
    import graft.functions.TextKernelExpressions.wordShinglesFast
    // pinned: feeds the filter build AND the exact-confirm join
    val evalSh = docs(s, dir).filter(col("doc_id") < 10)
      .select(explode(wordShinglesFast(col("text"), n)).as("sh")).distinct()
      .transform(Materialize.pin)
    val bf = evalSh
      .agg(bloomAgg(xxhash64(col("sh")), 100000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    docs(s, dir).filter(col("doc_id") >= 10)
      .select(col("doc_id"), explode(wordShinglesFast(col("text"), n)).as("sh"))
      .filter(mightContain(lit(bf), xxhash64(col("sh"))))
      .join(evalSh, Seq("sh"))
      .groupBy("doc_id").agg(count_distinct(col("sh")).as("n_shared"))
      .orderBy("doc_id")
  }

  /** (doc_id, pos, gh) — every length-`l` gram anchor. ONE definition
    * shared by the batch report/filter and the incremental store
    * ([[graft.operators.IncrementalSpans]]). `gh` is the RAW gram
    * string (r22): md5 keying cost a full corpus×l hash pass per
    * consumer while proxying exactly the equality the raw bytes give
    * directly — and an md5-hex key (32 chars) is no narrower than a
    * 5-token gram. Raw grams also make flagging exact rather than
    * hash-collision-probabilistic; the oracle's md5 grouping partitions
    * grams identically, so results are unchanged. */
  private[graft] def gramPositions(d: DataFrame, l: Int): DataFrame =
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(graft.functions
        .TextKernelExpressions.wordShinglesFast(col("text"), l))
        .as(Seq("pos", "gh")))

  /** Token positions whose length-`l` gram (shingle starting there)
    * appears in at least `minDf` DISTINCT documents — the flagged-anchor
    * set both q95 (maximal spans) and q96 (redaction) consume. ONE
    * definition so the report and the filter can never disagree about
    * what counts as repeated.
    *
    * Scale posture (r22 shape): the df side explodes the PER-DOCUMENT
    * DISTINCT gram set straight from the kernel
    * ([[graft.functions.MinhashKernel.distinctStringShingles]]) — the
    * (gram, doc) dedup the old two-phase distinct paid a second
    * exchange for happens inside the row for free, so the aggregate is
    * a plain partial count: ONE exchange, one row per (gram, partition)
    * crossing it, and a hot boilerplate gram still never concentrates
    * (its partial counts merge map-side). Grams shuffle as raw strings
    * (uniform hash distribution like any content key; bounded by l
    * tokens). The flag-back is an equi-join on gh whose build side is
    * the df-FILTERED key set (tiny relative to the corpus — AQE
    * broadcasts it when it fits, falls back to a skew-splittable SMJ
    * otherwise). The corpus is scanned once per consumer (aggregate +
    * probe) — deliberately recomputed rather than pinned, because the
    * exploded gram set is ~l× the corpus, far larger than the rescan
    * it saves. (PlanQualitySpec audits this shape.) */
  private[graft] def dupGramPositions(s: SparkSession, dir: String,
      l: Int, minDf: Int): DataFrame = {
    val d = docs(s, dir)
    val dup = d.filter(col("text").isNotNull)
      .select(explode(graft.functions.TextKernelExpressions
        .distinctWordShinglesFast(col("text"), l)).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("gh")
    gramPositions(d, l).join(dup, Seq("gh")).select("doc_id", "pos")
  }

  /** Gaps-and-islands merge of flagged anchors [p, p+l-1] into maximal
    * spans — q95's core, shared with the incremental twin. */
  private[graft] def mergeIslands(flagged: DataFrame, l: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(l - 1))
      .over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    flagged
      .withColumn("_new",
        when(col("pos") > coalesce(prevEnd, lit(-1)) + 1, 1).otherwise(0))
      .withColumn("_isl", sum(col("_new")).over(w))
      .groupBy("doc_id", "_isl")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(l - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
      .orderBy("doc_id", "span_start")
  }

  /** Redaction accounting for a doc set given its flagged anchors —
    * q96's core, shared with the incremental twin. */
  private[graft] def redactWithFlags(d: DataFrame, flagged: DataFrame,
      l: Int): DataFrame = {
    val base = d.filter(col("text").isNotNull)
    val covered = flagged
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(l - 1))).as("pos"))
      .distinct()
    val kept = base
      .select(col("doc_id"), posexplode(tokens(col("text")))
        .as(Seq("pos", "w")))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          x => x("w")), " ")).as("kept_md5"))
    base.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_total"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
      .orderBy("doc_id")
  }

  /** Q95 — repeated-span detection (the exact-substring dedup report of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499, re-expressed for Spark): every MAXIMAL
    * token interval per document that is fully covered by length-`l`
    * grams occurring in ≥ `minDf` distinct documents. The paper builds a
    * corpus suffix array; the distributed equivalent is gram-anchor
    * flagging + interval merge — overlapping flagged anchors [p, p+l-1]
    * coalesce into maximal spans via gaps-and-islands, all integer
    * arithmetic, so the DuckDB oracle replays it exactly.
    *
    * Scale posture: [[dupGramPositions]]'s one-shuffle-key design; the
    * island merge is a per-document window over FLAGGED positions only
    * (a small fraction of the corpus — and a document's flagged set is
    * bounded by its own length, so no partition hot-spots beyond the
    * longest document). */
  def q95RepeatedSpans(s: SparkSession, dir: String, l: Int = 5,
      minDf: Int = 2): DataFrame =
    mergeIslands(dupGramPositions(s, dir, l, minDf), l)

  /** Q96 — span REDACTION: the filter q95's report drives. Tokens
    * covered by any flagged anchor are dropped; the output is the
    * per-document retention accounting (total tokens, kept tokens, md5
    * of the redacted text) — the actual corpus-rewrite step of
    * exact-substring dedup, hashed so the gate compares full redacted
    * texts without hauling them.
    *
    * Scale posture: covered positions explode l rows per flagged anchor
    * (bounded by l × flagged, itself ≪ corpus); the kept-token
    * reconstruction is an anti-join on (doc_id, pos) — uniform composite
    * key — and one per-document sort-free aggregate (sort_array runs
    * inside the aggregate buffer, not as a shuffle sort). */
  def q96SpanRedact(s: SparkSession, dir: String, l: Int = 5,
      minDf: Int = 2): DataFrame =
    redactWithFlags(docs(s, dir), dupGramPositions(s, dir, l, minDf), l)

  /** Q180 — the per-SOURCE corpus profile (the dataset-card numbers a
    * training-data pipeline reports before anyone trains on the mix):
    * document count, language spread, mean length, exact-dup count
    * (md5 identity — the q22 kernel folded into the profile) and the
    * short-document fraction, one row per source. The mean and the
    * fraction are spelled SUM/COUNT in both engines so the doubles
    * are bit-identical before rounding.
    *
    * Scale posture: ONE groupBy(source) — map-side partial
    * aggregation; the two count-distincts expand the input 3× inside
    * the aggregate (Spark's grouping-expand), still linear and still
    * one shuffle keyed on source. At 100 TB the md5 distinct would
    * move to the HLL sketch (q39's path) — exactness here is what
    * the oracle wants. */
  def q180SourceProfile(s: SparkSession, dir: String): DataFrame =
    sourceProfile(docs(s, dir)).orderBy("source")

  /** The q180 aggregation over an arbitrary document frame — shared
    * with the streaming twin's batch-equivalence spec
    * ([[graft.streaming.CorpusStreams.profileStream]]). */
  def sourceProfile(d: DataFrame): DataFrame =
    d.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      round(sum(col("n_chars")).cast("double") / count(lit(1)), 4)
        .as("mean_chars"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("dup_docs"),
      round(sum(when(col("n_chars") < 200, 1).otherwise(0))
        .cast("double") / count(lit(1)), 6).as("short_frac"))

  /** Q189 — the corpus EXPORT MANIFEST under the oracle gate
    * ([[graft.operators.CorpusExport]]): documents land hash-sharded
    * (the q54 content-stable discipline, seed #2, 8 shards) and the
    * manifest — computed from the READ-BACK shards, so the round-trip
    * is what's checked — reports per-shard doc/token counts and the
    * doc-id-ordered content fingerprint. DuckDB recomputes all three
    * from the raw table with the same seeded hash: a dropped row, a
    * reordered rewrite, or a corrupted text flips a checksum. */
  def q189ExportManifest(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusExport.exportShards(
      docs(s, dir).select("doc_id", "text"),
      s"/root/repo/target/tmp/q189_" + s.sparkContext.applicationId)

  /** Q190 — RIGHT-TO-BE-FORGOTTEN in the derived index (the q160
    * cascade-forget discipline carried into the dedup store family):
    * q185's corpus compacts to serving with doc 45 FORGOTTEN, and the
    * probe — still doc 45's own text — finds only its est-1.0 partner
    * 267; an engine whose compaction leaked the forgotten signatures
    * (or dropped the wrong rows) hash-fails. The oracle is q185's
    * replay with the forgotten id excluded from the STORE side while
    * the query signature still computes from its text. */
  /** Shared fixture of the forget family (q190/q194): the q185
    * corpus slice + its md5-kernel ingest store, built ONCE per
    * application — store-lifecycle queries SHARE fixture stores (the
    * r14 bench discipline) instead of each paying the build. */
  @volatile private var forgetFx: Option[(String, (String, DataFrame))] =
    None
  private def forgetFixture(s: SparkSession, dir: String)
      : (String, DataFrame) = synchronized {
    val key = s.sparkContext.applicationId + "|" + dir
    forgetFx match {
      case Some((k, v)) if k == key => v
      case _ =>
        val base = s"/root/repo/target/tmp/q190x_" +
          s.sparkContext.applicationId +
          "_" + graft.FixtureCache.dirTag(dir)
        val corpus = docs(s, dir).select("doc_id", "text")
          .orderBy("doc_id").limit(300)
          .localCheckpoint(true)
        graft.operators.IncrementalDedup.initStore(corpus,
          s"$base/ingest", nBands = 4, rowsPerBand = 2,
          shingleLen = 3, kernel = "md5")
        val v = (base, corpus)
        forgetFx = Some((key, v)); v
    }
  }

  def q190ForgetCompaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{IncrementalDedup => D}
    // compaction-with-forget runs once per process; every call probes
    // the forgotten serving store (the steady serve path)
    val (servingPath, qText) =
      graft.FixtureCache.once(s, s"q190|$dir") {
        val (base, corpus) = forgetFixture(s, dir)
        D.compactToServing(s, s"$base/ingest", s"$base/serving190",
          nBuckets = 16, forget = Some(Seq(45L).toDF("doc_id")))
        (s"$base/serving190", corpus.filter(col("doc_id") === 45L)
          .select("text").head.getString(0))
      }
    D.search(D.loadStore(s, servingPath), qText, k = 5)
  }

  /** Q194 — the BUCKET-PRUNED forget under the oracle gate
    * ([[graft.operators.BucketForget]] — q190's semantics at
    * O(affected-buckets) instead of O(store)): the serving store
    * compacts WITHOUT a forget, then `forgetFromServing` rewrites
    * only the bucket directories holding doc 45's band rows, and the
    * probe — still doc 45's own text — answers exactly like q190's
    * full recompaction (one shared oracle). An engine whose pruned
    * rewrite leaks signatures in untouched buckets, drops surviving
    * rows from rewritten ones, or forgets the wrong keys hash-fails
    * here even with q190 green. */
  def q194PrunedForget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{IncrementalDedup => D}
    // compaction + pruned forget run once per process; every call
    // probes the post-forget serving store
    val (servingPath, qText) =
      graft.FixtureCache.once(s, s"q194|$dir") {
        val (base, corpus) = forgetFixture(s, dir)
        D.compactToServing(s, s"$base/ingest", s"$base/serving194",
          nBuckets = 16)
        D.forgetFromServing(s, s"$base/serving194",
          Seq(45L).toDF("doc_id"))
        (s"$base/serving194", corpus.filter(col("doc_id") === 45L)
          .select("text").head.getString(0))
      }
    D.search(D.loadStore(s, servingPath), qText, k = 5)
  }

  /** Q196 — AGREEMENT RETENTION: the corpus-shrinking step driven by
    * the TWO-KERNEL agreement verdicts (q187's precision policy
    * feeding q151's keep-best machinery): a pair is a REAL duplicate
    * only when the md5-minhash pipeline (est ≥ 0.5, q51's kernel) AND
    * the simhash pipeline (d ≤ 3, q48's kernel) both flag it; agreed
    * pairs form connected components and every cluster keeps its
    * highest unique-token-ratio member, dropping the rest. Agreement
    * prunes the single-kernel clusters (fewer, tighter components
    * than q151's simhash-only graph — spec-pinned non-vacuous), so
    * the retention report is what a pipeline would actually delete.
    * Scale: two banded pair pipelines + one pair-key join + the q62
    * component machinery — nothing all-pairs. */
  def q196AgreementRetention(s: SparkSession, dir: String): DataFrame = {
    // the agreed pair set is the two DETECT pipelines' intersection
    // (each benched honestly — q48/q51); retention consumes it as a
    // once-per-process fixture and measures cluster + keep-best
    val agreed = graft.FixtureCache.once(s, s"agreed_pairs|$dir") {
      agreedPairs(s, dir).localCheckpoint(true)
    }
    val labels = componentLabels(s, agreed)
    val toks = tokens(col("text"))
    val scored = docs(s, dir).select(col("doc_id").as("key"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("score"))
    graft.operators.Retention.keepBest(
      labels.select(col("id").as("key"), col("label").as("canonical")),
      scored)
      .select(col("canonical"), col("kept_key").as("kept_doc"),
        col("kept_score"), col("n_dropped"))
  }

  /** The corpus-wide AGREED pair set: minhash (md5, est ≥ 0.5) ∩
    * simhash (d ≤ 3) on the (a, b) pair key — the batch twin of
    * q187's store-probe agreement, shared by [[q196AgreementRetention]]
    * and its spec. */
  private[graft] def agreedPairs(s: SparkSession, dir: String)
      : DataFrame =
    q51MinhashPairsMd5(s, dir, 0.5).select("a", "b")
      .join(simhashPairsRaw(s, dir).select("a", "b"), Seq("a", "b"))

  /** Q186 — the persisted hash-space index serving SIMHASH text space
    * (the store is hash-space-agnostic — q170 image, q176 audio, here
    * the q48 kernel): every document's 32-bit md5-simhash lands in the
    * (key, dhash, band) store under the q48 pigeonhole banding (4×8,
    * lossless d≤3), and "find near-duplicates of doc 1" probes it —
    * the band disjunction pushes into the scan, candidates verify on
    * exact popcount, top-5 by (distance, key). Keys are STRINGS in
    * this store (the image-store schema), so ties order by the
    * VARCHAR cast on both engines. The DuckDB oracle recomputes the
    * md5 simhash and replays the within-radius top-k. */
  def q186SimhashStoreSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IncrementalImageDedup => I}
    val (path, q) = graft.FixtureCache.once(s, s"q186|$dir") {
      val p = s"/root/repo/target/tmp/q186_" +
        s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val hashes = docs(s, dir)
        .select(col("doc_id").cast("string").as("key"),
          graft.functions.TextKernelExpressions
            .simhashMd5(col("text"), 32).as("dhash"))
        .localCheckpoint(true) // store build AND the query fetch
      I.initStore(hashes, p, nBands = 4, bandBits = 8)
      (p, hashes.filter(col("key") === "1").head.getLong(1))
    }
    I.search(I.loadStore(s, path), q, k = 5)
  }

  /** Q187 — TWO-KERNEL AGREEMENT on the text batch-vs-store path
    * (q166/q169/q177's precision policy, completed for the text
    * modality): a batch document is a duplicate only when the MINHASH
    * store (md5 kernel, est ≥ 0.5) and the SIMHASH store (32-bit, d ≤
    * 3) match it to the SAME stored document. Candidate SETS join on
    * the (batch, stored) pair BEFORE any per-key cut — the kernels
    * can crown different min-key winners while agreeing on a common
    * match. Non-vacuous by construction at sf0.01: 4 of 5 minhash
    * cross-pairs survive while 263 simhash band-space coincidences
    * (32 bits over hundreds of docs collide freely) are rejected —
    * the precision independent evidence buys. Oracle = the q51 and
    * q48 machineries' cross-split intersection with the min-s_id cut
    * replayed. */
  def q187TextKernelAgreement(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IncrementalDedup => D, IncrementalImageDedup => I}
    def simhashes(df: DataFrame): DataFrame =
      df.select(col("doc_id").cast("string").as("key"),
        graft.functions.TextKernelExpressions
          .simhashMd5(col("text"), 32).as("dhash"))
    // the two kernel stores build once per process; every call runs
    // the AGREEMENT probe (the operator under measure) against them
    val (base, d) = graft.FixtureCache.once(s, s"q187|$dir") {
      val b = s"/root/repo/target/tmp/q187_" +
        s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val dd = docs(s, dir).select("doc_id", "text")
        .filter(col("doc_id") < 300).localCheckpoint(true)
      val old = dd.filter(col("doc_id") < 150)
      D.initStore(old, s"$b/mh", nBands = 4, rowsPerBand = 2,
        shingleLen = 3, kernel = "md5")
      I.initStore(simhashes(old), s"$b/sh", nBands = 4, bandBits = 8)
      (b, dd)
    }
    val batch = d.filter(col("doc_id") >= 150)
    // each side distincts BEFORE the composite join (the shared
    // dupCandidates contract — multi-band fan-in would otherwise
    // multiply across kernels)
    val mh = D.dupCandidates(batch, D.loadStore(s, s"$base/mh"), 0.5)
      .distinct()
    val sh = I.dupCandidates(simhashes(batch),
        I.loadStore(s, s"$base/sh"), maxDist = 3, nBands = 4,
        bandBits = 8)
      .distinct()
    mh.join(sh.select(col("key").cast("long").as("doc_id"),
        col("s_key").cast("long").as("s_id"), col("dist")),
        Seq("doc_id", "s_id"))
      .groupBy("doc_id")
      .agg(min_by(struct(col("s_id"), col("est_jaccard"), col("dist")),
        col("s_id")).as("m"))
      .select(col("doc_id"), col("m.s_id").as("dup_of"),
        col("m.est_jaccard").as("est_jaccard"), col("m.dist").as("dist"))
      .orderBy("doc_id")
  }

  /** Q185 — banded `search()` over the persisted TEXT dedup store
    * (VERDICT r13's third item — the text twin of q170/q182's
    * hash-space serving path): a 300-doc corpus slice builds an
    * md5-kernel ingest store (self-describing kernel + banding),
    * [[graft.operators.IncrementalDedup.compactToServing]] ships it to
    * the bucket-partitioned serving layout through the AtomicSwap
    * ritual, and "find near-duplicates of doc 45" probes it — ≤4 of 16
    * bucket directories at the file listing, band disjunction pushed,
    * full-signature Jaccard verify. Doc 45 carries the est-1.0 partner
    * 267 in range at sf0.01; the DuckDB oracle replays the md5 minhash
    * for the query doc against every stored signature, so a probe that
    * misses a banded neighbor or mis-ranks the verify hash-fails. */
  def q185TextStoreSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IncrementalDedup => D}
    // store built once per process (the FixtureCache serving
    // contract); every call is the probe against the warm store
    val (servingPath, qText) =
      graft.FixtureCache.once(s, s"q185|$dir") {
        val base = s"/root/repo/target/tmp/q185_" +
          s.sparkContext.applicationId +
          "_" + graft.FixtureCache.dirTag(dir)
        // 300 docs: doc 45's est-1.0 partner 267 is in range, and the
        // md5 kernel (8 seeded hashes per shingle, the
        // oracle-replayable path) prices the fixture build — the bench
        // times the SERVING loop, not a bigger corpus re-proving the
        // same contract
        val corpus = docs(s, dir).select("doc_id", "text")
          .orderBy("doc_id").limit(300)
          .localCheckpoint(true) // store build AND the query fetch
        D.initStore(corpus, s"$base/ingest", nBands = 4,
          rowsPerBand = 2, shingleLen = 3, kernel = "md5")
        D.compactToServing(s, s"$base/ingest", s"$base/serving",
          nBuckets = 16)
        (s"$base/serving", corpus.filter(col("doc_id") === 45L)
          .select("text").head.getString(0))
      }
    D.search(D.loadStore(s, servingPath), qText, k = 5)
  }

  /** Q207 — HELD-OUT bigram-LM predictability score (r17): train an
    * add-one bigram model on the 80% train split (doc_id % 5 != 0),
    * score the held-out docs, surface the 10 LEAST predictable — the
    * frozen-REFERENCE-model filter shape (CCNet-style: incoming data
    * scored by a model it did not train), where [[q66LmXent]] is the
    * SELF-trained in-corpus cross-entropy. The split also makes this
    * the honest form: q66's self-scoring lets a document lower its
    * own surprise through its own counts.
    *
    * DETERMINISM: the usual per-token `sum(log p)` perplexity is
    * order-sensitive float addition (engine-dependent at hash
    * granularity), so the score is the arithmetic-mean surrogate:
    * each smoothed conditional probability becomes the EXACT integer
    * `(1e9 * (c_bg + 1)) div (c_prefix + V)` (one long division, the
    * q188 integer-binning recipe), the per-doc mean divides two exact
    * integers ONCE, rounded to 9 — order-free on both engines.
    *
    * SCALE: bigrams come from `arrays_zip(slice, slice)` — per-row,
    * no self-join; counts are map-side-combinable groupBys; scoring
    * is two equi-joins on (w1,w2)/(w1) (broadcastable at dim size,
    * shuffle-safe beyond); V rides a 1-row cross join (maxRows=1,
    * sweep-audited), never a collected driver scalar. */
  def q207LmScore(s: SparkSession, dir: String): DataFrame =
    lmHeldoutScores(s, dir)
      .orderBy(col("score"), col("doc_id"))
      .limit(10)

  /** q207's per-held-out-doc scores WITHOUT the presentation cut —
    * shared with the q217 ensemble (which needs every held-out doc's
    * score, not the bottom 10). */
  /** The q207 LM-family's corpus bigrams — (doc_id, w1, w2) over
    * normalized tokens, docs with <2 tokens dropped. ONE definition
    * (shared with the frozen-model freeze in CorpusStreams) so the
    * serving model can never silently diverge from the batch model
    * it ships. */
  private[graft] def corpusBigrams(s: SparkSession,
      dir: String): DataFrame = bigramsOf(docs(s, dir))

  /** [[corpusBigrams]] over ANY documents-shaped frame — the r19
    * incremental-verdict path trains its frozen model on a SUBSET
    * corpus, so the bigram construction takes the frame, not the
    * dir. */
  private[graft] def bigramsOf(d: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{normalize, tokens}
    val base = d
      .select(col("doc_id"), tokens(normalize(col("text"))).as("w"))
      .filter(size(col("w")) >= 2)
    base.select(col("doc_id"),
      explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("b"))).as("bg"))
      .select(col("doc_id"),
        col("bg.a").as("w1"), col("bg.b").as("w2"))
  }

  /** The q207 family's deterministic train-split predicate (the 80%
    * side) — one constant, never respelled. */
  private[graft] def lmTrainSplit: org.apache.spark.sql.Column =
    col("doc_id") % 5 =!= 0

  private[graft] def lmHeldoutScores(s: SparkSession,
      dir: String): DataFrame =
    // Pinned once per (session, dir): the scored held-out frame is the
    // shared input of q207 AND the q217/q218/q220 ensemble (the frozen
    // model scores a fixed held-out split — a deployment trains once
    // per snapshot cycle and serves many reads of the scored frame).
    // Held-out-split-sized, so the pin is bounded like every fixture.
    graft.FixtureCache.once(s, s"q207scores|$dir") {
      lmHeldoutScoresUncached(s, dir).localCheckpoint(true)
    }

  private[graft] def lmHeldoutScoresUncached(s: SparkSession,
      dir: String): DataFrame = lmHeldoutScoresOf(docs(s, dir))

  /** [[lmHeldoutScoresUncached]] over ANY documents-shaped frame. */
  private[graft] def lmHeldoutScoresOf(d: DataFrame): DataFrame =
    lmScoresFromBigrams(bigramsOf(d))

  /** The held-out scoring over a PRE-BUILT bigram frame — q226
    * computes its init corpus's bigrams once and feeds both this and
    * the frozen-model freeze from the same checkpoint. */
  private[graft] def lmScoresFromBigrams(bigrams: DataFrame)
      : DataFrame = {
    val train = bigrams.filter(lmTrainSplit)
    val test = bigrams.filter(!lmTrainSplit)
    val cbg = train.groupBy("w1", "w2")
      .agg(count(lit(1)).as("cbg"))
    val cpfx = train.groupBy("w1").agg(count(lit(1)).as("cpfx"))
      .withColumnRenamed("w1", "pw1")
    val vocab = train.select(col("w1").as("t"))
      .union(train.select(col("w2").as("t")))
      .agg(countDistinct(col("t")).as("v"))
    val terms = test
      .join(cbg, Seq("w1", "w2"), "left")
      .join(cpfx, test("w1") === cpfx("pw1"), "left")
      .crossJoin(vocab)
      .select(col("doc_id"),
        expr("(1000000000L * (coalesce(cbg, 0L) + 1)) div " +
          "(coalesce(cpfx, 0L) + v)").as("term"))
    terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round((sum(col("term")).cast("double") / count(lit(1))) / 1e9,
          9).as("score"))
  }

  /** The q217/q218 LM-stage threshold: a held-out doc whose mean
    * smoothed bigram probability falls below it fails the `lm` filter
    * (the CCNet frozen-reference-model cut — sited at the fixture's
    * ~p10 so the stage actually discriminates at sf0.01). */
  val EnsembleLmTau = 0.0322

  /** Per-document flags for the QUALITY-ENSEMBLE verdict (r18
    * capstone): the engine's four deterministic quality filters
    * composed into one cascade —
    *   1. `ratios`     (q27): 2.0 ≤ avg word length ≤ 6.0 AND
    *      vocabulary-uniqueness ≥ 0.4 (both on the 4-decimal rounded
    *      ratios, so the comparisons are engine-stable);
    *   2. `fences`     (q162): token count inside the language's
    *      Tukey fences (Q1/Q3 ∓ 1.5·IQR, exact quantiles);
    *   3. `classifier` (q94): the pinned-logistic keep flag over the
    *      doc's embedding (vec_id = doc_id; a doc with no embedding
    *      passes — no signal is not a failure);
    *   4. `lm`         (q207): held-out docs (doc_id % 5 = 0) must
    *      score ≥ [[EnsembleLmTau]]; training docs pass (the frozen
    *      model trained ON them — scoring them would be q66's
    *      self-scoring, the shape q207 exists to avoid).
    *
    * Scale posture: one corpus scan feeds ratios+fences (the fence
    * table is language-cardinality, broadcast back); the classifier
    * flag rides q94's codegen scan; the LM join is q207's audited
    * two-equi-join shape; the final composition is three left joins
    * on doc_id — no new shuffle class at 100 TB. */
  private[graft] def ensembleFlags(s: SparkSession,
      dir: String): DataFrame =
    // pinned once per (session, dir): q217 AND q218 consume the same
    // flags (doc-count-sized — bounded like every pinned fixture),
    // and the LM stage embeds q207's model build, the one genuinely
    // expensive input — the FixtureCache steady-state-serving
    // contract, documented in SURVEY §6
    graft.FixtureCache.once(s, s"q217flags|$dir") {
      composeFlags(s, dir, docs(s, dir),
        lmHeldoutScores(s, dir)).localCheckpoint(true)
    }

  /** [[ensembleFlags]] over ANY documents-shaped SUBSET corpus —
    * fences and the held-out LM train on the frame itself (the r19
    * incremental-verdict INIT epoch); uncached. */
  private[graft] def ensembleFlagsOf(s: SparkSession, dir: String,
      d: DataFrame): DataFrame =
    composeFlags(s, dir, d, lmHeldoutScoresOf(d))

  private def composeFlags(s: SparkSession, dir: String, d: DataFrame,
      lmScores: DataFrame): DataFrame = {
    val clf = graft.queries.SimilarityQueries
      .q94ClassifierScore(s, dir)
      .select(col("vec_id").as("doc_id"), col("keep").as("clf_keep"))
    val lm = lmScores.select(col("doc_id"), col("score"))
    ratioFenceFlags(d)
      .join(clf, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .withColumn("clf_ok", coalesce(col("clf_keep"), lit(1)))
      .withColumn("lm_ok",
        when(col("doc_id") % 5 =!= 0, lit(1))
          .otherwise(when(col("score").isNull, lit(1))
            .otherwise((col("score") >= lit(EnsembleLmTau))
              .cast("int"))))
  }

  /** Stages 1+2 of the ensemble over any documents-shaped frame
    * (doc_id, lang, n_chars, text) — factored so the spec can prove
    * the FENCES stage fires on a length-skewed corpus: the fixture's
    * uniform synthetic lengths have no Tukey outliers, so q217's
    * oracle exercises fences only as an always-pass (the honest
    * answer there, pinned non-vacuously by EnsembleSpec). */
  private[graft] def ratioFenceFlags(d: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val toks = tokens(col("text"))
    val base = d.select(col("doc_id"), col("lang"),
      col("n_chars"),
      size(toks).cast("double").as("nt"),
      size(array_distinct(toks)).cast("double").as("uq"))
    val ratios = base
      .withColumn("awl",
        round(col("n_chars").cast("double") / col("nt"), 4))
      .withColumn("ur", round(col("uq") / col("nt"), 4))
      // null text FAILS ratios with attribution (the verdictStream
      // rule — a document with no text is not keepable corpus), it
      // does not propagate a null flag through the verdict
      .withColumn("ratios_ok", coalesce(
        (col("awl") >= 2.0 && col("awl") <= 6.0 &&
          col("ur") >= 0.4).cast("int"),
        lit(0)))
    val fences = base.groupBy("lang")
      .agg(expr("percentile(nt, 0.25)").as("q1"),
        expr("percentile(nt, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .select("lang", "lo", "hi")
    ratios.join(broadcast(fences), "lang")
      .withColumn("fences_ok",
        (col("nt") >= col("lo") && col("nt") <= col("hi")).cast("int"))
  }

  /** Q217 — the QUALITY-ENSEMBLE VERDICT: one keep/drop per document
    * with per-filter attribution — the four flags themselves plus the
    * FIRST failing filter in cascade order (what a corpus pipeline
    * logs so a rejected document is explainable). Oracle-checked:
    * DuckDB replays all four filters (quantile fences, pinned
    * logistic, held-out bigram LM) and the cascade attribution. */
  def q217EnsembleVerdict(s: SparkSession, dir: String): DataFrame =
    verdictRows(ensembleFlags(s, dir)).orderBy("doc_id")

  /** The q217 verdict projection over any flags frame — ONE cascade
    * definition shared by the batch verdict, the incremental store's
    * init epoch, and (mirrored in) the streaming scorer. */
  private[graft] def verdictRows(flags: DataFrame): DataFrame =
    flags
      .withColumn("verdict",
        when(col("ratios_ok") === 1 && col("fences_ok") === 1 &&
          col("clf_ok") === 1 && col("lm_ok") === 1, lit("keep"))
          .otherwise(lit("drop")))
      .withColumn("first_fail",
        when(col("ratios_ok") === 0, lit("ratios"))
          .when(col("fences_ok") === 0, lit("fences"))
          .when(col("clf_ok") === 0, lit("classifier"))
          .when(col("lm_ok") === 0, lit("lm")))
      .select(col("doc_id"), col("ratios_ok"), col("fences_ok"),
        col("clf_ok"), col("lm_ok"), col("verdict"), col("first_fail"))

  /** Q220 — CORPUS BUILD (the end-to-end shape a training-data
    * pipeline ships, r18): the q217 ensemble's keepers lay out into
    * q65's fixed-budget context windows, and each pack reports its
    * doc/token counts plus a placement-ordered id checksum — the
    * manifest row a downstream trainer verifies before reading a
    * shard. Filter → pack → manifest in ONE declarative plan: the
    * verdict join prunes before the pack shuffle, the only shuffle is
    * q65's per-shard window sort, and the checksum folds inside the
    * pack groupBy (packs are ≤budget tokens, so the collect is
    * bounded by construction). */
  def q220CorpusBuild(s: SparkSession, dir: String,
      budget: Long = 2048, shards: Int = 8): DataFrame = {
    import graft.functions.TextFunctions.seededHash
    val keep = ensembleFlags(s, dir)
      .filter(col("ratios_ok") === 1 && col("fences_ok") === 1 &&
        col("clf_ok") === 1 && col("lm_ok") === 1)
      .select("doc_id")
    val d = docs(s, dir).join(keep, "doc_id")
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ntok"),
        seededHash(col("doc_id").cast("string"), 5).as("h"))
      .withColumn("shard", (col("h") % shards).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col("doc_id"))
    d.withColumn("strt", sum(col("ntok")).over(w) - col("ntok"))
      .withColumn("pack_id", floor(col("strt") / budget))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("h"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")))).as("ids_md5"))
      .orderBy("shard", "pack_id")
  }

  /** Q225 — INCREMENTAL CORPUS BUILD (r19): the q220 manifest as a
    * VERSIONED persisted store maintained across an append and a
    * forget instead of rebuilt. The lifecycle under the gate:
    * version 1 builds from the ensemble keepers MINUS a late batch
    * (doc_id % 97 == 3), then ONE update appends the late batch and
    * forgets doc_ids 5 and 10 — recomputing exactly the shards those
    * ids hash into ([[graft.operators.CorpusManifest]]; the packing
    * is a per-shard prefix fold, so the shard is the invalidation
    * unit). The DuckDB oracle replays the FROM-SCRATCH build over the
    * final corpus — the stored version-2 manifest must equal it (the
    * q152 incremental-view contract); a stale untouched-shard row, a
    * leftover forgotten doc, or a missed appended doc hash-fails. */
  /** ONE fixture corpus for the q225/q237 manifest lifecycle: the
    * ensemble keepers as (doc_id, ntok), with the late-batch and
    * forgotten predicates — shared so the two stores (and their
    * oracles, which both replay this exact split) cannot silently
    * desynchronize. Returns (keepers, late, forgotten); v1 CONTAINS
    * the to-be-forgotten ids (the forget must remove real rows) and
    * lacks the late batch. */
  private def manifestFixtureCorpus(s: SparkSession, dir: String)
      : (DataFrame, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) = {
    val keep = ensembleFlags(s, dir)
      .filter(col("ratios_ok") === 1 && col("fences_ok") === 1 &&
        col("clf_ok") === 1 && col("lm_ok") === 1)
      .select("doc_id")
    val all = docs(s, dir).join(keep, "doc_id")
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ntok"))
      .localCheckpoint(true)
    (all, col("doc_id") % 97 === 3, col("doc_id").isin(5L, 10L))
  }

  def q225IncrementalBuild(s: SparkSession, dir: String,
      budget: Long = 2048, shards: Int = 8): DataFrame = {
    import graft.operators.{CorpusManifest => M}
    val path = graft.FixtureCache.once(s, s"q225|$dir") {
      val p = s"/root/repo/target/tmp/q225_manifest_" +
        s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val (all, late, forgotten) = manifestFixtureCorpus(s, dir)
      M.init(s, p, all.filter(!late), budget, shards)
      // ONE update carries the append AND the forget; the final
      // corpus is keepers minus the forgotten ids
      val affected = M.update(s, p, all.filter(!forgotten),
        all.filter(late || forgotten).select("doc_id"),
        budget, shards)
      require(affected.nonEmpty && M.version(s, p) == 2L,
        s"q225: expected a version-2 store with affected shards, " +
          s"got v${M.version(s, p)} affected=$affected")
      p
    }
    M.read(s, path)
      .withColumn("version", lit(2L))
      .orderBy("shard", "pack_id")
  }

  /** Q237 — MANIFEST CHANGE FEED (r20): q225's append+forget update
    * emitting its PACK-LEVEL delta through [[graft.operators
    * .CorpusManifest.updateWithFeed]] — the CDC-OUT a corpus-serving
    * layer keys cache invalidation on (the version bump says
    * "something changed"; the feed says WHICH packs to re-fetch, the
    * difference between re-reading the touched shards and re-reading
    * only the changed packs). One row per changed (shard, pack_id):
    * `op` ∈ insert/update/delete with [[graft.sources.SnapshotStore
    * .diff]]'s image rule (delete carries the BEFORE row). The DuckDB
    * oracle replays BOTH from-scratch generations (v1 = keepers minus
    * the late batch, v2 = keepers minus the forgotten ids) restricted
    * to the shards the changed ids hash into and full-outer-diffs
    * them — a feed row for an unchanged pack, a missed changed pack,
    * or a wrong before/after image hash-fails. Cost ∝ the touched
    * shards' slice; the affected-shards feed provably equals the
    * whole-store diff (spec-pinned: untouched shards cannot change). */
  def q237ManifestFeed(s: SparkSession, dir: String,
      budget: Long = 2048, shards: Int = 8): DataFrame = {
    import graft.operators.{CorpusManifest => M}
    val feed = graft.FixtureCache.once(s, s"q237|$dir") {
      val p = s"/root/repo/target/tmp/q237_manifest_" +
        s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val (all, late, forgotten) = manifestFixtureCorpus(s, dir)
      M.init(s, p, all.filter(!late), budget, shards)
      M.updateWithFeed(s, p, all.filter(!forgotten),
        all.filter(late || forgotten).select("doc_id"),
        budget, shards) // pinned by updateWithFeed — serves warm
    }
    feed.orderBy("shard", "pack_id")
  }

  /** Q226 — INCREMENTAL VERDICT STORE (r19): the corpus-serving loop
    * closed end to end. Epoch 1 (INIT): the batch ensemble runs over
    * the init corpus (everything but the late batch, doc_id % 11 ==
    * 7) and seeds [[graft.streaming.VerdictStore]]; its frozen
    * artifacts (capped LM + fences) PERSIST through
    * [[graft.streaming.FrozenArtifacts]]. Epoch 2 (SERVE): the late
    * batch is scored by a RELOADED copy of those artifacts — the
    * restart-safe path — with [[graft.streaming.CorpusStreams
    * .verdictStream]]'s row-local scorer (frozen-model rule: arriving
    * docs are unseen, so ALL of them score, not just a held-out
    * split), and upserts into the store. The oracle replays BOTH
    * epochs: batch flags for init docs, frozen-model scoring (fences
    * and LM trained on the init corpus only) for late ones — an
    * engine that re-trained on the grown corpus, leaked late docs
    * into the frozen model, or dropped the held-out-vs-everyone rule
    * distinction hash-fails. */
  def q226VerdictStore(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.VerdictStore
    val path = q226StorePath(s, dir)
    // steady-state serve: the warm store frame pins once per
    // (session, dir) — the r20 bucket layout pays |buckets| directory
    // reads per cold read(), which a serving engine amortizes exactly
    // like the q207/q92 pins (the documented FixtureCache bench
    // contract: Verify's run 1 prices the full build + cold read)
    graft.FixtureCache.once(s, s"q226read|$dir") {
      VerdictStore.read(s, path).localCheckpoint(true)
    }.orderBy("doc_id")
  }

  /** The q226 store's pinned PATH — ONE cache key, one build,
    * shared by q226's warm read pin, q228's keepers, and q235's
    * bucket-pruned lookup (which needs the path WITHOUT forcing the
    * full-store warm pin). */
  private def q226StorePath(s: SparkSession, dir: String): String = {
    import graft.streaming.{CorpusStreams, FrozenArtifacts, VerdictStore}
    graft.FixtureCache.once(s, s"q226|$dir") {
      val app = s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val p = s"/root/repo/target/tmp/q226_verdicts_$app"
      val aP = s"/root/repo/target/tmp/q226_artifacts_$app"
      val all = docs(s, dir)
        .select("doc_id", "lang", "n_chars", "text")
        .localCheckpoint(true)
      val late = col("doc_id") % 11 === 7
      val init = all.filter(!late)
      // epoch 0: batch ensemble over the init corpus → store + frozen
      // artifacts. ONE bigram pass feeds both the held-out scoring
      // and the freeze (the shared-lineage rule)
      val bg = bigramsOf(init).localCheckpoint(true)
      VerdictStore.init(s, p, verdictRows(
        composeFlags(s, dir, init, lmScoresFromBigrams(bg))))
      val frozen = CorpusStreams.freezeLmFromTrain(
        bg.filter(lmTrainSplit))
      // the oracle replays an UNCAPPED model: loud if the cap ever
      // binds at a tested scale (then the cap must be modeled in the
      // SQL, not silently diverged from)
      require(frozen.cbg.size < CorpusStreams.DefaultLmMaxBigrams,
        s"q226: the frozen-LM cap binds (${frozen.cbg.size} bigrams)" +
          " — model the cap in the oracle before growing the fixture")
      FrozenArtifacts.write(s, aP, frozen,
        CorpusStreams.freezeFencesOf(init), version = 1L)
      // epoch 1: reload (the restart path) and score the late batch
      val (lm, fences, _) = FrozenArtifacts.read(s, aP)
      val clfKeep = graft.queries.SimilarityQueries
        .q94ClassifierScore(s, dir)
        .select(col("vec_id").as("doc_id"), col("keep"))
        .localCheckpoint(true)
      val n = VerdictStore.ingest(s, p,
        CorpusStreams.verdictStream(all.filter(late), fences, lm,
          clfKeep).drop("score"), epoch = 1L)
      require(n > 0, "q226: the late batch must be non-empty")
      p
    }
  }

  /** Q235 — the DSAR LOOKUP under the oracle gate (r20): "what is
    * stored about these subjects" served through [[graft.streaming
    * .VerdictStore.lookup]] — the BUCKET-PRUNED point read (only the
    * buckets the requested ids hash into are opened; the spec proves
    * the pruning physically, this query proves the ANSWER). The id
    * set is every subject with doc_id % 17 == 3, including ids the
    * store never admitted (the init epoch drops null-lang docs) —
    * lookup must skip them, not null-pad. Oracle: the q226 two-epoch
    * replay restricted to the requested ids. */
  def q235LookupAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.VerdictStore
    val path = q226StorePath(s, dir) // builds once, never the warm pin
    val ids = docs(s, dir).filter(col("doc_id") % 17 === 3)
      .select("doc_id")
    VerdictStore.lookup(s, path, ids).orderBy("doc_id")
  }

  /** Q227 — DEDUP-AWARE corpus mixing (r19): q63's per-language
    * token-budget admission over cluster CANONICALS only — a
    * near-duplicate never consumes budget (admitting three copies of
    * one document under a 3000-token budget crowds out two real
    * documents), the step multilingual data-mixing pipelines run
    * between dedup and sampling. Clusters come from the q62 simhash
    * components (pinned per session — cluster membership is dedup
    * store state, the IncrementalDedup posture); each lang also
    * reports how many duplicates the gate skipped. Oracle: the q62
    * recursive-CTE components feeding q63's window admission. */
  def q227DedupMix(s: SparkSession, dir: String,
      budget: Long = 3000): DataFrame = {
    import graft.functions.TextFunctions.seededHash
    val clusters = graft.FixtureCache.once(s, s"dedup_canon|$dir") {
      q62DupClusters(s, dir).select(col("doc_id"), col("canonical"))
        .localCheckpoint(true)
    }
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("ntok"),
        seededHash(col("doc_id").cast("string"), 1).as("h"))
      .join(clusters, "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val admitted = d.filter(col("doc_id") === col("canonical"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .filter(col("cum") <= budget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
    val dups = d.filter(col("doc_id") =!= col("canonical"))
      .groupBy("lang").agg(count(lit(1)).as("n_dups_skipped"))
    admitted.join(dups, Seq("lang"), "left")
      .withColumn("n_dups_skipped",
        coalesce(col("n_dups_skipped"), lit(0L)))
      .orderBy("lang")
  }

  /** Q228 — STORE-DRIVEN corpus build (r19, the serving loop's last
    * arrow): the q220 pack manifest built from the INCREMENTAL
    * VERDICT STORE's keepers (q226) instead of a from-scratch
    * ensemble run — what a production pipeline actually ships once
    * verdicts are maintained state. The oracle replays the two-epoch
    * verdict rules (init batch / frozen late) AND the packing, so a
    * store serving stale or mis-epoched verdicts mis-packs and
    * hash-fails. */
  def q228StoreDrivenBuild(s: SparkSession, dir: String,
      budget: Long = 2048, shards: Int = 8): DataFrame = {
    val keep = q226VerdictStore(s, dir)
      .filter(col("verdict") === "keep").select("doc_id")
    val d = docs(s, dir).join(keep, "doc_id")
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ntok"))
    graft.operators.CorpusManifest.manifestRows(d, budget, shards)
      .orderBy("shard", "pack_id")
  }

  /** Q232 — FROZEN-MODEL ROTATION (r20): the lifecycle q226 stops
    * short of. A production scorer does not serve epoch-0's frozen
    * artifacts forever — it periodically RE-FREEZES from the grown
    * corpus and rescores later arrivals under the new model, while
    * every verdict already stored STANDS (retroactively rescoring
    * served corpus would churn downstream builds for no new
    * information). Three epochs under the gate:
    *   - epoch 0 (INIT): the batch ensemble over the init corpus
    *     (neither late split) seeds the store; its LM + fences
    *     freeze as [[graft.streaming.FrozenArtifacts]] VERSION 1;
    *   - epoch 1 (SERVE v1): late batch 1 (doc_id % 11 == 7) scores
    *     against the reloaded v1 artifacts — q226's path;
    *   - ROTATION: version 2 re-freezes from the GROWN corpus
    *     (init + late batch 1 — the docs the store has seen, the
    *     CCNet re-train cycle), REPLACING v1 atomically;
    *   - epoch 2 (SERVE v2): late batch 2 (doc_id % 13 == 11, minus
    *     the late-1 overlap) scores against the reloaded v2.
    * The epoch-sequenced merge makes the rotation safe by
    * construction: pre-rotation verdicts keep their epochs (a
    * replayed pre-rotation batch still lands BELOW them), and only
    * post-rotation arrivals carry epoch 2. The DuckDB oracle replays
    * all three rule groups — batch flags for init docs, v1-frozen
    * flags (fences + LM trained on init) for late-1 docs, v2-frozen
    * flags (trained on init + late 1) for late-2 docs; an engine
    * that kept scoring under v1, leaked late-2 docs into the v2
    * training set, or rescored stored epochs hash-fails. */
  def q232ModelRotation(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{CorpusStreams, FrozenArtifacts, VerdictStore}
    val path = graft.FixtureCache.once(s, s"q232|$dir") {
      val app = s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val p = s"/root/repo/target/tmp/q232_verdicts_$app"
      val aP = s"/root/repo/target/tmp/q232_artifacts_$app"
      val all = docs(s, dir)
        .select("doc_id", "lang", "n_chars", "text")
        .localCheckpoint(true)
      val late1 = col("doc_id") % 11 === 7
      val late2 = col("doc_id") % 13 === 11 && col("doc_id") % 11 =!= 7
      val init = all.filter(!late1 && !late2)
      val clfKeep = graft.queries.SimilarityQueries
        .q94ClassifierScore(s, dir)
        .select(col("vec_id").as("doc_id"), col("keep"))
        .localCheckpoint(true)
      // epoch 0: batch ensemble over the init corpus → store; v1
      // artifacts freeze from the SAME bigram checkpoint
      val bg = bigramsOf(init).localCheckpoint(true)
      VerdictStore.init(s, p, verdictRows(
        composeFlags(s, dir, init, lmScoresFromBigrams(bg))))
      val v1 = CorpusStreams.freezeLmFromTrain(bg.filter(lmTrainSplit))
      require(v1.cbg.size < CorpusStreams.DefaultLmMaxBigrams,
        s"q232: the v1 frozen-LM cap binds (${v1.cbg.size} bigrams)" +
          " — model the cap in the oracle before growing the fixture")
      FrozenArtifacts.write(s, aP, v1,
        CorpusStreams.freezeFencesOf(init), version = 1L)
      // epoch 1: late batch 1 scores under the RELOADED v1
      val (lm1, fen1, ver1) = FrozenArtifacts.read(s, aP)
      require(ver1 == 1L, s"q232: expected artifact v1, got v$ver1")
      VerdictStore.ingest(s, p,
        CorpusStreams.verdictStream(all.filter(late1), fen1, lm1,
          clfKeep).drop("score"), epoch = 1L)
      // ROTATION: v2 re-freezes from the grown corpus and REPLACES
      // v1 (one artifact path, atomically swapped — the scorer that
      // restarts mid-rotation serves one complete version or the
      // other, never a blend)
      val grown = all.filter(!late2)
      val v2 = CorpusStreams.freezeLmOf(grown)
      require(v2.cbg.size < CorpusStreams.DefaultLmMaxBigrams,
        s"q232: the v2 frozen-LM cap binds (${v2.cbg.size} bigrams)" +
          " — model the cap in the oracle before growing the fixture")
      FrozenArtifacts.write(s, aP, v2,
        CorpusStreams.freezeFencesOf(grown), version = 2L)
      // epoch 2: late batch 2 scores under the RELOADED v2;
      // everything stored before the rotation stands untouched
      val (lm2, fen2, ver2) = FrozenArtifacts.read(s, aP)
      require(ver2 == 2L, s"q232: expected artifact v2, got v$ver2")
      VerdictStore.ingest(s, p,
        CorpusStreams.verdictStream(all.filter(late2), fen2, lm2,
          clfKeep).drop("score"), epoch = 2L)
      p
    }
    // steady-state serve (the q226 pin discipline)
    graft.FixtureCache.once(s, s"q232read|$dir") {
      VerdictStore.read(s, path).localCheckpoint(true)
    }.orderBy("doc_id")
  }

  /** Q234 — the GDPR CHAIN under the oracle gate (r20): the full
    * right-to-be-forgotten lifecycle the specs pin, now hash-checked
    * end to end. The late batch arrives through the STREAMING SINK
    * (run tag `r1`, epoch = persisted floor + batchId + 1 — the
    * restart-safe path); a deletion request tombstones every stored
    * doc with doc_id % 101 == 13 at epoch 2; the run RETIRES (its
    * checkpoints are gone, so nothing at epoch ≤ 2 can ever replay);
    * and the no-argument AUTO-COMPACTION derives exactly that proof
    * and physically drops the fences. The served store must equal
    * the two-epoch ensemble replay MINUS the forgotten ids — an
    * engine whose forget loses the merge, whose compaction drops a
    * live row, or whose auto floor under- or over-reaches hash-fails
    * (the fixture also self-checks: the derived floor must drop ALL
    * the fences, no more). */
  def q234GdprChain(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{CorpusStreams, VerdictStore}
    val path = graft.FixtureCache.once(s, s"q234|$dir") {
      val app = s.sparkContext.applicationId +
        "_" + graft.FixtureCache.dirTag(dir)
      val p = s"/root/repo/target/tmp/q234_verdicts_$app"
      val all = docs(s, dir)
        .select("doc_id", "lang", "n_chars", "text")
        .localCheckpoint(true)
      val late = col("doc_id") % 11 === 7
      val init = all.filter(!late)
      val bg = bigramsOf(init).localCheckpoint(true)
      VerdictStore.init(s, p, verdictRows(
        composeFlags(s, dir, init, lmScoresFromBigrams(bg))))
      val lm = CorpusStreams.freezeLmFromTrain(bg.filter(lmTrainSplit))
      require(lm.cbg.size < CorpusStreams.DefaultLmMaxBigrams,
        s"q234: the frozen-LM cap binds (${lm.cbg.size} bigrams) — " +
          "model the cap in the oracle before growing the fixture")
      val fences = CorpusStreams.freezeFencesOf(init)
      val clfKeep = graft.queries.SimilarityQueries
        .q94ClassifierScore(s, dir)
        .select(col("vec_id").as("doc_id"), col("keep"))
        .localCheckpoint(true)
      // the late batch arrives through the SINK — the path whose
      // persisted run floor the compaction proof hangs on. The feed
      // is a STAGED FILE STREAM (write the batch, readStream it
      // back), not a driver-side MemoryStream: the late batch is
      // corpus-proportional, and a production intake is exactly a
      // file/queue source — nothing here touches the driver
      val stage = s"${p}__late_feed"
      all.filter(late).write.mode("overwrite").parquet(stage)
      val q = VerdictStore.sink(
        CorpusStreams.verdictStream(
          s.readStream.schema(all.schema).parquet(stage),
          fences, lm, clfKeep), p, runTag = "r1").start()
      try q.processAllAvailable()
      finally q.stop()
      // the deletion request: every stored doc with doc_id % 101 == 13
      val doomed = VerdictStore.read(s, p)
        .filter(col("doc_id") % 101 === 13).select("doc_id")
        .localCheckpoint(true)
      val nDoomed = doomed.count()
      require(nDoomed > 0, "q234: the forget set must be non-empty")
      require(VerdictStore.forget(s, p, doomed, epoch = 2L) == nDoomed,
        "q234: the forget must remove exactly the requested live rows")
      // the run's checkpoints are deleted → retire → the auto floor
      // becomes provable and the fences physically drop
      VerdictStore.retireRun(s, p, "r1")
      val (floor, dropped) = VerdictStore.compact(s, p)
      require(floor >= 2L && dropped == nDoomed,
        s"q234: auto-compaction should drop all $nDoomed fences " +
          s"under a floor ≥ 2, got (floor=$floor, dropped=$dropped)")
      // the store then OUTGROWS its init-time bucket count and
      // rebuckets — the oracle's hash proves the atomic root swap
      // preserved every served row
      VerdictStore.rebucket(s, p, newBuckets = 16)
      require(VerdictStore.numBuckets(s, p) == 16,
        "q234: rebucket must land on the new bucket count")
      p
    }
    // steady-state serve (the q226 pin discipline)
    graft.FixtureCache.once(s, s"q234read|$dir") {
      VerdictStore.read(s, path).localCheckpoint(true)
    }.orderBy("doc_id")
  }

  /** Q218 — the ensemble FUNNEL (q69's audit shape over the full
    * ensemble): survivors after each filter applied cumulatively in
    * cascade order — the per-stage report that makes a corpus-nuking
    * filter visible immediately. */
  def q218EnsembleFunnel(s: SparkSession, dir: String): DataFrame =
    ensembleFlags(s, dir)
      .agg(count(lit(1)).as("n0"),
        sum(col("ratios_ok").cast("long")).as("n1"),
        sum((col("ratios_ok") * col("fences_ok")).cast("long")).as("n2"),
        sum((col("ratios_ok") * col("fences_ok") * col("clf_ok"))
          .cast("long")).as("n3"),
        sum((col("ratios_ok") * col("fences_ok") * col("clf_ok") *
          col("lm_ok")).cast("long")).as("n4"))
      .select(expr(
        "stack(5, 0, 'input', n0, 1, 'ratios', n1, 2, 'fences', n2, " +
          "3, 'classifier', n3, 4, 'lm', n4) " +
          "AS (stage_id, stage, n_kept)"))
      .orderBy("stage_id")
}
