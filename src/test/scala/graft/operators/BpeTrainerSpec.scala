package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Golden replay of the BPE trainer against a plain-Scala reference
  * implementation of the public algorithm (leftmost non-overlapping
  * merge, count-then-lexicographic pair selection) — on the classic
  * low/lower/newest/widest example and on real fixture words. */
class BpeTrainerSpec extends SparkSpec {

  /** Reference BPE: (merge list, final segmentation by word). Tie-break
    * uses Scala String ordering (UTF-16 code units), which agrees with
    * the trainer's Spark UTF8 binary order for BMP text — corpora here
    * stay ASCII; supplementary-plane symbols would order differently. */
  private def refBpe(words: Map[String, Long],
      n: Int): (Seq[(String, String)], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.split("").filter(_.nonEmpty).toVector }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var it = 0
    while (it < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (w, syms) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + words(w)
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += pair
        segs = segs.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size
                && syms(i) == pair._1 && syms(i + 1) == pair._2) {
              out += (pair._1 + pair._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
      it += 1
    }
    (merges.toSeq, segs)
  }

  private def wordsOf(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def check(docs: Seq[String], nMerges: Int): Unit = {
    import spark.implicits._
    val df = docs.toDF("text")
    val (merges, vocab) = BpeTrainer.train(df, nMerges)
    val words = wordsOf(docs)
    val (expMerges, expSegs) = refBpe(words, nMerges)
    assert(merges === expMerges)
    // final segmentations agree word-for-word: rebuild the word from its
    // symbols to key the comparison, then compare symbol sequences
    val got = vocab.collect().map { r =>
      val syms = r.getSeq[String](0).toVector
      (syms.mkString, (syms, r.getLong(1)))
    }.toMap
    assert(got.keySet === expSegs.keySet)
    expSegs.foreach { case (w, syms) =>
      assert(got(w)._1 === syms, s"word $w")
      assert(got(w)._2 === words(w), s"count of $w")
    }
  }

  test("classic low/lower/newest/widest corpus learns the known merges") {
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    check(docs, 8)
  }

  test("fixture documents: 5 merges match the reference exactly") {
    val texts = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select("text").limit(60).collect().map(_.getString(0)).toSeq
    check(texts, 5)
  }

  test("merging stops when the vocabulary is fully fused") {
    // single repeated word: after len-1 merges every word is one symbol
    check(Seq.fill(4)("abc"), 10)
  }

  test("BpeEncode kernel reproduces the trained segmentation for every " +
    "vocabulary word") {
    import spark.implicits._
    val docsDf = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .limit(100)
    val (merges, seg) = BpeTrainer.train(docsDf, nMerges = 12)
    // trained segmentation: word (reconstructed) -> symbol list
    val trained = seg.collect().map { r =>
      val syms = r.getSeq[String](0)
      syms.mkString -> syms
    }.toMap
    // the kernel, applied to the bare words, must reproduce it exactly
    val got = trained.keySet.toSeq.sorted.toDF("w")
      .select(col("w"), graft.functions.TextKernelExpressions
        .bpeEncode(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet === trained.keySet)
    trained.foreach { case (w, syms) =>
      assert(got(w) === syms, s"word $w")
    }
    // multi-word text concatenates per-word encodings in order
    val two = trained.keySet.toSeq.sorted.take(2)
    if (two.size == 2) {
      val joined = Seq(two.mkString(" ")).toDF("t")
        .select(graft.functions.TextKernelExpressions
          .bpeEncode(col("t"), merges).as("toks"))
        .head().getSeq[String](0)
      assert(joined === trained(two(0)) ++ trained(two(1)))
    }
  }

  test("randomized corpora over a tiny alphabet match the reference") {
    // tiny alphabet forces heavy pair collisions, overlap runs (aaa...)
    // and count ties — the adversarial cases for leftmost-merge and
    // lexicographic tie-breaking
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val docs = Seq.fill(30)(
        Seq.fill(rnd.nextInt(4) + 1)(
          Seq.fill(rnd.nextInt(6) + 1)("ab" (rnd.nextInt(2))).mkString)
          .mkString(" "))
      check(docs, 4)
    }
  }
}
