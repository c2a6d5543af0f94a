package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the corpus-analysis operators beyond their DuckDB
  * replays: conservation laws that must hold for ANY corpus, so they
  * guard refactors the fixture-pinned oracle could miss. */
class TrainingOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q72 pair mass: weighted pair count equals sum of c*(len-1)") {
    val all = TextQueries.q72BpePairs(spark, dir, k = Int.MaxValue).collect()
    // every candidate really is an adjacent pair
    all.foreach(r => assert(r.getString(1).length === 2, r.toString))
    // ranks are 1..n with no gaps and counts are non-increasing
    assert(all.map(_.getLong(0)).toSeq === (1L to all.length))
    assert(all.map(_.getLong(2)).toSeq === all.map(_.getLong(2)).toSeq
      .sorted(Ordering[Long].reverse))
    val expected = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .select(greatest(length(col("w")) - 1, lit(0)).cast("long").as("m"))
      .agg(sum("m")).head.getLong(0)
    assert(all.map(_.getLong(2)).sum === expected)
  }

  test("minhashCrossPairsMd5: sides are structural — never within-side " +
    "pairs, symmetric inputs swap columns, plan is cross-join-free") {
    import spark.implicits._
    // two exact dups ACROSS sides, one exact dup WITHIN the left side
    // (must NOT pair), one unrelated doc per side
    val txt = "alpha beta gamma delta epsilon zeta"
    val left = Seq(1L -> txt, 2L -> txt,
      3L -> "one two three four five six").toDF("doc_id", "text")
    val right = Seq(10L -> txt,
      11L -> "seven eight nine ten eleven twelve").toDF("doc_id", "text")
    val pairs = TextQueries.minhashCrossPairsMd5(left, right)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // 1-10 and 2-10 meet at est=1.0; the within-left 1-2 dup never
    // appears, and nothing pairs the unrelated docs
    assert(pairs === Seq((1L, 10L, 1.0), (2L, 10L, 1.0)))
    // symmetric call: the same pairs with the sides swapped — the side
    // lives in the column, not in id conventions
    val swapped = TextQueries.minhashCrossPairsMd5(right, left)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(swapped === Seq((10L, 1L), (10L, 2L)))
    val p = TextQueries.minhashCrossPairsMd5(left, right)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cross join in:\n$p")
  }

  test("q138 fuzzy matching: deletion neighborhood is lossless for " +
    "edit distance <= 1 and the plan is cross-join-free") {
    // brute-force ground truth over random word pairs: every ed<=1
    // pair must share a deletion key (the SymSpell completeness law)
    val rnd = new scala.util.Random(11)
    def word(): String =
      (0 until 3 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    def delKeys(w: String): Set[String] =
      Set(w) ++ w.indices.map(i => w.take(i) + w.drop(i + 1))
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ws = Seq.fill(300)(word()).distinct
    var near = 0
    for (a <- ws; b <- ws if a < b && ed(a, b) <= 1) {
      near += 1
      assert(delKeys(a).intersect(delKeys(b)).nonEmpty,
        s"ed<=1 pair ($a, $b) shares no deletion key")
    }
    assert(near > 10, s"fixture self-check: only $near near pairs")
    val df = TextQueries.q138FuzzyTerms(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= 1L, r.toString))
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cross join in:\n$p")
  }

  test("q66 scoring covers every multi-token doc with tokens-1 bigrams") {
    val rows = TextQueries.q66LmXent(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.foreach { case (id, nt) =>
      if (nt >= 2) {
        val (nbg, xent) = rows(id)
        assert(nbg === (nt - 1).toLong, s"doc $id")
        // Laplace probabilities are strictly < 1, so -ln p > 0
        assert(xent.toDouble > 0.0, s"doc $id xent $xent")
      } else assert(!rows.contains(id), s"doc $id should have no bigrams")
    }
  }

  test("q73 chunking tiles every doc: ceil(nt/stride) chunks, exact tails") {
    val chunks = TextQueries.q73Chunks(spark, dir).collect()
      .groupBy(_.getLong(0))
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet === docs.keySet)
    docs.foreach { case (id, nt) =>
      val cs = chunks(id).sortBy(_.getLong(1))
      assert(cs.length === (nt + 24) / 25, s"doc $id chunk count")
      cs.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong, s"doc $id chunk ids")
        assert(r.getLong(2) === math.min(50, nt - 25 * i).toLong,
          s"doc $id chunk $i token count")
      }
    }
  }

  test("q70 attribution conserves the pair graph") {
    val nPairs = TextQueries.q48SimhashPairs(spark, dir).count()
    val attributed = TextQueries.q70DupSources(spark, dir).collect()
    assert(attributed.map(_.getLong(2)).sum === nPairs)
    // unordered source pairs are canonically ordered
    attributed.foreach(r =>
      assert(r.getString(0) <= r.getString(1), r.toString))
  }

  test("q233's unified store holds one verdict per (modality, item): " +
    "the keep-best winners (upscale/uncut/long originals) keep, " +
    "their cluster-mates drop as dups, and the pack covers exactly " +
    "the keepers") {
    // force the store build, then read it back directly
    val manifest = PipelineQueries.q233MultimodalBuild(spark, dir)
      .collect()
    val p = graft.FixtureCache.once(spark, s"q233|$dir") {
      fail("q233 store must already be pinned"); ""
    }
    val store = graft.sources.SnapshotStore.read(spark, p)
    // one row per (modality, item_id)
    assert(store.groupBy("modality", "item_id").count()
      .filter(col("count") > 1).count() === 0L)
    def verdictOf(m: String, id: String): (String, Any) = {
      val r = store.filter(col("modality") === m &&
        col("item_id") === id).collect()
      assert(r.length === 1, s"$m:$id")
      (r.head.getString(2), r.head.get(3))
    }
    // image: the 2x upscale out-resolves its cluster; both lower-res
    // copies drop as dups
    assert(verdictOf("image", "m01_hires") === ("keep", null))
    assert(verdictOf("image", "m01") === ("drop", "dup"))
    assert(verdictOf("image", "m01_dup") === ("drop", "dup"))
    assert(verdictOf("image", "m03_far")._1 === "keep") // singleton
    // audio: the uncut recording beats its trimmed repost
    assert(verdictOf("audio", "s1") === ("keep", null))
    assert(verdictOf("audio", "s1_trim") === ("drop", "dup"))
    // video: the full container beats the one-frame-shorter cut
    assert(verdictOf("video", "vidA") === ("keep", null))
    assert(verdictOf("video", "vidA_cut") === ("drop", "dup"))
    assert(verdictOf("video", "vidC")._1 === "keep")
    // the manifest packs exactly the store's keepers, every modality
    // represented
    val keepers = store.filter(col("verdict") === "keep").count()
    assert(manifest.map(_.getLong(2)).sum === keepers)
    Seq(4, 5, 6, 7).foreach(i => // n_text/n_image/n_audio/n_video
      assert(manifest.map(_.getLong(i)).sum > 0L, s"column $i empty"))
  }
}
