package graft.queries

import graft.Tables
import graft.functions.VectorFunctions.{cosine, dot, normalized}
import graft.operators.Materialize
import graft.similarity.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star ANN surface;
  * SURVEY §2.11 Q23).
  *
  * The pair kernel is graft.functions.VectorFunctions.DotProduct — a native
  * codegen Expression. Embeddings are L2-normalized ONCE (and cached for
  * self-joins) so every pair costs a single dot product; the norms never
  * enter the O(n²) loop. Brute-force top-k broadcasts the single query
  * vector, so at 100 TB the scan is embarrassingly parallel and the only
  * gather is TakeOrderedAndProject. The IVF variant adds a coarse-quantizer
  * assignment so candidate sets shrink by ~centroids× before scoring — the
  * standard scale path.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))

  /** Normalized embeddings; `cached=true` pins the frame (Materialize.pin:
    * MEMORY_AND_DISK, checkpoint-able) for self-join queries — both join
    * sides reuse the same normalization; false for single-pass scans where
    * an InMemoryRelation would only break whole-stage codegen. */
  private def embNorm(s: SparkSession, dir: String,
      cached: Boolean = true): DataFrame = {
    val n = emb(s, dir)
      .select(col("vec_id"), normalized(col("emb")).as("nemb"))
    if (cached) Materialize.pin(n) else n
  }

  /** Q23 — brute-force exact cosine top-5 neighbors of vec_id=1. Uncached:
    * one codegen'd pass over the scan, broadcast query vector,
    * TakeOrderedAndProject gather. */
  def q23CosineKnn(s: SparkSession, dir: String): DataFrame = {
    val e = embNorm(s, dir, cached = false)
    val target = broadcast(e.filter(col("vec_id") === 1)
      .select(col("nemb").as("q")))
    e.filter(col("vec_id") =!= 1)
      .crossJoin(target)
      .select(col("vec_id"), round(dot(col("nemb"), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** q23's ranked list at arbitrary depth — the VECTOR leg of hybrid
    * fusion (q93): (rank, doc_id) with the rank key the 4-decimal
    * rounded cosine (q23's cross-engine tie-break). Same plan shape as
    * q23: broadcast query vector, one codegen pass, TakeOrdered. */
  private[graft] def cosineRanked(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    val e = embNorm(s, dir, cached = false)
    val target = broadcast(e.filter(col("vec_id") === 1)
      .select(col("nemb").as("q")))
    e.filter(col("vec_id") =!= 1)
      .crossJoin(target)
      .select(col("vec_id"), round(dot(col("nemb"), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("rank"), col("vec_id").as("doc_id"))
  }

  /** Embedding-cosine near-duplicate pairs (all pairs above threshold).
    *
    * NON-PRODUCTION: O(n²) crossJoin kept ONLY as the oracle-checkable
    * exactness baseline that q44 (hyperplane LSH) and q34/IvfIndex (IVF)
    * are measured against — reach for those at scale. The input is capped
    * IN CODE to the first `cap` vec_ids (a pushed-down scan predicate), so
    * the baseline is fixture-bounded by construction: at sf<=0.01 the cap
    * covers every row (oracle-identical), at any larger scale the pair
    * space stays <=cap², never O(corpus²). */
  def q33EmbCosPairs(s: SparkSession, dir: String,
      threshold: Double = 0.4, cap: Int = 500): DataFrame = {
    val e = emb(s, dir)
      .filter(col("vec_id") < cap)
      .select(col("vec_id"), normalized(col("emb")).as("nemb"))
      .transform(Materialize.pin)
    val a = e.select(col("vec_id").as("a"), col("nemb").as("ea"))
    val b = e.select(col("vec_id").as("b"), col("nemb").as("eb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("a", "b")
  }

  /** Q126 — cosine kNN JOIN: top-k neighbors for EVERY query in a
    * query set (vec_id 100..107 here), the batch shape embedding
    * dedup / retrieval eval actually runs — q23 answers one query,
    * this answers a table of them in one pass.
    *
    * Scale posture: the query set broadcasts (it is the small side by
    * definition), the corpus scan scores |Q| candidates per row
    * map-side, and the per-query top-k is
    * [[graft.functions.TopKFunctions.topK]] — a mergeable bounded
    * aggregate, so Spark's partial-aggregation phase reduces every
    * input partition to k rows per query BEFORE the exchange; the
    * shuffle carries O(partitions × |Q| × k) summary rows, never the
    * |corpus| × |Q| scored candidates a row_number window would ship.
    * Scores are rounded BEFORE the aggregate so the rank order and the
    * displayed value can never disagree (the q23 tie rule: score desc,
    * vec_id asc). */
  def q126KnnJoin(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embNorm(s, dir, cached = false)
    val queries = broadcast(
      embNorm(s, dir, cached = false)
        .filter(col("vec_id") >= 100 && col("vec_id") < 108)
        .select(col("vec_id").as("q_id"), col("nemb").as("q")))
    e.crossJoin(queries)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("nemb"), col("q")), 4).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions.topK(
        col("sim"), col("vec_id"), k).as("nn"))
      .select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("vec_id"), col("col.score").as("sim"))
      .orderBy("q_id", "rank")
  }

  /** Q127 — IVF kNN JOIN, the scale path of [[q126KnnJoin]]: the
    * corpus computes its coarse cell MAP-SIDE (the [[q34AnnIvf]]
    * codegen argmax — zero shuffle), the query set's probe cells
    * (top-nProbe centroids per query) are computed driver-side from
    * the collected codebook — bounded by the REQUEST (|Q| × nCells
    * dots), never the corpus — and broadcast as a (cell, query)
    * table, so the candidate set is an EQUI-join on cell: each corpus
    * row is scored only against queries probing its cell (~nProbe /
    * nCells of the q126 work), then the same mergeable
    * [[graft.functions.TopKFunctions.topK]] pre-reduces per query.
    * Deterministic (first-nCentroids codebook, the q34 contract) so
    * DuckDB replays cell assignment, probe selection, and ranking
    * end to end. */
  def q127IvfKnnJoin(s: SparkSession, dir: String,
      nCentroids: Int = 16, nProbe: Int = 4, k: Int = 3): DataFrame = {
    val e = embNorm(s, dir, cached = false)
    val book = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id"), col("nemb")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq)
      .sortBy(_._1).toSeq
    def dotL(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map(_ * _).sum
    val qs = e.filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id"), col("nemb")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq)
      .sortBy(_._1).toSeq
    // (cell, q_id, qvec): nProbe rows per query — the request-bounded
    // probe plan, broadcast to every corpus partition
    val probeRows = qs.flatMap { case (qid, qv) =>
      book.map { case (cid, c) => (cid, dotL(c, qv)) }
        .sortBy { case (cid, sim) => (-sim, cid) }
        .take(nProbe)
        .map { case (cid, _) => (cid, qid, qv) }
    }
    import s.implicits._
    val probeDf = broadcast(
      probeRows.toDF("cell", "q_id", "q"))
    e.withColumn("cell",
      element_at(typedlit(book.map(_._1)),
        graft.functions.VectorFunctions.nearestCell(
          col("nemb"), book.map(_._2)) + 1))
      .join(probeDf, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("nemb"), col("q")), 4).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKFunctions.topK(
        col("sim"), col("vec_id"), k).as("nn"))
      .select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("vec_id"), col("col.score").as("sim"))
      .orderBy("q_id", "rank")
  }

  /** Q129 — FILTERED kNN: top-5 neighbors of vec_id=1 AMONG label=3
    * vectors only — the "similar docs in this collection" shape every
    * vector store serves. The predicate applies BEFORE the top-k cut
    * (filtering after would return fewer than k rows — the classic
    * filtered-ANN bug), and it reaches the parquet scan as a pushed
    * filter next to the column pruning; the persisted-index twin is
    * [[graft.similarity.IvfIndex.search]]'s `filter` argument
    * (metadata columns ride the index rows via `build(metaCols=...)`),
    * spec-pinned equal to this shape over the probed cells. */
  def q129FilteredKnn(s: SparkSession, dir: String, label: Int = 3,
      k: Int = 5): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("label"), normalized(col("emb")).as("nemb"))
    val target = broadcast(e.filter(col("vec_id") === 1)
      .select(col("nemb").as("q")))
    e.filter(col("label") === label && col("vec_id") =!= 1)
      .crossJoin(target)
      .select(col("vec_id"), col("label"),
        round(dot(col("nemb"), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Q143 — LABEL-OUTLIER audit: each vector's cosine similarity to
    * its OWN label's centroid, bottom-k reported — the
    * "probably mislabeled / junk embedding" list every curation pass
    * wants. Centroid = per-dimension mean of the label's normalized
    * vectors (rounded to 8 decimals so the replay is
    * summation-order-insensitive), similarity = one codegen dot.
    * Scale: the centroid build shuffles nLabels×dim partial sums
    * (map-side combine), the scoring pass is map-side against the
    * broadcast centroid table. */
  def q143LabelOutliers(s: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("label"), normalized(col("emb")).as("nemb"))
    val cent = e
      .select(col("label"), posexplode(col("nemb")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(round(avg("x"), 8).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"),
        transform(col("pm"), p => p.getField("m")).as("cvec"))
    e.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(dot(col("nemb"), col("cvec")), 4).as("centroid_sim"))
      .orderBy(col("centroid_sim"), col("vec_id"))
      .limit(k)
  }

  /** Q128 — recall@3 of the IVF kNN join against the exact one: the
    * q58 evaluation harness applied to the JOIN shape, so the
    * cell-pruning's quality cost on a BATCH of queries is a measured
    * number (24 = 8 queries × k). Deterministic, both legs
    * oracle-proven. */
  def q128KnnJoinRecall(s: SparkSession, dir: String): DataFrame = {
    val ivf = q127IvfKnnJoin(s, dir).select("q_id", "vec_id")
    val exact = q126KnnJoin(s, dir).select("q_id", "vec_id")
    ivf.intersect(exact)
      .agg((count(lit(1)) / 24.0).as("recall_at_3"))
  }

  /** IVF-style ANN: coarse centroids = the vectors with vec_id < nCentroids
    * (deterministic codebook — no training pass needed for the fixture).
    * Every vector is assigned to its nearest centroid cell; the query probes
    * the nProbe nearest cells and scores only those candidates.
    *
    * The codebook and query vector are driver-small, so both the assignment
    * (codegen argmax over the collected codebook — see
    * [[graft.functions.VectorFunctions.NearestCentroid]]) and the probe-cell
    * choice happen map-side/driver-side: the corpus streams through ONE scan
    * with zero joins — filter to probed cells, one dot per survivor,
    * TakeOrderedAndProject. Fully deterministic (ties → lowest cent_id), so
    * the DuckDB oracle replays it exactly. */
  /** Q236 — RIGHT-TO-BE-FORGOTTEN on the PERSISTED ANN index (r20):
    * the GDPR chain extended to the similarity-serving store. The
    * lifecycle under the gate: [[graft.similarity.IvfIndex.build]]
    * over the embeddings (deterministic 16-cell codebook, the q34
    * contract), `forget(vec_id % 13 == 2)` writes the id-only
    * tombstone fence (no data file rewritten — an id-keyed delete
    * cannot prune by `cell`, so eager physical deletion would scan
    * the index per request), a probe under the FENCE (phase
    * `serve_fence`: the anti-join applies BEFORE the top-k cut, so
    * forgotten vectors never surface and the probe still returns k
    * rows), then `compact` physically drops the rows and clears the
    * fence atomically with its swap, and the probe re-runs (phase
    * `post_compact`). Both phases must answer IDENTICALLY — the
    * logical fence and the physical removal are one contract — and
    * the DuckDB oracle replays the pruned probe over the surviving
    * vectors for both phase tags: a forgotten row surfacing in
    * either phase, or a fence that cut the result short, hash-fails.
    * The codebook keeps its trained centroids across the forget
    * (re-clustering is the offline rebuild event, the FAISS
    * posture), which the oracle mirrors by ranking cells over ALL
    * vectors. */
  def q236IvfForget(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.IvfIndex
    val path = graft.FixtureCache.once(s, s"q236|$dir") {
      val p = s"/root/repo/target/tmp/q236_ivf_" +
        s.sparkContext.applicationId + "_" +
        graft.FixtureCache.dirTag(dir)
      val e = Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      IvfIndex.build(e, p, nCells = 16)
      IvfIndex.forget(s, p,
        e.filter(col("vec_id") % 13 === 2).select("vec_id"))
      p
    }
    val q = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    // pinned BEFORE compact swaps the directory out from under the
    // lazy plan (the fence answer must come from the fenced index)
    val fenced = IvfIndex.search(s, path, q, nProbe = 4, k = 10)
      .withColumn("phase", lit("serve_fence"))
      .localCheckpoint(true)
    graft.FixtureCache.once(s, s"q236compact|$dir") {
      IvfIndex.compact(s, path)
    }
    val physical = IvfIndex.search(s, path, q, nProbe = 4, k = 10)
      .withColumn("phase", lit("post_compact"))
    fenced.unionByName(physical)
      .select("phase", "vec_id", "sim")
      .orderBy(col("phase"), col("sim").desc, col("vec_id"))
  }

  def q34AnnIvf(s: SparkSession, dir: String, queryId: Long = 1,
      nCentroids: Int = 16, nProbe: Int = 4, k: Int = 5): DataFrame = {
    val e = embNorm(s, dir, cached = false)
    // tiny pushed-down lookups (vec_id < nCentroids / = queryId)
    val book = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id"), col("nemb")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq)
      .sortBy(_._1).toSeq
    val qn = e.filter(col("vec_id") === queryId)
      .select(col("nemb")).head()
      .getAs[scala.collection.Seq[Double]](0).toSeq
    def dotL(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map(_ * _).sum
    val probes = book.map { case (id, c) => id -> dotL(c, qn) }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(nProbe).map(_._1)

    e.withColumn("cell",
      element_at(typedlit(book.map(_._1)),
        graft.functions.VectorFunctions.nearestCell(
          col("nemb"), book.map(_._2)) + 1))
      .filter(col("cell").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), round(dot(col("nemb"), typedlit(qn)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Q53 — int8 embedding quantization (the storage form at 100 TB: 4×
    * smaller than float32, 8× smaller than float64): per-vector max-abs
    * scale, symmetric round-half-up to [-127,127], plus the reconstruction
    * error so the quality loss is measurable. Every step is elementary
    * float math (floor, not round — tie-free across engines), so DuckDB
    * replays it exactly; error is reported in ppm so ROUND(x,4) keeps
    * signal. */
  def q53QuantizeI8(s: SparkSession, dir: String): DataFrame = {
    val v = col("emb")
    val scale = lit(127.0) /
      greatest(array_max(transform(v, x => abs(x))), lit(1e-12))
    // outputs truncated (floor), not round()ed: the generator's quantized
    // values land scale exactly on .00005 ties, where Spark's HALF_UP and
    // DuckDB's binary rounding disagree — floor over a double is pure.
    // Full-precision scale rides as "_scale": an output alias "scale" in
    // the same SELECT would hijack col("scale") inside the lambda via
    // lateral-column-alias resolution (Spark 3.4+) and quantize against
    // the TRUNCATED scale.
    emb(s, dir)
      .select(col("vec_id"), col("emb"), scale.as("_scale"))
      .select(col("vec_id"),
        (floor(col("_scale") * 1e4) / 1e4).as("scale"),
        (floor(
          aggregate(
            transform(col("emb"), x => {
              val q = greatest(lit(-127.0),
                least(lit(127.0), floor(x * col("_scale") + 0.5)))
              val e = x - q / col("_scale")
              e * e
            }),
            lit(0.0), (acc, e) => acc + e) / size(col("emb")) * 1e10) / 1e4)
          .as("mse_ppm"))
      .orderBy("vec_id")
  }

  /** Q58 — ANN quality evaluation: recall@5 of the IVF probe (q34)
    * against the exact top-5 (q23) for the same query vector. The number a
    * pipeline owner actually watches when tuning nProbe/nCells — and fully
    * deterministic, so the oracle composes the two replayed subqueries. */
  def q58AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val ivf = q34AnnIvf(s, dir).select(col("vec_id"))
    val exact = q23CosineKnn(s, dir).select(col("vec_id"))
    ivf.join(exact, "vec_id")
      .agg((count(lit(1)).cast("double") / 5).as("recall_at_5"))
  }

  /** Un-normalized cosine kept for spec cross-checks. */
  def cosineRaw(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    cosine(a, b)

  /** Deterministic ±1 random-hyperplane set for sign-LSH. */
  def hyperplanes(bits: Int, dim: Int): IndexedSeq[Seq[Double]] =
    (0 until bits).map { b =>
      (0 until dim).map { d =>
        val h = (b * 1315423911L + d * 2654435761L) ^ 0x9e3779b97f4a7c15L
        if (((h >>> 17) & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Q44 — embedding near-dup via random-hyperplane LSH: 16 sign bits per
    * vector (16 codegen dot products), banded into 2×8-bit keys; candidate
    * pairs come from the band equi-join and only candidates pay the exact
    * cosine — the scale path that replaces q33's O(n²) scan. The plane set
    * is deterministic, so the whole pipeline is DuckDB-replayed (planes as
    * a VALUES table in the oracle); recall-vs-exact is additionally
    * spec-tested. */
  def q44EmbLshPairs(s: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame =
    embLshPairs(embNorm(s, dir), threshold)

  /** LSH pair pipeline over a (vec_id, nemb) frame (reused by specs). */
  def embLshPairs(e: DataFrame, threshold: Double): DataFrame =
    embLshPairsRaw(e, threshold).orderBy("a", "b")

  /** [[embLshPairs]] without the presentation sort — compositions (q67)
    * consume this so the sort cannot survive under componentLabels'
    * union (EliminateSorts has no Union case). */
  private[graft] def embLshPairsRaw(e: DataFrame,
      threshold: Double): DataFrame = {
    val bits = 16
    val dim = e.select(size(col("nemb"))).head().getInt(0)
    val planes = hyperplanes(bits, dim)
    val sig = (0 until bits).map(b =>
      when(dot(col("nemb"), typedlit(planes(b))) > 0, lit(1L << b))
        .otherwise(lit(0L))).reduce(_ + _)
    val signed = e.withColumn("sig", sig)
      .withColumn("band", explode(array((0 until 2).map(bd =>
        struct(lit(bd).as("b"),
          shiftright(col("sig"), bd * 8).bitwiseAND(lit(255L)).as("v"))
      ): _*)))
      .transform(Materialize.pin)
    val a = signed.select(col("vec_id").as("a"), col("nemb").as("ea"),
      col("band"))
    val b = signed.select(col("vec_id").as("b"), col("nemb").as("eb"),
      col("band"))
    a.join(b, Seq("band"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")), 4).as("sim"))
      .distinct()
      .filter(col("sim") >= threshold)
  }

  /** Q67 — semantic dedup, end to end (SemDeDup-shaped): hyperplane-LSH
    * near-dup pairs over the embedding space (q44's banded equi-join,
    * never all-pairs) → connected components (q62's union-find fast path
    * / pointer-jump loop) → keep ONE representative (minimum vec_id) per
    * cluster. Output is the deduplicated corpus: one row per kept
    * representative with the cluster mass it absorbs (singletons keep
    * themselves with mass 1).
    *
    * Scale posture: the pair graph LSH mines is orders of magnitude
    * smaller than the corpus, components cost log-many rounds on it, and
    * the final keep-join is one shuffle on vec_id — no stage ever holds
    * more than (pairs + corpus keys). */
  def q67SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val pairs = embLshPairsRaw(embNorm(s, dir), 0.4).select(col("a"), col("b"))
    val labels = TextQueries.componentLabels(s, pairs)
    Tables.load(s, dir, "embeddings").select(col("vec_id"))
      .join(labels.select(col("id").as("vec_id"), col("label").as("_c")),
        Seq("vec_id"), "left")
      .select(coalesce(col("_c"), col("vec_id")).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("cluster_size"))
      .orderBy("vec_id")
  }

  // one PQ index build per (JVM, path): a deployment builds the index
  // offline and probes it many times — re-timing the build on every probe
  // would repeat q57's write/read double-count mistake
  private val pqBuilt = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Q81 — Johnson-Lindenstrauss projection audit: project the embedding
    * corpus 64→16 dims with the seeded sparse random projection
    * ([[graft.functions.VectorFunctions.RandomProject]] — matrix-free,
    * reproducible across engines/runs) and report the similarity
    * distortion over the exact high-similarity pair set (q33's capped
    * baseline): pair count, mean/max absolute cosine error. This is the
    * audit a pipeline runs BEFORE switching its LSH/ANN stages to the
    * compressed vectors — 4× less shuffle width only matters if the
    * distortion is tolerable.
    *
    * Scale posture: the projection is a stateless map-side kernel; the
    * pair set is the (already capped) q33 baseline; the audit aggregate
    * is one row. ORACLE-CHECKED: the splitmix64 sign matrix is
    * deterministic for fixed (dim, k, seed), so it rides into the DuckDB
    * SQL as a VALUES table built from the SAME
    * [[graft.functions.VectorFunctions.projectionSigns]] definition the
    * kernel uses (q44's hyperplane pattern); the pair filter keys on the
    * 4-decimal-rounded sim, q33's proven cross-engine boundary
    * convention. FunctionsSpec additionally pins determinism + the JL
    * property on clustered synthetic data. */
  def q81JlAudit(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import graft.functions.VectorFunctions.randomProject
    val e = emb(s, dir)
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), normalized(col("emb")).as("nemb"))
      .withColumn("proj", normalized(randomProject(col("nemb"), k)))
      .transform(Materialize.pin)
    val a = e.select(col("vec_id").as("a"), col("nemb").as("ea"),
      col("proj").as("pa"))
    val b = e.select(col("vec_id").as("b"), col("nemb").as("eb"),
      col("proj").as("pb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .select(dot(col("ea"), col("eb")).as("sim"),
        dot(col("pa"), col("pb")).as("psim"))
      .filter(round(col("sim"), 4) >= 0.4)
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(abs(col("sim") - col("psim"))), 3).as("mean_abs_err"),
        round(max(abs(col("sim") - col("psim"))), 3).as("max_abs_err"))
  }

  /** Q84 — recall@5 of the IVF-PQ probe (q79) vs the exact scan (q23) —
    * q58's evaluation harness applied to the compressed layout, so the
    * quality cost of 32× smaller storage is a measured number, not a
    * claim. The PQ probe includes the stored query vector (its natural
    * top hit); it is excluded here so both sides rank the same
    * candidate universe. Rows-only driver check (PQ training is not
    * SQL-replicable); IvfIndexSpec pins the index-level recall floor. */
  def q84PqRecall(s: SparkSession, dir: String): DataFrame = {
    val pq = q79AnnPq(s, dir, queryId = 1, nProbe = 4, k = 6)
      .filter(col("vec_id") =!= 1).limit(5).select(col("vec_id"))
    val exact = q23CosineKnn(s, dir).select(col("vec_id"))
    pq.join(exact, "vec_id")
      .agg((count(lit(1)).cast("double") / 5).as("recall_at_5"))
  }

  /** Q79 — ANN probe over a persisted IVF-PQ index
    * ([[graft.similarity.IvfIndex.buildPq]]): residual product
    * quantization (m=16 subspace bytes per vector, 32× smaller than
    * float64 at dim 64) scored in place by asymmetric distance — per
    * query the driver precomputes the m·ksub LUT and per-cell centroid
    * dots, and each candidate row costs m table lookups inside
    * whole-stage codegen. Same partition-pruned probe shape as q34's
    * float path: the scan reads nProbe of nCells cell directories.
    *
    * Deterministic end to end (first-k coarse codebook, fixed-sample
    * Lloyd's PQ training, ties → lowest code/vec_id) but the PQ training
    * loop is not SQL-replicable → rows-only driver check; IvfIndexSpec
    * carries the recall/storage/append contracts. */
  def q79AnnPq(s: SparkSession, dir: String, queryId: Long = 1,
      nProbe: Int = 4, k: Int = 5): DataFrame = {
    val path = "/root/repo/target/tmp/pq_index_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    pqBuilt.computeIfAbsent(path, _ => {
      IvfIndex.buildPq(Tables.load(s, dir, "embeddings"), path, nCells = 16)
      true
    })
    val query = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    IvfIndex.search(s, path, query, nProbe, k)
  }

  /** Fixture-pinned PQ codebook — NOT trained: every entry derives from
    * splitmix64, uniform in [-0.25, 0.25) (the residual range of
    * normalized 64-dim vectors), so the DuckDB oracle carries the
    * IDENTICAL values as a VALUES table. q86/q87 run the REAL
    * PqEncode/PqAdcDot kernels against it, which makes the encode+ADC
    * arithmetic oracle-PROVEN; q79/q84 keep the trained codebook (the
    * Lloyd's loop itself is the only part an oracle cannot replay).
    * Flat [m][ksub][dsub] layout, same as trainPqCodebooks. */
  def pinnedPqCodebook(m: Int = 8, ksub: Int = 4, dsub: Int = 8): Array[Double] =
    Array.tabulate(m * ksub * dsub) { idx =>
      (graft.functions.VectorFunctions.mix01(0x9c0deb00cL ^ idx) - 0.5) * 0.5
    }

  /** Fixture-pinned logistic weights — NOT trained: splitmix64-uniform
    * in [-0.5, 0.5), the [[pinnedPqCodebook]] pattern for model-based
    * SCORING, so the DuckDB oracle carries the identical weights as a
    * VALUES table and replays the whole score arithmetic. Training
    * itself (spark.ml multinomial LR on the labeled embeddings) is
    * ClassifierSpec's job — the Lloyd's-loop split q79/q86 use. */
  def pinnedLogisticWeights(dims: Int = 64): (Array[Double], Double) = {
    val w = Array.tabulate(dims)(i =>
      graft.functions.VectorFunctions.mix01(0x10c157a11L ^ i.toLong) - 0.5)
    val b = graft.functions.VectorFunctions.mix01(0x10c157a11L ^ 0xb1a5L) - 0.5
    (w, b)
  }

  /** Q94 — model-based quality scoring, the classifier-filter stage of
    * a training-data pipeline (score every document's embedding with a
    * logistic model, keep above threshold): sigmoid(w·x̂ + b) over the
    * L2-normalized embeddings with the PINNED weights, 4-decimal
    * rounded (absorbs exp/Σ ulp skew — the q23 stability pattern), and
    * the keep flag derived from the ROUNDED score so both engines
    * compare the same decimal. One codegen scan ([[dot]] against a
    * literal weight array), no shuffle before the vec_id sort — at
    * 100 TB the scoring rides the corpus scan like q80's tokenizer. */
  def q94ClassifierScore(s: SparkSession, dir: String): DataFrame = {
    val (w, b) = pinnedLogisticWeights()
    val e = embNorm(s, dir, cached = false)
    val z = dot(col("nemb"), typedLit(w.toSeq)) + lit(b)
    e.select(col("vec_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score"))
      .withColumn("keep", (col("score") >= lit(0.5)).cast("int"))
      .orderBy("vec_id")
  }

  /** Q188 — CALIBRATION BINS for the keep-classifier (the reliability
    * diagram every model-based quality filter ships with: "when the
    * model says 0.7, how often is it right?"): q94's pinned-logistic
    * scores bucket into 10 equal-width bins and each bin reports its
    * size, mean score, and empirical positive fraction (positive =
    * label ≤ 4, the deterministic half-split of the 0-9 label space) —
    * divergence between the last two columns IS the mis-calibration a
    * pipeline thresholds around.
    *
    * Determinism discipline: the 4-decimal score becomes an exact
    * INTEGER (round(score·10⁴)), so the bin cut (si div 1000 — a
    * double floor(score·10) could flip at representation boundaries)
    * and the bin means (integer SUM, order-free, divided once) are
    * engine-identical. Scale: one groupBy(bin) with map-side partials
    * over the scoring scan — nothing new materializes. */
  def q188CalibrationBins(s: SparkSession, dir: String): DataFrame = {
    val lab = emb(s, dir).select(col("vec_id"), col("label"))
    q94ClassifierScore(s, dir)
      .join(lab, "vec_id")
      .withColumn("si", round(col("score") * 10000).cast("long"))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division
      .withColumn("bin", least(expr("si div 1000"), lit(9L)).cast("long"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("si")).cast("double") / count(lit(1)) / 10000.0, 4)
          .as("mean_score"),
        round(sum(when(col("label") <= 4, 1).otherwise(0))
          .cast("double") / count(lit(1)), 4).as("frac_pos"))
      .orderBy("bin")
  }

  /** Q86 — oracle-checked twin of q79's IVF-PQ probe: same coarse
    * assignment as q34 (first-16 codebook, map-side codegen argmax), the
    * residual encoded by [[graft.functions.VectorFunctions.PqEncode]]
    * and scored by [[graft.functions.VectorFunctions.PqAdcDot]] — the
    * exact kernels q79's persisted index uses — but against the
    * [[pinnedPqCodebook]], so DuckDB replays encode and asymmetric
    * distance end to end (codebook as a 256-row VALUES table). Same
    * partition-prunable probe shape: only the nProbe best cells are
    * scored. m=8/ksub=4 keeps the VALUES table small; the kernel paths
    * are shape-independent. */
  def q86PqAdc(s: SparkSession, dir: String, queryId: Long = 1,
      nCells: Int = 16, nProbe: Int = 4, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions
    val m = 8; val ksub = 4; val dsub = 8
    val cb = pinnedPqCodebook(m, ksub, dsub)
    val e = embNorm(s, dir, cached = false)
    val book = e.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("nemb")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq)
      .sortBy(_._1).toSeq
    val qn = e.filter(col("vec_id") === queryId)
      .select(col("nemb")).head()
      .getAs[scala.collection.Seq[Double]](0).toSeq
    def dotL(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map(_ * _).sum
    val cellDot = book.map { case (id, c) => id -> dotL(c, qn) }.toMap
    val probes = cellDot.toSeq
      .sortBy { case (id, sim) => (-sim, id) }
      .take(nProbe).map(_._1)
    val lut = Array.tabulate(m * ksub) { i =>
      val j = i / ksub; val c = i % ksub
      var acc = 0.0
      var d = 0
      while (d < dsub) {
        acc += qn(j * dsub + d) * cb((j * ksub + c) * dsub + d); d += 1
      }
      acc
    }
    val cents = book.map(_._2)
    e.withColumn("_ord",
        graft.functions.VectorFunctions.nearestCell(col("nemb"), cents))
      .withColumn("cell", element_at(typedlit(book.map(_._1)), col("_ord") + 1))
      .withColumn("_cent", element_at(typedlit(cents), col("_ord") + 1))
      .filter(col("cell").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(VectorFunctions.pqAdcDot(
          VectorFunctions.pqEncode(col("nemb"), col("_cent"), cb, m, ksub),
          element_at(typedlit(cellDot), col("cell")), lut, ksub), 4).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k)
  }

  /** Q87 — oracle-checked twin of q84: recall@5 of the pinned-codebook
    * ADC probe (q86) against the exact scan (q23). Where q84's number
    * rests on IvfIndexSpec, this one is DuckDB-replayed end to end —
    * the compression-quality measurement itself is oracle-proven. */
  def q87PqAdcRecall(s: SparkSession, dir: String): DataFrame = {
    val pq = q86PqAdc(s, dir, k = 5).select(col("vec_id"))
    val exact = q23CosineKnn(s, dir).select(col("vec_id"))
    pq.join(exact, "vec_id")
      .agg((count(lit(1)).cast("double") / 5).as("recall_at_5"))
  }

  /** Q150 — retrieval-quality EVALUATION over the labeled corpus: per
    * held-out query (vec_id < 16), MRR and binary nDCG@k of the
    * brute-force cosine top-k against the rest, relevance = same
    * label. The metrics a pipeline tracks when it swaps retrievers
    * (IVF/PQ vs exact, q127/q79's trade-off made measurable beyond
    * recall). Plan shape: the q126 kNN join (broadcast query set, one
    * codegen scan, mergeable bounded top-k — map-side partial, no
    * global sort), then per-query metric folds over k rows each and
    * one broadcast join against the k-row IDCG table; ideal DCG
    * normalizes by min(k, corpus rows sharing the query's label).
    * Rounded-4 sims with vec_id tie-breaks keep ranks (and so both
    * metrics) cross-engine deterministic. */
  def q150RetrievalEval(s: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
      .select(col("vec_id"), col("label"), normalized(col("emb")).as("nemb"))
    val queries = broadcast(e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("nemb").as("q"),
        col("label").as("q_label")))
    val corpus = e.filter(col("vec_id") >= 16)
    val labels = corpus.select(col("vec_id"), col("label").as("n_label"))
    val ranked = corpus.crossJoin(queries)
      .select(col("q_id"), col("q_label"), col("vec_id"),
        round(dot(col("nemb"), col("q")), 4).as("sim"))
      .groupBy("q_id", "q_label")
      .agg(graft.functions.TopKFunctions.topK(
        col("sim"), col("vec_id"), k).as("nn"))
      .select(col("q_id"), col("q_label"), posexplode(col("nn")))
      .select(col("q_id"), col("q_label"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("vec_id"))
      .join(labels, "vec_id")
    val perQ = ranked
      .withColumn("rel", (col("n_label") === col("q_label")).cast("int"))
      .groupBy("q_id", "q_label")
      .agg(
        round(coalesce(max(when(col("rel") === 1,
          lit(1.0) / col("rank"))), lit(0.0)), 4).as("mrr"),
        sum(when(col("rel") === 1, lit(1.0) / log2(col("rank") + 1))
          .otherwise(0.0)).as("dcg"))
    // R per label (relevant rows IN THE CORPUS) and the k-row ideal-
    // DCG lookup — both broadcast-sized by construction
    val labCounts = corpus.groupBy(col("label"))
      .agg(count(lit(1)).as("r_total"))
    val idcgTable = broadcast((1 to k).map(m =>
      (m.toLong, (1 to m).map(i => 1.0 / (math.log(i + 1.0) /
        math.log(2.0))).sum)).toDF("m", "idcg"))
    perQ.join(labCounts, perQ("q_label") === labCounts("label"))
      .withColumn("m", least(col("r_total"), lit(k.toLong)))
      .join(idcgTable, "m")
      .select(col("q_id"), col("q_label").as("label"), col("mrr"),
        round(col("dcg") / col("idcg"), 4).as("ndcg"))
      .orderBy("q_id")
  }
}
