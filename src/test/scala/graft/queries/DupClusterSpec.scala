package graft.queries

import graft.SparkSpec

/** q62 invariants beyond the DuckDB replay: canonical really is the
  * component minimum, pair-connected docs always share a cluster, and
  * cluster sizes are consistent. */
class DupClusterSpec extends SparkSpec {

  test("q62 clusters: canonical is the component minimum, pairs agree") {
    val dir = sf("sf0.001")
    val rows = TextQueries.q62DupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    // canonical ≤ member, and the canonical doc is its own canonical
    rows.foreach { case (id, (canon, _)) =>
      assert(canon <= id, s"canonical above member: $id -> $canon")
      assert(rows(canon)._1 === canon, s"canonical $canon not a fixpoint")
    }
    // every near-dup pair landed in one cluster
    TextQueries.q48SimhashPairs(spark, dir).select("a", "b").collect()
      .foreach { r =>
        assert(rows(r.getLong(0))._1 === rows(r.getLong(1))._1,
          s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
      }
    // cluster_size equals the actual member count of its canonical
    val counts = rows.values.groupBy(_._1).view.mapValues(_.size).toMap
    rows.foreach { case (id, (canon, size)) =>
      assert(size === counts(canon), s"size mismatch at $id")
    }
  }

  test("union-find fast path and distributed propagation agree") {
    val dir = sf("sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // limit 0 forces the distributed label-propagation loop
    val distributed = canon(TextQueries.dupClusters(spark, dir, 0L))
    assert(TextQueries.q62LastRounds > 0)
    val unionFind = canon(TextQueries.q62DupClusters(spark, dir))
    assert(TextQueries.q62LastRounds === 0)
    assert(unionFind === distributed)
  }

  test("q67 semantic dedup: mass conserved, reps minimal, pairs merged") {
    val dir = sf("sf0.001")
    val kept = SimilarityQueries.q67SemanticDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = graft.Tables.load(spark, dir, "embeddings").count()
    // every vector lands in exactly one kept representative's cluster
    assert(kept.values.map(_.toLong).sum === total)
    // a representative is never an absorbed member of another cluster
    val pairs = SimilarityQueries.q44EmbLshPairs(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      // near-dup pair ⇒ same cluster ⇒ at most one of the two is kept
      assert(!(kept.contains(a) && kept.contains(b)),
        s"near-dup pair ($a, $b) both kept")
    }
    // golden replay: a local union-find over the same pairs must produce
    // exactly the same (representative -> cluster_size) map
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      x
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val ids = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val minOf = scala.collection.mutable.HashMap.empty[Long, Long]
    parent.keys.foreach { v =>
      val r = find(v); if (v < minOf.getOrElse(r, Long.MaxValue)) minOf(r) = v
    }
    val expected = ids.groupBy(v =>
        if (parent.contains(v)) minOf(find(v)) else v)
      .view.mapValues(_.length.toLong).toMap
    assert(kept === expected)
  }

  test("q71 sketch twin tracks the exact length profile within 5%") {
    val dir = sf("sf0.001")
    def byLang(rows: Array[org.apache.spark.sql.Row],
        get: (org.apache.spark.sql.Row, Int) => Double) =
      rows.map(r => r.getString(0) ->
        Seq(get(r, 2), get(r, 3), get(r, 4))).toMap
    val exact = byLang(TextQueries.q71LenProfile(spark, dir).collect(),
      (r, i) => r.getString(i).toDouble)
    val approx = byLang(TextQueries.q71Approx(spark, dir).collect(),
      (r, i) => r.getDouble(i))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (lang, ps) =>
      ps.zip(approx(lang)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
          s"$lang: sketch $a vs exact $e")
      }
    }
  }

  test("q196 agreement retention: agreed pairs are a NON-VACUOUS " +
    "intersection of the two kernels' pair sets, and every agreed " +
    "pair's docs share a retention cluster") {
    val dir = sf("sf0.001")
    val mh = TextQueries.q51MinhashPairsMd5(spark, dir, 0.5)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextQueries.q48SimhashPairs(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agreed = TextQueries.agreedPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(agreed === (mh intersect sh))
    assert(agreed.nonEmpty, "fixture must produce agreed pairs")
    // NON-vacuity: each kernel flags pairs the other rejects — the
    // agreement genuinely prunes (not a subset relation in disguise)
    assert((sh -- mh).nonEmpty,
      "simhash-only pairs must exist (agreement prunes them)")
    // retention clusters cover exactly the agreed-pair docs; members
    // of one agreed pair never land in different clusters
    val kept = TextQueries.q196AgreementRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val clusterDocs = agreed.flatMap(p => Seq(p._1, p._2))
    assert(kept.map(_._3 + 1).sum === clusterDocs.size,
      "every clustered doc is kept or dropped exactly once")
    kept.foreach { case (canon, keptDoc, _) =>
      assert(clusterDocs.contains(keptDoc))
      assert(canon <= keptDoc ||
        clusterDocs.contains(canon))
    }
  }
}
