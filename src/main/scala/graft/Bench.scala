package graft
import org.apache.spark.sql.SparkSession

/** Per-round throughput harness.
  *
  * Methodology (hardened in round 4 after an unexplained 3-10× regression
  * cluster in the LAST-executed queries of round 3 — the signature of
  * position-dependent JVM/GC/heap pressure, not plan changes):
  *  - N runs per query (default 3, `SPARK_GRAFT_BENCH_RUNS`), per-query MIN:
  *    the steady-state number a long-running engine sees, immune to one-off
  *    codegen/file-cache costs and scheduler noise.
  *  - Execution order VARIES per run — alphabetical, reversed, then
  *    seeded-shuffled — so no query is always last: a late-run slowdown
  *    inflates a query in one order but not the others, and min() erases it.
  *  - A GC-seconds column per query (delta of collector time around the
  *    winning run) so memory pressure is visible in the data, not guessed.
  *
  * Output: ONE compact JSON line on stdout (3-decimal seconds, no vs_prev —
  * full-precision lines overflowed the driver's head-truncated tail buffer
  * and recorded parsed:null). The full record — per-run times, GC by query,
  * vs_prev and which baseline produced it — goes to target/bench_last.json.
  */
object Bench {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000.0

  /** Metric-line key compression: "q50_revenue_bucketed" -> "50rb"
    * (numeric id + word initials — unique across the inventory, and the
    * id alone identifies the query). The driver records only the LAST
    * 2000 chars of stdout; at 91 queries the full-name map no longer
    * fits even at 1 decimal (r7), so the stdout line uses short keys
    * while target/bench_last.json keeps full names and full precision.
    * Applied to BOTH sides of the vs_prev join so rounds recorded under
    * either style keep comparing. */
  private def shortKey(name: String): String =
    if (name.matches("q\\d+(_.*)?")) {
      val digits = name.drop(1).takeWhile(_.isDigit)
      val rest = name.drop(1 + digits.length)
      digits + rest.split("_").filter(_.nonEmpty).map(_.head).mkString
    } else name

  /** Per-query seconds from the newest BENCH_r*.json (the recorded round
    * baseline), tolerating both the raw metric line and the driver's wrapper
    * (metric line inside "tail"). Falls back to target/bench_last.json — the
    * previous LOCAL run — when no recorded round parses; the returned label
    * says which source was used so a run-over-run fallback can't silently
    * pose as a round baseline. */
  private def prevQueries(): (String, String, Map[String, Double]) = try {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // (keys style, per-query seconds): the "keys" field names the key
    // encoding the line was printed under ("qid+initials" / "qid" /
    // "qid36"); absent on old lines and on bench_last.json (full names)
    def queriesOf(node: com.fasterxml.jackson.databind.JsonNode) = (
      if (node.hasNonNull("keys")) node.get("keys").asText() else "",
      node.get("queries").fields().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap)
    val dir = new java.io.File("/root/repo")
    val files = Option(dir.listFiles((_, n: String) =>
      n.matches("BENCH_r\\d+\\.json"))).getOrElse(Array.empty)
    if (files.isEmpty) return ("none", "", Map.empty)
    // numeric round ordering — lexicographic would put r100 before r99
    val newest = files.maxBy(_.getName.replaceAll("\\D", "").toInt)
    val txt = new String(
      java.nio.file.Files.readAllBytes(newest.toPath), "UTF-8")
    val root = om.readTree(txt)
    if (root.has("queries")) {
      val (st, qs) = queriesOf(root); (newest.getName, st, qs)
    } else if (root.hasNonNull("parsed") &&
        root.get("parsed").has("queries")) {
      val (st, qs) = queriesOf(root.get("parsed"))
      (newest.getName, st, qs)
    } else {
      val tail = if (root.hasNonNull("tail")) root.get("tail").asText() else txt
      val i = tail.lastIndexOf("{\"metric\"")
      if (i >= 0) {
        val (st, qs) =
          queriesOf(om.readTree(tail.substring(i).takeWhile(_ != '\n')))
        (newest.getName, st, qs)
      } else { // head-truncated tail cut the metric line: local fallback
        val (st, qs) = queriesOf(om.readTree(new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths
            .get("/root/repo/target/bench_last.json")), "UTF-8")))
        ("target/bench_last.json (LOCAL fallback, not a round baseline)",
          st, qs)
      }
    }
  } catch { case _: Throwable => ("none", "", Map.empty) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up outside the timed region: JIT/codegen bootstrap + one read per
    // table so the first measured query isn't charged for session startup;
    // the one-time bucketed-snapshot and z-order layout writes (a real
    // deployment writes those once per snapshot cycle) so q50/q57_scan time
    // the read path, not the write.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    try queries.BucketedQueries.ensureTables(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] bucketed setup failed: ${e.getMessage}")
    }
    val appId = spark.sparkContext.applicationId
    val zPath = s"/root/repo/target/tmp/bench_zorder_$appId"
    val uPath = s"/root/repo/target/tmp/bench_unclustered_$appId"
    try {
      queries.RelationalQueries.q57WriteLayout(spark, sfDir, zPath)
      queries.RelationalQueries.q57WriteUnclustered(spark, sfDir, uPath)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] zorder setup failed: ${e.getMessage}")
    }

    // q57 split: the layout WRITE (maintenance cost, timed to a throwaway
    // path), the clustered SCAN (the repeated win), and the same predicate
    // over an unclustered same-file-count copy (the bar the clustered scan
    // must beat — the fixture's own events.parquet is incidentally sorted
    // by event_id, so it is a one-dimension-clustered layout, not a fair
    // baseline). The combined round-trip stays in SparkEntry.queries for
    // correctness but is not bench-timed — it double-counts the write.
    val entries: Seq[(String, () => Unit)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot(_._1 == "q57_zorder_scan")
        .map { case (n, fn) => n -> (() => { fn(spark, sfDir).count(); () }) } ++
      Seq[(String, () => Unit)](
        "q57_write" -> (() => queries.RelationalQueries.q57WriteLayout(
          spark, sfDir, zPath + "_w")),
        "q57_scan" -> (() =>
          { queries.RelationalQueries.q57Scan(spark, zPath).count(); () }),
        "q57_scan_unclustered" -> (() =>
          { queries.RelationalQueries.q57Scan(spark, uPath).count(); () }))

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val gcStart = gcMillis()
    // name -> list of (seconds, gcSeconds) in run order
    val samples = scala.collection.mutable.Map[String, List[(Double, Double)]]()
    // a failed run must surface as a failure, not as a suspiciously fast
    // time — min() would otherwise report a crash as the round's best
    // improvement
    val errors = scala.collection.mutable.Map[String, Int]()
    for (r <- 0 until runs) {
      val order =
        if (r == 0) entries
        else if (r == 1) entries.reverse
        else new scala.util.Random(1000 + r).shuffle(entries)
      order.foreach { case (name, thunk) =>
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        val ok = try { thunk(); true } catch {
          case e: Throwable =>
            errors(name) = errors.getOrElse(name, 0) + 1
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        val t = (System.nanoTime() - t0) / 1e9
        val gc = (gcMillis() - g0) / 1e3
        if (ok) samples(name) = (t, gc) :: samples.getOrElse(name, Nil)
      }
    }
    val results = entries.flatMap { case (name, _) =>
      samples.get(name).map { s =>
        val runsFor = s.reverse
        val (tMin, gcAtMin) = runsFor.minBy(_._1)
        (name, tMin, gcAtMin, runsFor.map(_._1))
      } // a query with zero successful runs appears only under "errors"
    }
    val gcTotal = (gcMillis() - gcStart) / 1e3
    val total = results.map(_._2).sum
    // the keys style rides along for future rungs; today's lookup
    // resolves every recorded style (full, qid+initials, qid) through
    // sk + unique-digit aliases alone
    val (baselineSrc, _, prev) = prevQueries()

    def jmap(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    // stdout-line values: 2 decimals, trailing zeros stripped — the driver
    // records only the LAST 2000 chars of output, and with 80+ queries a
    // full-precision map overflows that window (r03 recorded parsed:null
    // exactly this way). Full precision lives in target/bench_last.json.
    // Locale.ROOT: a comma-decimal default locale ("%.2f" -> "1,50")
    // would make the line unparseable JSON — the exact parsed:null
    // failure this formatting exists to prevent
    def short(v: Double, decimals: Int): String = {
      val p = math.pow(10, decimals)
      val s = String.format(java.util.Locale.ROOT, s"%.${decimals}f",
        Double.box(math.rint(v * p) / p))
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t + "0" else t
    }
    // a bare number only for a well-formed scale factor; anything else
    // rides as an escaped JSON string
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val sfShort = "sf(\\d+(?:\\.\\d+)?)(?:/|$)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse(jstr(sfDir))
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(shortKey(k)) + ":" + v }
      .mkString("{", ",", "}")
    // adaptive degradation, in order: 2-decimal seconds; 1 decimal; 1
    // decimal with the errors map collapsed to a count; and as the
    // guaranteed-bounded terminal form, the totals WITHOUT the per-query
    // map (queries_in_file points at the full record) — the line must
    // NEVER record parsed:null again, least of all on failure-heavy runs.
    // Keys are shortKey-compressed ("50rb"); full names in the file.
    // digits-only keys ("152") save ~3 chars/query over "152ia" when
    // the map gets tight — except where two keys share the digits
    // (q57's write/scan/unclustered triplet), which keep the initials
    val digitCounts = results.map(r => shortKey(r._1).takeWhile(_.isDigit))
      .groupBy(identity).view.mapValues(_.size).toMap
    def tinyKey(name: String): String = {
      val sk = shortKey(name)
      val digits = sk.takeWhile(_.isDigit)
      if (digits.nonEmpty && digitCounts.getOrElse(digits, 0) == 1)
        digits
      else sk
    }
    // NOTE on headroom: r13 measured 1,770/1,950 chars at the "qid"
    // rung with 184 keys (~9 chars/entry) — ~20 more queries fit
    // before the next rung engages. A base-36 id rung was tried and
    // REMOVED: base-36 strings are ambiguous against both decimal ids
    // ("13" = b36(39)) and initialed keys ("4n"), so cross-round
    // vs_prev joins could silently match the WRONG query. The SAFE
    // tight rung below omitZeros instead: entries whose 1-decimal
    // value rounds to 0.0 carry no information (a ratio against ~0 s
    // is noise, and vs_prev already filters prev <= 0), so they drop
    // from the LINE (never from bench_last.json) with a zeros_n count
    // — ~11 entries x ~9 chars at r13, and the omitted keys simply
    // miss next round's vs_prev join rather than mis-match it. With
    // it, the projected line at +25 queries stays ~1.85k <= 1,950;
    // the terminal totals-only form remains the honest floor.
    def lineAt(decimals: Int, fullErrors: Boolean,
        digitsOnly: Boolean = false, omitZeros: Boolean = false): String = {
      val errField =
        if (errors.isEmpty) ""
        else if (fullErrors) s""","errors":$errJson"""
        else s""","errors_n":${errors.values.sum}"""
      val key = if (digitsOnly) tinyKey(_: String) else shortKey(_: String)
      // partition on the RENDERED value (short uses rint/half-even) —
      // a numeric threshold would disagree with it exactly at the
      // .5 boundary and keep a zero-information "0.0" entry
      val (zeroQ, liveQ) =
        if (omitZeros) results.partition(r => short(r._2, decimals) == "0.0")
        else (Nil, results)
      val qs = liveQ
        .map(r => s"\"" + key(r._1) + "\":" + short(r._2, decimals))
        .mkString("{", ",", "}")
      val zeroField =
        if (zeroQ.isEmpty) "" else s""","zeros_n":${zeroQ.size}"""
      val ks = if (digitsOnly) "qid" else "qid+initials"
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"keys":"$ks","queries_in_file":"target/bench_last.json","sf":$sfShort$zeroField$errField}"""
    }
    val terminal =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"queries_in_file":"target/bench_last.json","n_queries":${results.size},"sf":$sfShort${if (errors.isEmpty) "" else s""","errors_n":${errors.values.sum}"""}}"""
    // top-N-by-time rung (r22): at 239+ keys every full-map rung above
    // overflows the 1950-char budget, and r17–r21 silently shipped the
    // terminal "queries":{} form — killing the driver's per-query and
    // scaling comparisons. Keeping only the N most expensive keys is the
    // honest degradation: all regression signal lives in the expensive
    // keys (the omitted tail rounds to ≤0.1 s each, pure noise as a
    // ratio), and "omitted_n"/"omitted_sec" keep the total
    // reconstructable from the line alone. Digits-only keys, 1 decimal.
    def lineTopN(n: Int): String = {
      val sorted = results.sortBy(r => (-r._2, r._1))
      val keep = sorted.take(n)
      val omit = sorted.drop(n)
      val qs = keep.map(r => "\"" + tinyKey(r._1) + "\":" + short(r._2, 1))
        .mkString("{", ",", "}")
      val omitField =
        if (omit.isEmpty) ""
        else s""","omitted_n":${omit.size},"omitted_sec":${short(omit.map(_._2).sum, 1)}"""
      val errField =
        if (errors.isEmpty) "" else s""","errors_n":${errors.values.sum}"""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"keys":"qid","queries_in_file":"target/bench_last.json","n_queries":${results.size},"sf":$sfShort$omitField$errField}"""
    }
    val line = Seq(lineAt(2, fullErrors = true), lineAt(1, fullErrors = true),
        lineAt(1, fullErrors = false),
        lineAt(1, fullErrors = false, digitsOnly = true),
        lineAt(1, fullErrors = false, digitsOnly = true, omitZeros = true),
        lineTopN(170), lineTopN(150), lineTopN(130), lineTopN(110),
        lineTopN(90), lineTopN(70), lineTopN(50),
        terminal)
      .find(_.length <= 1950).getOrElse(terminal)

    // prior rounds may be keyed full-name, qid+initials, digits-only,
    // or base-36 (the tight-line rungs): index prev under its own
    // spellings plus a digits alias — ONLY when the digit prefix is
    // unique among prev keys (the q57 triplet all aliasing to "57"
    // last-wins would hand a same-digit query a WRONG vs-prev ratio)
    val prevDigitCounts = prev.keys.toSeq
      .map(k => shortKey(k).takeWhile(_.isDigit)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size).toMap
    val prevN = prev.flatMap { case (k, v) =>
      val sk = shortKey(k)
      val d = sk.takeWhile(_.isDigit)
      Seq(sk -> v) ++ (if (d.nonEmpty && d != sk &&
        prevDigitCounts.getOrElse(d, 0) == 1) Seq(d -> v) else Nil)
    }
    val vsPrev = jmap(results.flatMap { case (name, t, _, _) =>
      val sk = shortKey(name)
      prevN.get(sk).orElse(prevN.get(sk.takeWhile(_.isDigit)))
        .filter(_ > 0).map(p => name -> t / p)
    })
    val gcByQ = jmap(results.map(r => r._1 -> r._3))
    val allRuns = results.map { case (name, _, _, ts) =>
      s"\"" + name + "\":" + ts.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fullErrField =
      if (errors.isEmpty) "" else s""","errors":$errJson"""
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(results.map(r => r._1 -> r._2))},"runs":$runs,"agg":"min","order":"varied","gc_sec":${r3(gcTotal)},"sf":${jstr(sfDir)}$fullErrField,"vs_prev":$vsPrev,"baseline_source":"$baselineSrc","gc_by_query":$gcByQ,"all_runs":$allRuns}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/target/bench_last.json"), full)
    catch { case _: Throwable => () }
    // Stop BEFORE printing so Spark's shutdown logs can't land after the
    // JSON line — but never let a failing stop() eat the line itself.
    spark.sparkContext.setLogLevel("ERROR")
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }
}
