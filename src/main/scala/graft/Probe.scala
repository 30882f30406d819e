package graft

import org.apache.spark.sql.functions._

/** Ad-hoc measurement harness for the optimization rounds: times the
  * labelled sub-stages of a hot query so a change targets the stage
  * that actually costs (guide §1 "measure first"). Not part of any
  * query path; never invoked by the driver.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local("graft-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val which = args.headOption.getOrElse("q277")
    def time(tag: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    which match {
      case "q277" =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        // fixture: reuse the query's own cached dir by running it once
        noop(SparkEntry.queries("q277_binary_ingest")(spark, sfDir))
        // the NEWEST pngdir is the one this JVM's query just created
        val d = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
          .filter(p => p.getFileName.toString.startsWith("graft-pngdir-"))
          .sorted(java.util.Comparator.comparingLong((p: java.nio.file.Path) =>
            java.nio.file.Files.getLastModifiedTime(p).toMillis).reversed())
          .findFirst().get().toString
        println(s"PROBE dir $d")
        def scan = spark.read.format("binaryFile").load(s"$d/*.png")
        def scan2 = spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.png").load(d)
        time("count glob")(scan.selectExpr("count(*)").collect())
        time("count dir+filter")(scan2.selectExpr("count(*)").collect())
        time("count dir+filter 2")(scan2.selectExpr("count(*)").collect())
        time("count only")(scan.selectExpr("count(*)").collect())
        time("bytes noop")(noop(scan.select(col("content"))))
        time("bytes noop 2")(noop(scan.select(col("content"))))
        time("decode noop")(noop(graft.multimodal.Multimodal.decode(
          scan.select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("bigint").as("media_id"),
            lit("image").as("media_type"), col("content")))))
        val decoded = graft.multimodal.Multimodal.decode(
          scan.select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("bigint").as("media_id"),
            lit("image").as("media_type"), col("content")))
          .filter(col("ok"))
          .select(col("media_id"), col("width").cast("bigint").as("width"),
            col("height").cast("bigint").as("height"))
        time("no orderBy")(noop(decoded))
        time("with orderBy")(noop(decoded.orderBy("media_id")))
        time("with orderBy 2")(noop(decoded.orderBy("media_id")))
        time("full query")(noop(
          SparkEntry.queries("q277_binary_ingest")(spark, sfDir)))
      case "q125" =>
        // decompose PageRank: edge build vs ew pin vs per-round cost
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(col("c").as("src"), col("su").as("dst"))
            .unionAll(pairs.select(col("su").as("src"), col("c").as("dst")))
        }
        // warm
        noop(edges)
        time("edge build noop")(noop(edges))
        for (iters <- Seq(1, 2, 5)) {
          time(s"pagerank $iters iters")(
            noop(graft.operators.PageRank.run(edges, iters)))
          spark.catalog.clearCache()
        }
        time("kcore 4 rounds")(noop(graft.operators.KCore.peel(
          edges.select(col("src"), col("dst")), k = 3, rounds = 4)))
      case "sym" =>
        // A/B: union-form vs explode-form symmetrize feeding Lpa.run
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def pairs = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
        }
        def unionForm = pairs.select(col("c").as("src"), col("su").as("dst"))
          .unionAll(pairs.select(col("su").as("src"), col("c").as("dst")))
        def explodeForm = pairs.select(explode(array(
            struct(col("c").as("src"), col("su").as("dst")),
            struct(col("su").as("src"), col("c").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        noop(unionForm); noop(explodeForm) // warm
        for (rep <- 1 to 3) {
          time(s"edges union $rep")(noop(unionForm))
          time(s"edges explode $rep")(noop(explodeForm))
        }
        for (rep <- 1 to 3) {
          time(s"lpa union $rep")(
            noop(graft.operators.Lpa.run(unionForm, 5)))
          spark.catalog.clearCache()
          time(s"lpa explode $rep")(
            noop(graft.operators.Lpa.run(explodeForm, 5)))
          spark.catalog.clearCache()
        }
      case "pr" =>
        // A/B: aggregate+join outdeg attachment (old) vs count-over-
        // window on the pinned shuffle (new), same 5-iteration loop
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(explode(array(
              struct(col("c").as("src"), col("su").as("dst")),
              struct(col("su").as("src"), col("c").as("dst")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
        }
        def runOld(iterations: Int): org.apache.spark.sql.DataFrame = {
          val e = edges.select(col("src").cast("long").as("e_src"),
            col("dst").cast("long").as("e_dst"))
          val outdeg = e.groupBy(col("e_src")).agg(count(lit(1)).as("d"))
            .select(col("e_src").as("o_src"), col("d"))
          val ew = e.join(outdeg, col("e_src") === col("o_src"))
            .select(col("e_src"), col("e_dst"), col("d"))
            .repartition(col("e_src"))
            .persist()
          var ranks = outdeg.select(col("o_src").as("node"),
            lit(graft.operators.PageRank.Scale).as("r"))
          var lastCut: org.apache.spark.sql.DataFrame = null
          for (_ <- 1 to iterations) {
            val contribs = ranks
              .join(ew, col("node") === col("e_src"))
              .select(col("e_dst").as("node2"), expr("r div d").as("c"))
            val plan = contribs.groupBy(col("node2"))
              .agg(sum(col("c")).as("s"))
              .select(col("node2").as("node"),
                (lit(15L * graft.operators.PageRank.Scale / 100) +
                  expr("(85 * s) div 100")).as("r"))
            val next = graft.engine.Checkpoints.cut(plan)
            if (lastCut != null) graft.engine.Checkpoints.release(lastCut)
            lastCut = next
            ranks = next
          }
          ew.unpersist()
          ranks
        }
        noop(graft.operators.PageRank.run(edges, 5)); spark.catalog.clearCache()
        noop(runOld(5)); spark.catalog.clearCache() // warm both
        for (rep <- 1 to 3) {
          time(s"pr old $rep")(noop(runOld(5)))
          spark.catalog.clearCache()
          time(s"pr new $rep")(noop(graft.operators.PageRank.run(edges, 5)))
          spark.catalog.clearCache()
        }
      case "lpa" =>
        // A/B: committed Lpa.run (observe early-exit) vs the pre-r15
        // fixed-round loop, same edges, alternating in one JVM
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(explode(array(
              struct(col("c").as("src"), col("su").as("dst")),
              struct(col("su").as("src"), col("c").as("dst")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
        }
        def lpaOld(iterations: Int): org.apache.spark.sql.DataFrame = {
          val e = edges.select(col("src").cast("long").as("e_src"),
            col("dst").cast("long").as("e_dst"))
            .repartition(col("e_src")).persist()
          var labels = e.select(col("e_src").as("node")).distinct()
            .select(col("node"), col("node").as("lbl"))
          var lastCut: org.apache.spark.sql.DataFrame = null
          for (_ <- 1 to iterations) {
            val votes = labels
              .join(e, col("node") === col("e_src"))
              .groupBy(col("e_dst"), col("lbl"))
              .agg(count(lit(1)).as("cnt"))
            val plan = votes
              .groupBy(col("e_dst"))
              .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
                .as("w"))
              .select(col("e_dst").as("node"), col("w.l").as("lbl"))
            val next = graft.engine.Checkpoints.cut(plan)
            if (lastCut != null) graft.engine.Checkpoints.release(lastCut)
            lastCut = next
            labels = next
          }
          e.unpersist()
          labels.select(col("node"), col("lbl").as("community"))
        }
        noop(lpaOld(5)); spark.catalog.clearCache()
        noop(graft.operators.Lpa.run(edges, 5)); spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"lpa old $rep")(noop(lpaOld(5)))
          spark.catalog.clearCache()
          time(s"lpa new $rep")(noop(graft.operators.Lpa.run(edges, 5)))
          spark.catalog.clearCache()
        }
      case "bfs" =>
        // A/B: Relax.rounds (join-refresh + observe exit) vs the old
        // inlined union+groupBy, q140's shape, alternating in one JVM
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def build() = {
          val li = t0("lineitem").select(col("l_orderkey"), col("l_partkey"))
          val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
          val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
          val e0 = a.join(b, Seq("k")).filter(col("u") =!= col("v"))
            .select(col("u"), col("v")).distinct()
            .repartition(col("u")).persist()
          val dist0 = e0.select(col("u")).distinct()
            .select(col("u").as("node"),
              when(col("u") === 1L, 0L).otherwise(lit(Long.MaxValue))
                .as("dd"))
          (e0, dist0)
        }
        def bfsOld(): Unit = {
          val (e0, d0) = build()
          var dist = d0
          for (_ <- 1 to 4) {
            val relaxed = dist.join(e0, col("node") === col("u"))
              .filter(col("dd") =!= Long.MaxValue)
              .select(col("v").as("node"), (col("dd") + 1L).as("dd"))
            val next = graft.engine.Checkpoints.cut(dist.unionByName(relaxed)
              .groupBy(col("node")).agg(min(col("dd")).as("dd")))
            graft.engine.Checkpoints.release(dist)
            dist = next
          }
          e0.unpersist()
          noop(dist.filter(col("dd") =!= Long.MaxValue)
            .groupBy(col("dd")).agg(count(lit(1)).as("n_nodes"))
            .orderBy("dd"))
        }
        def bfsNew(): Unit = {
          val (e0, d0) = build()
          val dist = graft.operators.Relax.rounds(e0, d0, 4, weighted = false)
          e0.unpersist()
          noop(dist.filter(col("dd") =!= Long.MaxValue)
            .groupBy(col("dd")).agg(count(lit(1)).as("n_nodes"))
            .orderBy("dd"))
        }
        bfsOld(); spark.catalog.clearCache()
        bfsNew(); spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"bfs old $rep")(bfsOld())
          spark.catalog.clearCache()
          time(s"bfs new $rep")(bfsNew())
          spark.catalog.clearCache()
        }
      case "cc" =>
        // A/B: committed Components (r15 shape) vs dst-pinned edge list
        // vs fused single-aggregate round, alternating in one JVM.
        // Edge set = q341's winnow match pairs (the heaviest CC input).
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def pairEdges = {
          val li = t0("lineitem").select(col("l_orderkey"), col("l_partkey"))
          val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
          val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("b"))
          a.join(b, Seq("k")).filter(col("a") < col("b"))
            .select(col("a"), col("b")).distinct()
        }
        import org.apache.spark.sql.DataFrame
        // committed r15 shape, inlined (so the A/B survives the operator
        // being rewritten underneath it)
        def ccOld(edges: DataFrame, maxIters: Int = 20): DataFrame = {
          val sym = edges
            .select(col("a").as("src"), col("b").as("dst"))
            .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
            .distinct()
            .transform(graft.engine.Checkpoints.cut)
          var labels = sym.select(col("src").as("id")).distinct()
            .select(col("id"), col("id").as("comp"))
            .transform(graft.engine.Checkpoints.cut)
          var converged = false
          var i = 0
          while (!converged && i < maxIters) {
            val neighborMin = sym
              .join(labels.select(col("id").as("dst"), col("comp")), "dst")
              .groupBy(col("src"))
              .agg(min(col("comp")).as("ncomp"))
              .select(col("src").as("id"), col("ncomp"))
            val propagated = labels.join(neighborMin, Seq("id"), "left")
              .select(col("id"),
                least(col("comp"), coalesce(col("ncomp"), col("comp")))
                  .as("comp"),
                col("comp").as("_old"))
            val doubled =
              if (i == 0) propagated
              else propagated
                .join(labels.select(col("id").as("_pid"),
                  col("comp").as("_pcomp")),
                  col("comp") === col("_pid"), "left")
                .select(col("id"),
                  least(col("comp"), coalesce(col("_pcomp"), col("comp")))
                    .as("comp"),
                  col("_old"))
            val obs = new org.apache.spark.sql.Observation(s"ccp_old_$i")
            val next = doubled
              .observe(obs, sum(when(col("comp") =!= col("_old"), 1L)
                .otherwise(0L)).as("changed"))
              .select(col("id"), col("comp"))
              .transform(graft.engine.Checkpoints.cut)
            graft.engine.Checkpoints.release(labels)
            labels = next
            converged = obs.get("changed").asInstanceOf[Long] == 0L
            i += 1
          }
          println(s"PROBE ccOld rounds=$i")
          labels
        }
        // variant A: same rounds, edge list pinned on dst
        def ccPinned(edges: DataFrame, maxIters: Int = 20): DataFrame = {
          val sym = edges
            .select(col("a").as("src"), col("b").as("dst"))
            .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
            .distinct()
            .repartition(col("dst"))
            .transform(graft.engine.Checkpoints.cut)
          var labels = sym.select(col("src").as("id")).distinct()
            .select(col("id"), col("id").as("comp"))
            .transform(graft.engine.Checkpoints.cut)
          var converged = false
          var i = 0
          while (!converged && i < maxIters) {
            val neighborMin = sym
              .join(labels.select(col("id").as("dst"), col("comp")), "dst")
              .groupBy(col("src"))
              .agg(min(col("comp")).as("ncomp"))
              .select(col("src").as("id"), col("ncomp"))
            val propagated = labels.join(neighborMin, Seq("id"), "left")
              .select(col("id"),
                least(col("comp"), coalesce(col("ncomp"), col("comp")))
                  .as("comp"),
                col("comp").as("_old"))
            val doubled =
              if (i == 0) propagated
              else propagated
                .join(labels.select(col("id").as("_pid"),
                  col("comp").as("_pcomp")),
                  col("comp") === col("_pid"), "left")
                .select(col("id"),
                  least(col("comp"), coalesce(col("_pcomp"), col("comp")))
                    .as("comp"),
                  col("_old"))
            val obs = new org.apache.spark.sql.Observation(s"ccp_pin_$i")
            val next = doubled
              .observe(obs, sum(when(col("comp") =!= col("_old"), 1L)
                .otherwise(0L)).as("changed"))
              .select(col("id"), col("comp"))
              .transform(graft.engine.Checkpoints.cut)
            graft.engine.Checkpoints.release(labels)
            labels = next
            converged = obs.get("changed").asInstanceOf[Long] == 0L
            i += 1
          }
          println(s"PROBE ccPinned rounds=$i")
          labels
        }
        // variant B: fused round — one union-aggregate computes
        // min(old, neighbor-min, label-of-label) and the changed count,
        // replacing the two label joins (pointer chase rides the OLD
        // labels, so rounds may differ; the fixpoint is identical)
        def ccFused(edges: DataFrame, maxIters: Int = 20): DataFrame = {
          val sym = edges
            .select(col("a").as("src"), col("b").as("dst"))
            .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
            .distinct()
            .repartition(col("dst"))
            .transform(graft.engine.Checkpoints.cut)
          var labels = sym.select(col("src").as("id")).distinct()
            .select(col("id"), col("id").as("comp"))
            .transform(graft.engine.Checkpoints.cut)
          var converged = false
          var i = 0
          while (!converged && i < maxIters) {
            val old = labels.select(col("id"), col("comp"),
              lit(true).as("is_old"))
            val cand = sym
              .join(labels.select(col("id").as("dst"), col("comp")), "dst")
              .select(col("src").as("id"), col("comp"),
                lit(false).as("is_old"))
            val ptr =
              if (i == 0) None
              else Some(labels.select(col("comp").as("jk"), col("id"))
                .join(labels.select(col("id").as("jk"),
                  col("comp").as("pcomp")), Seq("jk"))
                .select(col("id"), col("pcomp").as("comp"),
                  lit(false).as("is_old")))
            val unioned = ptr.foldLeft(old.unionByName(cand))(_ unionByName _)
            val obs = new org.apache.spark.sql.Observation(s"ccp_fus_$i")
            val next = unioned
              .groupBy(col("id"))
              .agg(min(col("comp")).as("comp"),
                min(when(col("is_old"), col("comp"))).as("_old"))
              .observe(obs, sum(when(col("comp") =!= col("_old"), 1L)
                .otherwise(0L)).as("changed"))
              .select(col("id"), col("comp"))
              .transform(graft.engine.Checkpoints.cut)
            graft.engine.Checkpoints.release(labels)
            labels = next
            converged = obs.get("changed").asInstanceOf[Long] == 0L
            i += 1
          }
          println(s"PROBE ccFused rounds=$i")
          labels
        }
        def consume(l: DataFrame): Unit =
          noop(l.groupBy(col("comp")).agg(count(lit(1)).as("n")))
        // correctness cross-check first: all three must agree
        val e0 = pairEdges
        val rOld = ccOld(e0).selectExpr("id", "comp as c1")
        val rPin = ccPinned(e0).selectExpr("id", "comp as c2")
        val rFus = ccFused(e0).selectExpr("id", "comp as c3")
        val diff = rOld.join(rPin, "id").join(rFus, "id")
          .filter(col("c1") =!= col("c2") || col("c1") =!= col("c3")).count()
        val cnts = Seq(rOld.count(), rPin.count(), rFus.count())
        println(s"PROBE cc agreement diff=$diff counts=$cnts")
        // isolate the CC rounds from the edge build: persist the input
        val eP = pairEdges.persist()
        eP.count()
        for (rep <- 1 to 3) {
          time(s"cc old $rep")(consume(ccOld(eP)))
          time(s"cc pinned $rep")(consume(ccPinned(eP)))
          time(s"cc fused $rep")(consume(ccFused(eP)))
        }
        eP.unpersist()
      case "lpa2" =>
        // A/B: committed Lpa.run (two-exchange round) vs one
        // repartition(e_dst) shared by both aggregations
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(explode(array(
              struct(col("c").as("src"), col("su").as("dst")),
              struct(col("su").as("src"), col("c").as("dst")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
        }
        def lpaShared(iterations: Int): org.apache.spark.sql.DataFrame = {
          val e = edges.select(col("src").cast("long").as("e_src"),
            col("dst").cast("long").as("e_dst"))
            .repartition(col("e_src")).persist()
          var labels = e.select(col("e_src").as("node")).distinct()
            .select(col("node"), col("node").as("lbl"))
          var lastCut: org.apache.spark.sql.DataFrame = null
          for (_ <- 1 to iterations) {
            val votes = labels
              .join(e, col("node") === col("e_src"))
              .select(col("e_dst"), col("lbl"))
              .repartition(col("e_dst"))
              .groupBy(col("e_dst"), col("lbl"))
              .agg(count(lit(1)).as("cnt"))
            val plan = votes
              .groupBy(col("e_dst"))
              .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
                .as("w"))
              .select(col("e_dst").as("node"), col("w.l").as("lbl"))
            val next = graft.engine.Checkpoints.cut(plan)
            if (lastCut != null) graft.engine.Checkpoints.release(lastCut)
            lastCut = next
            labels = next
          }
          e.unpersist()
          labels.select(col("node"), col("lbl").as("community"))
        }
        noop(graft.operators.Lpa.run(edges, 5)); spark.catalog.clearCache()
        noop(lpaShared(5)); spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"lpa committed $rep")(noop(graft.operators.Lpa.run(edges, 5)))
          spark.catalog.clearCache()
          time(s"lpa shared-exchange $rep")(noop(lpaShared(5)))
          spark.catalog.clearCache()
        }
      case "q263" =>
        // stage split + A/B: two aggregates over el vs one fused pass
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def pairs = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
        }
        def edges = pairs.select(explode(array(
            struct(col("c").as("src"), col("su").as("dst")),
            struct(col("su").as("src"), col("c").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        def modOld(lab: org.apache.spark.sql.DataFrame) = {
          val m2 = edges.agg(count(lit(1)).as("m2"))
          val el = edges
            .join(lab.select(col("node").as("src"),
              col("community").as("ca")), Seq("src"))
            .join(lab.select(col("node").as("dst"),
              col("community").as("cb")), Seq("dst"))
          val intc = el.filter(col("ca") === col("cb"))
            .groupBy(col("ca").as("community"))
            .agg(count(lit(1)).as("internal2"))
          val degc = el.groupBy(col("ca").as("community"))
            .agg(count(lit(1)).as("deg"))
          val mem = lab.groupBy(col("community"))
            .agg(count(lit(1)).as("n_members"))
          mem.join(degc, Seq("community"))
            .join(intc, Seq("community"), "left")
            .crossJoin(broadcast(m2))
            .select(col("community"), col("n_members"),
              coalesce(col("internal2"), lit(0L)).as("internal2"), col("deg"),
              (col("m2") * coalesce(col("internal2"), lit(0L))
                - col("deg") * col("deg")).as("q_num"))
            .orderBy(col("n_members").desc, col("community")).limit(20)
        }
        def modFused(lab: org.apache.spark.sql.DataFrame) = {
          val m2 = edges.agg(count(lit(1)).as("m2"))
          val el = edges
            .join(lab.select(col("node").as("src"),
              col("community").as("ca")), Seq("src"))
            .join(lab.select(col("node").as("dst"),
              col("community").as("cb")), Seq("dst"))
          val agg = el.groupBy(col("ca").as("community"))
            .agg(count(lit(1)).as("deg"),
              sum(when(col("ca") === col("cb"), 1L).otherwise(0L))
                .as("internal2"))
          val mem = lab.groupBy(col("community"))
            .agg(count(lit(1)).as("n_members"))
          mem.join(agg, Seq("community"))
            .crossJoin(broadcast(m2))
            .select(col("community"), col("n_members"), col("internal2"),
              col("deg"),
              (col("m2") * col("internal2")
                - col("deg") * col("deg")).as("q_num"))
            .orderBy(col("n_members").desc, col("community")).limit(20)
        }
        time("lpa only")(noop(graft.operators.Lpa.run(edges, 5)))
        spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"q263 old $rep") {
            val lab = graft.operators.Lpa.run(edges, 5)
            noop(modOld(lab))
          }
          spark.catalog.clearCache()
          time(s"q263 fused $rep") {
            val lab = graft.operators.Lpa.run(edges, 5)
            noop(modFused(lab))
          }
          spark.catalog.clearCache()
        }
      case "kn" =>
        // stage split for q347_kn_score
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        val docs = graft.engine.Tables(spark, sfDir, "documents")
        def m = graft.operators.KneserNey
          .model(docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        // warm
        noop(m); spark.catalog.clearCache()
        for (rep <- 1 to 2) {
          time(s"model only $rep")(noop(m))
          spark.catalog.clearCache()
          time(s"model c2 only $rep") {
            // just the bigram count, no join-back
            val bg = docs.filter(col("doc_id") % 10 =!= 0)
              .select(col("doc_id"),
                explode(zip_with(
                  slice(graft.operators.TextOps.words(col("text")), lit(1),
                    size(graft.operators.TextOps.words(col("text"))) - 1),
                  slice(graft.operators.TextOps.words(col("text")), lit(2),
                    size(graft.operators.TextOps.words(col("text"))) - 1),
                  (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
              .groupBy(col("b.w1"), col("b.w2")).agg(count(lit(1)).as("c2"))
            noop(bg)
          }
          spark.catalog.clearCache()
          time(s"score full $rep")(noop(graft.operators.KneserNey
            .scoreDocs(docs.filter(col("doc_id") % 10 === 0), "doc_id",
              "text", m).orderBy("doc_id")))
          spark.catalog.clearCache()
        }
      case "kn2" =>
        // A/B: KN model via groupBy+join-back (r15) vs window stats on
        // the c2 exchange (share-one-exchange, the SuffixDedup pattern)
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        val docs = graft.engine.Tables(spark, sfDir, "documents")
        val train = docs.filter(col("doc_id") % 10 =!= 0)
        val held = docs.filter(col("doc_id") % 10 === 0)
        import org.apache.spark.sql.expressions.Window
        def bg = {
          val ws = graft.operators.TextOps.words(col("text"))
          val pairs = zip_with(slice(ws, lit(1), size(ws) - 1),
            slice(ws, lit(2), size(ws) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))
          graft.engine.Par.widen(train).filter(size(ws) >= 2)
            .select(col("doc_id").as("id"), explode(pairs).as("b"))
            .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        }
        def modelWin = {
          val c2 = bg.groupBy(col("w1"), col("w2"))
            .agg(count(lit(1)).as("c2"))
          val all = c2.agg(count(lit(1)).as("n1p_all"))
          c2.withColumn("c1",
              sum(col("c2")).over(Window.partitionBy(col("w1"))))
            .withColumn("n1p_fwd",
              count(lit(1)).over(Window.partitionBy(col("w1"))))
            .withColumn("n1p_bwd",
              count(lit(1)).over(Window.partitionBy(col("w2"))))
            .crossJoin(broadcast(all))
            .select(col("w1"), col("w2"), col("c2"), col("c1"),
              col("n1p_fwd"), col("n1p_bwd"), col("n1p_all"))
        }
        def modelOld = graft.operators.KneserNey.model(train, "doc_id", "text")
        // agreement check
        val a1 = modelOld.selectExpr("w1", "w2", "c2", "c1", "n1p_fwd",
          "n1p_bwd", "n1p_all")
        val a2 = modelWin.selectExpr("w1", "w2", "c2 as d2", "c1 as d1",
          "n1p_fwd as dn1", "n1p_bwd as dn2", "n1p_all as dna")
        val bad = a1.join(a2, Seq("w1", "w2"), "full")
          .filter(col("c2") =!= col("d2") || col("c1") =!= col("d1") ||
            col("n1p_fwd") =!= col("dn1") || col("n1p_bwd") =!= col("dn2") ||
            col("n1p_all") =!= col("dna") ||
            col("c2").isNull || col("d2").isNull).count()
        println(s"PROBE kn2 model diff=$bad")
        for (rep <- 1 to 3) {
          time(s"model old $rep")(noop(modelOld))
          spark.catalog.clearCache()
          time(s"model win $rep")(noop(modelWin))
          spark.catalog.clearCache()
          time(s"score old $rep")(noop(graft.operators.KneserNey
            .scoreDocs(held, "doc_id", "text", modelOld).orderBy("doc_id")))
          spark.catalog.clearCache()
          time(s"score win $rep")(noop(graft.operators.KneserNey
            .scoreDocs(held, "doc_id", "text", modelWin).orderBy("doc_id")))
          spark.catalog.clearCache()
        }
      case "tri" =>
        // stage split for q132_triangles
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val li = t0("lineitem").select(col("l_orderkey"), col("l_partkey"))
          val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
          val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
          a.join(b, Seq("k")).filter(col("u") < col("v"))
            .select(col("u"), col("v")).distinct()
        }
        noop(edges); spark.catalog.clearCache()
        for (rep <- 1 to 2) {
          time(s"edges only $rep")(noop(edges))
          spark.catalog.clearCache()
          time(s"triangles full $rep")(
            noop(graft.operators.Triangles.count(edges)))
          spark.catalog.clearCache()
        }
      case "q156" =>
        // stage split for link prediction
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        val li = t0("lineitem").select(col("l_orderkey"), col("l_partkey"))
        val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
        val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
        def und = a.join(b, Seq("k")).filter(col("u") < col("v"))
          .distinct()
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).select(col("u"), col("v"))
        def sym = und.select(col("u").as("src"), col("v").as("dst2"))
          .unionAll(und.select(col("v").as("src"), col("u").as("dst2")))
        def deg = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
        def mid = sym.join(deg.filter(col("dg") <= 50), "src")
        def wedges = mid.select(col("src"), col("dst2").as("na"))
          .join(mid.select(col("src"), col("dst2").as("nb")), Seq("src"))
          .filter(col("na") < col("nb"))
          .groupBy(col("na"), col("nb")).agg(count(lit(1)).as("cn"))
          .filter(col("cn") >= 2)
        noop(und); spark.catalog.clearCache()
        for (rep <- 1 to 2) {
          time(s"und only $rep")(noop(und))
          spark.catalog.clearCache()
          time(s"wedges $rep")(noop(wedges))
          spark.catalog.clearCache()
          time(s"q156 full $rep")(noop(
            SparkEntry.queries("q156_link_prediction")(spark, sfDir)))
          spark.catalog.clearCache()
        }
      case "q160" =>
        // stage split + cache A/B for RFM
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def cust = {
          val o = t0("orders").select(col("o_custkey"),
            col("o_orderdate").cast("date").as("od"),
            expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
          val maxd = o.agg(max(col("od")).as("maxd"))
          o.crossJoin(broadcast(maxd))
            .groupBy(col("o_custkey"))
            .agg(min(datediff(col("maxd"), col("od"))).cast("bigint")
              .as("recency"),
              count(lit(1)).as("frequency"),
              sum(col("cents")).as("monetary"))
        }
        noop(cust); spark.catalog.clearCache()
        for (rep <- 1 to 2) {
          time(s"cust only $rep")(noop(cust))
          spark.catalog.clearCache()
          time(s"q160 full $rep")(noop(
            SparkEntry.queries("q160_rfm")(spark, sfDir)))
          spark.catalog.clearCache()
        }
      case "aggpack" =>
        // stage splits backing the q50/q151/q318 'inherent' verdicts
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        // q50: exact percentile — the value shuffle IS the plan
        for (rep <- 1 to 2) {
          time(s"q50 scan only $rep")(noop(t0("lineitem")
            .select(col("l_returnflag"), col("l_extendedprice"),
              col("l_quantity"))))
          spark.catalog.clearCache()
          time(s"q50 full $rep")(noop(
            SparkEntry.queries("q50_percentiles")(spark, sfDir)))
          spark.catalog.clearCache()
        }
        // q151: basket self-join stage vs full
        val li = t0("lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        def pairSup = {
          val a = li.select(col("l_orderkey").as("k"),
            col("l_partkey").as("pa"))
          val b = li.select(col("l_orderkey").as("k"),
            col("l_partkey").as("pb"))
          a.join(b, Seq("k")).filter(col("pa") =!= col("pb"))
            .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("sup_ab"))
            .filter(col("sup_ab") >= 3)
        }
        for (rep <- 1 to 2) {
          time(s"q151 li distinct $rep")(noop(li))
          spark.catalog.clearCache()
          time(s"q151 pair join $rep")(noop(pairSup))
          spark.catalog.clearCache()
          time(s"q151 full $rep")(noop(
            SparkEntry.queries("q151_assoc_rules")(spark, sfDir)))
          spark.catalog.clearCache()
        }
        // q318: sketch build vs full (sketch + rank validation scan)
        val ev = t0("events").select(col("event_type"), col("value"))
        for (rep <- 1 to 2) {
          time(s"q318 sketch only $rep")(noop(
            graft.operators.Kll.sketch(ev, "event_type", "value", 128)))
          spark.catalog.clearCache()
          time(s"q318 full $rep")(noop(
            SparkEntry.queries("q318_kll_quantiles")(spark, sfDir)))
          spark.catalog.clearCache()
        }
      case "q160b" =>
        // A/B: committed q160 (cust cached) vs the uncached r15 shape,
        // alternating in one JVM
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def q160Uncached = {
          val o = t0("orders").select(col("o_custkey"),
            col("o_orderdate").cast("date").as("od"),
            expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
          val maxd = o.agg(max(col("od")).as("maxd"))
          val cust = o.crossJoin(broadcast(maxd))
            .groupBy(col("o_custkey"))
            .agg(min(datediff(col("maxd"), col("od"))).cast("bigint")
              .as("recency"),
              count(lit(1)).as("frequency"),
              sum(col("cents")).as("monetary"))
          val nRow = cust.agg(count(lit(1)).as("n"))
          def bounds(metric: String, p: String) = {
            val rc = cust.groupBy(col(metric).as("v"))
              .agg(count(lit(1)).as("cnt"))
            val pre = graft.operators.Packing
              .byTokenOffset(rc, "v", "cnt", Long.MaxValue)
              .select(col("v"), col("token_offset").as("cp"),
                (col("token_offset") + col("cnt")).as("cum"))
            pre.crossJoin(broadcast(nRow))
              .select(col("v"),
                (expr("(5 * cp) div n") + lit(1)).as("ilo"),
                least(expr("(5 * cum) div n"), lit(4L)).as("ihi"))
              .filter(col("ilo") <= col("ihi"))
              .select(col("v"), explode(expr("sequence(ilo, ihi)")).as("i"))
              .groupBy().agg(
                max(when(col("i") === 1, col("v"))).as(p + "1"),
                max(when(col("i") === 2, col("v"))).as(p + "2"),
                max(when(col("i") === 3, col("v"))).as(p + "3"),
                max(when(col("i") === 4, col("v"))).as(p + "4"))
          }
          def asc(m: String, p: String) =
            expr(s"1 + cast($m >= ${p}1 as bigint) + " +
              s"cast($m >= ${p}2 as bigint) + " +
              s"cast($m >= ${p}3 as bigint) + cast($m >= ${p}4 as bigint)")
          cust
            .crossJoin(broadcast(bounds("recency", "rb")))
            .crossJoin(broadcast(bounds("frequency", "fb")))
            .crossJoin(broadcast(bounds("monetary", "mb")))
            .select(col("o_custkey"), col("recency"), col("frequency"),
              col("monetary"),
              (lit(6L) - asc("recency", "rb")).as("r_score"),
              asc("frequency", "fb").as("f_score"),
              asc("monetary", "mb").as("m_score"))
            .withColumn("rfm",
              col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .orderBy("o_custkey")
        }
        noop(q160Uncached); spark.catalog.clearCache()
        noop(SparkEntry.queries("q160_rfm")(spark, sfDir))
        spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"q160 uncached $rep")(noop(q160Uncached))
          spark.catalog.clearCache()
          time(s"q160 cached $rep")(
            noop(SparkEntry.queries("q160_rfm")(spark, sfDir)))
          spark.catalog.clearCache()
        }
      case "stream_store" =>
        // state-store provider A/B on four stateful streams: default
        // (HDFS-backed, in-memory map + file checkpoint) vs RocksDB.
        // Semantics are identical; only the store engine differs.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        val key = "spark.sql.streaming.stateStore.providerClass"
        val rocks =
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        val qs = Seq("q23_stream", "q65_stream_join", "q148_stream_dedup",
          "q164_stream_first_seen", "q372_stream_autocompact")
        qs.foreach { q => // warm (fixture caches)
          noop(SparkEntry.queries(q)(spark, sfDir)); spark.catalog.clearCache()
        }
        for (rep <- 1 to 2) {
          qs.foreach { q =>
            spark.conf.unset(key)
            time(s"$q default $rep")(
              noop(SparkEntry.queries(q)(spark, sfDir)))
            spark.catalog.clearCache()
            spark.conf.set(key, rocks)
            time(s"$q rocksdb $rep")(
              noop(SparkEntry.queries(q)(spark, sfDir)))
            spark.catalog.clearCache()
            spark.conf.unset(key)
          }
        }
      case other =>
        // generic: run the named query once, cold, with one timing
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        time(other)(noop(SparkEntry.queries(other)(spark, sfDir)))
    }
    spark.stop()
  }
}
