package graft

/** Regenerates the golden parquet pins for the queries whose outputs
  * are defined by engine-internal hash functions (xxhash64 MinHash /
  * SimHash, hyperplane LSH, k-means IVF) and therefore have no
  * SQL-expressible DuckDB oracle. The goldens turn those queries'
  * correctness rows from rows-only checks into full regression pins:
  * the oracle SQL reads the pinned parquet back via `read_parquet`.
  *
  * Run after any intentional change to the underlying hash/clustering
  * semantics:
  * {{{
  *   for sf in sf0.001 sf0.01 sf0.1; do
  *     sbt "runMain graft.MakeGolden /root/testdata/$sf golden/$sf"
  *   done
  * }}}
  */
object MakeGolden {
  /** Queries pinned by golden parquet (keep in sync with the
    * `read_parquet` oracles in [[graft.queries.AnalyticsQueries]]).
    */
  val goldenQueries: Seq[String] =
    Seq("q29_minhash", "q30_simhash", "q36_lsh_topk", "q38_ivf_topk",
      "q48_simhash_pairs", "q49_embed_pairs_lsh", "q66_multimodal",
      "q34b_bpe_merges", "q68_incremental_minhash", "q72_incremental_simhash",
      "q73_media_features", "q80_semdedup", "q84_cluster_terms",
      "q91_ann_int8", "q93_survivors", "q96_hll", "q147_cms",
      "q168_pq_topk", "q169_pca_components", "q175_ivfpq", "q182_mmr",
      "q198_ivf_append", "q221_ann_tombstones", "q246_hll_rollup",
      "q271_image_phash", "q273_audio_fingerprint", "q326_unigram_vocab",
      "q333_neardup_sigs", "q338_winnow_fp", "q374_graph_ann")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: regenerate only the named queries (comma-
    // separated) — adding a new pin must not rewrite existing ones
    val wanted =
      if (args.length > 2) goldenQueries.filter(args(2).split(",").contains(_))
      else goldenQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.local("graft-golden", cpus)
    wanted.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[golden] wrote $outDir/$name")
    }
    spark.stop()
  }
}
