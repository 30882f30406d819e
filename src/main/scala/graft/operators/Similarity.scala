package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *     set against the corpus, score every (query, corpus) pair, take
  *     top-k per query. Linear in |corpus|, embarrassingly parallel; the
  *     corpus is never shuffled.
  *   - [[lshTopK]]: the scale path — random-hyperplane LSH buckets on
  *     both sides; only bucket-colliding pairs are scored (multi-probe
  *     via several independent tables to keep recall up).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Plan: `broadcast(queries) × corpus` (a BroadcastNestedLoopJoin whose
    * streamed side is the corpus — scales out with corpus partitions),
    * then per-query top-k. The top-k uses a window only over the scored
    * pairs (|queries| × |corpus| rows never materialize beyond the
    * aggregation input; with AQE the shuffle is |queries| keys wide).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // norms once per row (not per pair): the per-pair hot loop is a
    // single codegen'd dot product
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      normSq(col(vecCol)).as("qn"))
    val c = graft.engine.Par.widen(corpus)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        normSq(col(vecCol)).as("cn"))
    val joined = c.crossJoin(broadcast(q))
    val scored0 = if (excludeSelf) joined.filter(col("qid") =!= col("cid")) else joined
    val scored = scored0.withColumn("sim",
      cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"),
        col("rn").cast("bigint").as("rn"))
  }

  /** LSH-bucketed approximate top-k: `tables` independent hyperplane
    * hashes; candidates = bucket collisions in any table; exact cosine
    * re-rank within candidates. Recall grows with `tables`, cost stays
    * ~|corpus| × tables instead of |queries| × |corpus|.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 12, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String, nrm: String): DataFrame =
      df.select(
        col(idCol).as(id) +: col(vecCol).as(vec) +:
        normSq(col(vecCol)).as(nrm) +:
        (0 until tables).map(t =>
          hyperplaneBucket(col(vecCol), nPlanes, seed = 1000 * t).as(s"bkt$t")): _*)
    val q = bucketed(queries, "qid", "qv", "qn")
    val c = bucketed(graft.engine.Par.widen(corpus), "cid", "cv", "cn")
    val candidates = (0 until tables).map { tb =>
      c.join(broadcast(q.select(col("qid"), col("qv"), col("qn"), col(s"bkt$tb"))),
          Seq(s"bkt$tb"))
        .select(col("qid"), col("qv"), col("qn"),
          col("cid"), col("cv"), col("cn"))
    }.reduce(_ unionByName _).distinct()
      .filter(col("qid") =!= col("cid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    candidates.withColumn("sim",
      cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"),
        col("rn").cast("bigint").as("rn"))
  }
}
