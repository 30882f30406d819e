package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find pairs of records whose
  * names agree under Jaro–Winkler similarity — the classic
  * dirty-dimension matching operator (customer files, vendor masters,
  * product catalogs) the exact-key joins in the inventory can't
  * express. Candidate generation is BLOCKED (the [[Dedup.fuzzyPairs]]
  * design): records pair only within (first token, length bucket)
  * blocks, so the quadratic kernel runs on in-block pairs, never the
  * corpus cross product, and the self-join shuffles on the block key
  * only. The scoring kernel is a native codegen expression
  * ([[graft.functions.StrKernels.jaroWinkler]]) whose semantics match
  * DuckDB's `jaro_winkler_similarity` exactly, so the oracle
  * re-scores every pair independently — no golden pin.
  *
  * Reference scope note: jcollado/rabbithole has no string-similarity
  * operators (SURVEY §0) — this is part of the LLM-pipeline /
  * curation surface the engine adds.
  */
object Linkage {

  /** Pairs (a, b, jw) with jw ≥ `threshold`, a < b, blocked by
    * (first token, length div `lenBand`). Oversized blocks (>
    * `maxBlock` rows) are excluded from pairing — the bounded-worst-
    * case contract of the dedup family; exclusions are observable by
    * comparing block sizes, not silent row loss inside a block.
    *
    * Collapse EXACT-duplicate names to one representative (groupBy
    * name, min id) before calling this: identical names pair at
    * jw = 1 with every copy, so the pair count inside an exact-dup
    * group is quadratic in its multiplicity — that linking is exact
    * dedup's job, and the collapse bounds this operator's cost by the
    * distinct-name domain instead of the row count.
    */
  def jaroWinklerPairs(records0: DataFrame, idCol: String,
      nameCol: String, threshold: Double, lenBand: Int = 8,
      maxBlock: Int = 10000): DataFrame = {
    val records = graft.engine.Par.widen(records0)
    val keyed = records.select(
      col(idCol).cast("long").as("id"),
      col(nameCol).as("nm"),
      coalesce(try_element_at(split(col(nameCol), " "), lit(1)), lit(""))
        .as("bk"),
      // integral floor division on both engines (`div` / `//`) — a
      // double divide + cast would round differently across engines
      expr(s"length(`$nameCol`) div $lenBand").as("lb"))
    val sized = keyed.withColumn("bc",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("bk"), col("lb"))))
      .filter(col("bc") <= maxBlock)
    val x = sized.select(col("id").as("a"), col("nm").as("na"),
      col("bk"), col("lb"))
    val y = sized.select(col("id").as("b"), col("nm").as("nb"),
      col("bk"), col("lb"))
    x.join(y, Seq("bk", "lb")).filter(col("a") < col("b"))
      // threshold the ROUNDED score: raw doubles can differ by an ulp
      // across engines, and a pair sitting exactly on the threshold
      // would then flip membership — rounded values compare equal
      .withColumn("jw", round(graft.functions.StrFunctions.jaroWinklerSim(
        col("na"), col("nb")), 4))
      .filter(col("jw") >= threshold)
      .select(col("a"), col("b"), col("jw"))
  }
}
