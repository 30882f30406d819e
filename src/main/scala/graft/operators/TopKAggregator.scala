package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Aggregator` (the engine's UDAF surface, SURVEY §2.2): per
  * group, keep the top-k (score, id) pairs with a bounded buffer.
  *
  * vs. the window formulation (`row_number over (order by score desc)`)
  * this is a partial-aggregatable O(n log k) pass: each map task reduces
  * its partition to k rows before the shuffle, so the shuffle carries
  * |groups| * k rows instead of every scored row — the difference
  * between shuffling 100 TB of candidates and shuffling the answer.
  */
object TopKAggregator {
  case class Scored(score: Double, id: Long)

  /** Buffer = ascending-sorted Vector of at most k (worst first). */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty

    private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ s).sortBy(x => (x.score, -x.id))
      else if (s.score > buf.head.score ||
               (s.score == buf.head.score && s.id < buf.head.id))
        (buf.tail :+ s).sortBy(x => (x.score, -x.id))
      else buf

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      b2.foldLeft(b1)(insert)
    override def finish(r: Seq[Scored]): Seq[Scored] = r.reverse // best first
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Top-k rows per group of `df`: groups by `groupCol`, ranks by
    * `scoreCol` desc (ties: lower `idCol` wins), returns
    * (group, id, score, rn).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopK(k), Encoders.product[Scored])
    df.select(col(groupCol).as("grp"),
        struct(col(scoreCol).cast("double").as("score"),
          col(idCol).cast("long").as("id")).as("s"))
      .groupBy("grp")
      .agg(agg(col("s.score"), col("s.id")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id").as("id"),
        col("col.score").as("score"), (col("pos") + 1).cast("bigint").as("rn"))
  }
}
