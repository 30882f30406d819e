package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream table — the OLAP
  * counterpart of the curation suite: ordered-funnel conversion and
  * cohort retention. Both are the canonical "sessionized user history"
  * shapes a 100 TB event warehouse runs daily.
  *
  * Scale design: every stage is a map-side-combinable `groupBy(user)`
  * or a join keyed on `user` — the event table shuffles by user once
  * per stage and never wider than (user, ts). Nothing windows over a
  * global order; nothing collects to the driver.
  *
  * Timestamps are truncated to seconds before comparison so results are
  * identical across engines that read the parquet `ns` timestamps at
  * different precisions (Spark µs vs DuckDB ns) — same convention as
  * the as-of join (q37).
  */
object EventAnalytics {

  /** Repeat-throttle (telemetry debounce): flag each event `kept` = 1
    * when it is the first of its (entity, kind) or at least
    * `minGapSec` after the PREVIOUS event of that (entity, kind) —
    * the rapid-repeat suppression a collection pipeline runs before
    * sessionization. One lag over the (entity, kind)-keyed window;
    * deterministic under the (`secCol`, `idCol`) order.
    */
  def throttle(df: DataFrame, entityCol: String, kindCol: String,
      secCol: String, idCol: String, minGapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol), col(kindCol))
      .orderBy(col(secCol), col(idCol))
    df.withColumn("_prev", lag(col(secCol), 1).over(w))
      .withColumn("kept",
        when(col("_prev").isNull ||
          col(secCol) - col("_prev") >= minGapSec, 1L).otherwise(0L))
      .drop("_prev")
  }

  /** Strictly-ordered funnel: a user converts through step k when an
    * event of type `steps(k)` happens strictly after their step-(k-1)
    * conversion time and within `maxGapSeconds` of it. Per-user
    * conversion time of step k = the EARLIEST qualifying event.
    *
    * Output: one row per step — (step, step_name, n_users), where
    * n_users counts users who reached that step.
    *
    * Plan: step 0 is one groupBy(user); each later step is one
    * join(user) + groupBy(user) over only the rows of that step's event
    * type (filter pushed to the scan). The per-step frontier is
    * (user, ts) — 16 bytes/user — regardless of corpus size.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val sec = unix_timestamp(date_trunc("second", col(tsCol)))
    val byType = steps.map(st =>
      events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), sec.as("t")))

    // frontier(k): users who reached step k, with earliest conversion ts
    val frontiers = byType.tail.scanLeft(
      byType.head.groupBy(col("u")).agg(min(col("t")).as("t"))) {
      (prev, stepEvents) =>
        stepEvents.join(prev.select(col("u"), col("t").as("pt")), "u")
          .filter(col("t") > col("pt") &&
            col("t") <= col("pt") + lit(maxGapSeconds))
          .groupBy(col("u")).agg(min(col("t")).as("t"))
    }

    frontiers.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Per-user time-to-convert for each funnel transition: one row
    * (step, step_name, u, delta_s) per user who converted step k, with
    * delta_s = conversion time of step k minus conversion time of
    * step k−1 in whole seconds — [[funnel]]'s semantics (strictly
    * after, within `maxGapSeconds`, earliest qualifying event), but
    * keeping WHEN instead of only how many. Feed it a groupBy(step)
    * percentile for the "how long does conversion take" question.
    *
    * Same plan shape as [[funnel]] (per-step filter → join(u) →
    * groupBy(u)), plus one join of adjacent ≤|users|-row frontiers per
    * transition to recover the previous step's timestamp.
    */
  def funnelTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Long): DataFrame = {
    require(steps.size >= 2, "need at least two steps for a transition")
    val sec = unix_timestamp(date_trunc("second", col(tsCol)))
    val byType = steps.map(st =>
      events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), sec.as("t")))
    val frontiers = byType.tail.scanLeft(
      byType.head.groupBy(col("u")).agg(min(col("t")).as("t"))) {
      (prev, stepEvents) =>
        stepEvents.join(prev.select(col("u"), col("t").as("pt")), "u")
          .filter(col("t") > col("pt") &&
            col("t") <= col("pt") + lit(maxGapSeconds))
          .groupBy(col("u")).agg(min(col("t")).as("t"))
    }
    (1 until steps.size).map { k =>
      frontiers(k)
        .join(frontiers(k - 1).select(col("u"), col("t").as("pt")), "u")
        .select(lit(k.toLong).as("step"), lit(steps(k)).as("step_name"),
          col("u"), (col("t") - col("pt")).as("delta_s"))
    }.reduce(_.unionAll(_))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: (from_type, to_type, cnt, p) where p is the row-
    * normalized transition probability. The "what do users do next"
    * query, and the input to next-event prediction baselines.
    *
    * Determinism: consecutive-pair extraction needs a TOTAL per-user
    * order, so ties in `tsCol` break by `idCol` — without it, equal
    * timestamps make the pair sequence engine-dependent. cnt and the
    * row totals are exact longs; p is one deterministic division,
    * rounded.
    *
    * Plan: ONE shuffle of (user, ts, id, type) for the per-user window
    * sort; the transition rollup is a map-side-combinable groupBy onto
    * |types|² rows, and the row-normalizing window runs over that tiny
    * aggregated relation, never the event stream.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val rowTotal = Window.partitionBy(col("from_type"))
    counts.withColumn("p",
        round(col("cnt") / sum(col("cnt")).over(rowTotal), 4))
      .select(col("from_type"), col("to_type"), col("cnt"), col("p"))
  }

  /** Peak concurrency per calendar day: the maximum number of user
    * sessions simultaneously active at any instant of each day — the
    * capacity-planning question ("how many live sessions must the
    * fleet hold?") asked of every event warehouse.
    *
    * Sessions are the same `gapSeconds`-inactivity sessions as q25;
    * a session is active over the CLOSED interval [first event,
    * last event] at second granularity. Sessions spanning midnight are
    * split into per-day segments first, which is what makes the sweep
    * day-partitionable: the classic sweep-line needs one global order,
    * but after the split each day's segments are independent, so the
    * running sum is a per-day window — shuffle by day, never a single
    * global sort. (At 100 TB the day key is the natural partition; a
    * hotter key could split by hour the same way.)
    *
    * Sweep encoding: +1 at segment start, −1 at segment end + 1 s
    * (closed interval), ties processed −1-first so the running count
    * never transiently overcounts an end-then-start second. The max of
    * the running count per day is exact and engine-independent.
    */
  def peakConcurrency(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uw = Window.partitionBy(col("u")).orderBy(col("t"))
    val sessions = events
      .select(col(userCol).as("u"),
        date_trunc("second", col(tsCol)).as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(uw))
      .withColumn("new_s",
        when(col("prev_t").isNull ||
          col("t") > col("prev_t") + expr(s"INTERVAL $gapSeconds SECONDS"), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("u"), col("sid"))
      .agg(min(col("t")).as("s"), max(col("t")).as("e"))
    val segments = sessions
      .select(col("s"), col("e"),
        explode(sequence(date_trunc("day", col("s")),
          date_trunc("day", col("e")),
          expr("INTERVAL 1 DAY"))).as("day_ts"))
      .select(col("day_ts").cast("date").as("day"),
        greatest(col("s"), col("day_ts")).as("seg_s"),
        least(col("e"), col("day_ts") + expr("INTERVAL 86399 SECONDS"))
          .as("seg_e"))
    val deltas = segments
      .select(col("day"), col("seg_s").as("t"), lit(1L).as("delta"))
      .unionAll(segments.select(col("day"),
        (col("seg_e") + expr("INTERVAL 1 SECOND")).as("t"),
        lit(-1L).as("delta")))
    val sweep = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("running", sum(col("delta")).over(sweep))
      .groupBy(col("day"))
      .agg(max(col("running")).as("peak"))
  }

  /** Weekly cohort retention: cohort = ISO week of a user's first
    * event; a user is "retained at offset w" when they have any event
    * in the week `cohort + w`. Output: (cohort_week DATE, week_offset,
    * n_users), n_users = distinct retained users.
    *
    * Plan: first-event week is one groupBy(user) (map-side combinable
    * min); activity is distinct (user, week); one join on user; final
    * rollup is a groupBy on (cohort, offset) — at most
    * |users| × |weeks| rows enter it, already deduped.
    */
  def retention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val week = date_trunc("week", col(tsCol)).cast("date")
    val firstWeek = events
      .select(col(userCol).as("u"), week.as("w"))
      .groupBy(col("u")).agg(min(col("w")).as("cohort_week"))
    val active = events
      .select(col(userCol).as("u"), week.as("w")).distinct()
    active.join(firstWeek, "u")
      .withColumn("week_offset",
        floor(datediff(col("w"), col("cohort_week")) / 7).cast("bigint"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
