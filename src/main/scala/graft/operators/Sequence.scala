package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analytics — the event-pattern capability SQL
  * engines expose as MATCH_RECOGNIZE and Spark has no built-in operator
  * for: per user, how deep into an ordered stage list (view → click →
  * purchase) did their event stream progress, where each stage must occur
  * strictly after the previously matched one (greedy earliest match — the
  * standard funnel semantics).
  */
object Sequence {

  /** Per-key funnel depth. Events are ordered by (ts, id) — the id
    * tie-break makes simultaneous events deterministic — and a single
    * left-to-right fold advances a stage pointer whenever the next
    * stage's type appears. Returns one row per key: (key, reached) with
    * reached in 0..stages.length.
    *
    * Plan shape: ONE shuffle (groupBy key + sort_array/collect_list with
    * map-side partial aggregation); the fold is a codegen'd `aggregate`
    * over each key's bounded event array — no self-join chain (the
    * naive n-stage formulation is n-1 range self-joins over the full
    * stream), no window over a global order. State per key is its own
    * events only, so skew follows the per-user event distribution, the
    * same bound sessionization (x15) already lives with.
    *
    * Stage names are embedded as SQL string literals; quotes are escaped.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val stageArr = stages
      .map(s => "'" + s.replace("'", "\\'") + "'").mkString("array(", ", ", ")")
    events
      .select(col(keyCol).as("key"),
        struct(col(tsCol).as("t"), col(idCol).as("eid"), col(typeCol).as("ty")).as("e"))
      .groupBy("key").agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("key"),
        expr(s"aggregate(evs, 0, (acc, e) -> " +
          s"IF(acc < ${stages.size} AND e.ty = element_at($stageArr, acc + 1), " +
          "acc + 1, acc))").as("reached"))
  }

  /** Batch gap-sessionization — the window-function idiom for historical
    * data (the streaming twin is `StreamOps.sessionize` / session_window):
    * a new session starts when the gap to the previous event exceeds
    * `gapSeconds`; session index = running sum of the new-session flag.
    * All time arithmetic is exact integer microseconds. Returns one row
    * per session: (key, session_idx, session_start_us, session_end_us,
    * events).
    *
    * Plan shape: ONE (key)-keyed window pass (lag + running sum share the
    * same sort) feeding a groupBy that reuses the window's partitioning —
    * per-key state is the key's own events, the same skew bound the
    * streaming variant lives with.
    */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t_us", "eid")
    events
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("t_us"),
        col(idCol).as("eid"))
      .withColumn("new_session",
        when(col("t_us") - lag(col("t_us"), 1).over(w) > gapSeconds * 1000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("key"), col("session_idx"))
      .agg(min(col("t_us")).as("session_start_us"),
        max(col("t_us")).as("session_end_us"),
        count(lit(1)).as("events"))
  }

  /** SCD2 (slowly-changing-dimension type-2) history build — fold a keyed
    * change log into versioned rows with validity ranges: each change is
    * valid from its own sequence number until the key's next change
    * (NULL = current). The lakehouse table-maintenance op that turns the
    * CDC stream `StreamOps.cdcApply` folds to latest into a queryable
    * full history instead.
    *
    * Plan shape: one (key)-keyed window pass (lead over the sequence) —
    * no join, no self-join; 100 TB of history shuffles once on the key.
    */
  def scd2(changes: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Rolling distinct actives — the trailing-`windowDays` DAU/WAU/MAU
    * family: for every observed day, how many DISTINCT keys were active
    * in the window ending that day. Exact rolling COUNT DISTINCT is the
    * classic hard case (not frame-mergeable, so no window-function route
    * without buffering raw rows per frame); the scale-correct shape used
    * here is contribute-and-regroup: dedup to (day, key), fan each
    * activity out MAP-SIDE to the `windowDays` window-end days it
    * supports (bounded explode, no range join, no giant window
    * partition), and take one distinct-count aggregate keyed by
    * window-end day. Output: (day, actives) for observed days only.
    *
    * Scale: the explode multiplies the DEDUPED (day, key) activity table
    * by windowDays — for a 30-day MAU over years of events that is 30×
    * a small table, not 30× the raw stream; the count_distinct shuffle
    * partitions by day with map-side partial dedup.
    */
  def rollingActives(events: DataFrame, keyCol: String, tsUsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "rollingActives: windowDays must be >= 1")
    val du = events.select(
        expr(s"div(cast($tsUsCol as bigint), 86400000000)").as("day"),
        col(keyCol).as("k"))
      .distinct()
    val observed = du.select("day").distinct()
    val rolled = du
      .select(explode(sequence(col("day"), col("day") + (windowDays - 1)))
        .as("rday"), col("k"))
      .groupBy("rday").agg(count_distinct(col("k")).as("actives"))
    observed.join(rolled, observed("day") === rolled("rday"))
      .select(col("day"), col("actives"))
  }
}
