package graft.operators

import org.apache.spark.sql.DataFrame
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
}
