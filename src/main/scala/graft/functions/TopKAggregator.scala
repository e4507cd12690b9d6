package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the top-k (value, id) pairs per group —
  * the bounded-memory alternative to `row_number() OVER (...) <= k` when
  * groups are huge: a window sorts EVERY row of a group (full shuffle +
  * sort of 100 TB), while this aggregator's state never exceeds k entries
  * per group, participates in map-side partial aggregation, and merges
  * associatively — the same contract Spark's own `collect_top_k` /
  * TakeOrderedAndProject use. At 1000 executors the shuffle carries only
  * (groups × k) entries instead of all rows.
  *
  * Ordering: value DESC, then id ASC as the tie-break, so results are
  * deterministic and oracle-checkable.
  *
  * Buffer is a descending-sorted List capped at k (insertion is O(k);
  * fine for the k ≤ 100 this is meant for — a heap only wins at large k).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], List[(Long, Long)]] {
  require(k > 0, "k must be positive")

  // (id, value) in, sorted-by-(value desc, id asc) list as state and out
  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: List[(Long, Long)] = Nil

  override def reduce(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] =
    insert(buf, in)

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] = {
    // skip the O(k) insertion when the buffer is full and e is out of range
    if (buf.lengthCompare(k) >= 0 && !lt(e, buf.last)) buf
    else {
      val (before, after) = buf.span(lt(_, e))
      (before ::: e :: after).take(k)
    }
  }

  override def finish(reduction: List[(Long, Long)]): List[(Long, Long)] = reduction

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()
  override def outputEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()
}

/** Double-valued sibling of [[TopKAggregator]] for score columns (cosine,
  * jaccard): same bounded k-entry state, same (value desc, id asc)
  * determinism. NaN scores sort last (both comparisons false → treated as
  * smallest), vs largest-first under a window sort — don't feed NaN if the
  * two paths must agree; the ANN operators never produce NaN for non-zero
  * vectors.
  */
final class TopKDoubleAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], List[(Long, Double)]] {
  require(k > 0, "k must be positive")

  private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)], in: (Long, Double)): List[(Long, Double)] =
    insert(buf, in)

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(Long, Double)], e: (Long, Double)): List[(Long, Double)] = {
    if (buf.lengthCompare(k) >= 0 && !lt(e, buf.last)) buf
    else {
      val (before, after) = buf.span(lt(_, e))
      (before ::: e :: after).take(k)
    }
  }

  override def finish(reduction: List[(Long, Double)]): List[(Long, Double)] = reduction

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    ExpressionEncoder[List[(Long, Double)]]()
  override def outputEncoder: Encoder[List[(Long, Double)]] =
    ExpressionEncoder[List[(Long, Double)]]()
}

object TopKAggregator {
  /** Untyped-DataFrame handle: `topK(5)(col("id"), col("value"))` →
    * `array<struct<_1 id, _2 value>>` sorted by value desc.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[(Long, Long)])

  /** Double-score variant: `topKDouble(5)(col("id"), col("cosine"))`. */
  def topKDouble(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKDoubleAggregator(k), Encoders.product[(Long, Double)])
}
