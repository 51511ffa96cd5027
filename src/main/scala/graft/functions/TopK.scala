package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregable top-k by score: keeps a bounded (id, score) buffer,
  * merges map-side. This is the aggregation-shaped alternative to
  * `Window.row_number <= k`: a window shuffles *every* scored row to its
  * group's partition, while this aggregator ships at most k rows per group
  * per map partition through the exchange — the difference between shuffling
  * the corpus and shuffling k·partitions rows at 100 TB.
  *
  * Ordering is total: score desc, then id asc — no float-tie wobble in the
  * emitted id list.
  */
class TopKByScore(k: Int) extends Aggregator[(Long, Double), Array[(Long, Double)], Seq[Long]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  override def zero: Array[(Long, Double)] = Array.empty

  // invariant: buffers are always sorted (score desc, id asc) and ≤ k long
  private def beats(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(buf: Array[(Long, Double)]): Array[(Long, Double)] = {
    val sorted = buf.sortBy { case (id, score) => (-score, id) }
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def reduce(buf: Array[(Long, Double)], row: (Long, Double)): Array[(Long, Double)] =
    // NaN scores are unrankable and, once resident at the buffer tail,
    // would make every IEEE comparison below return false — drop them here.
    if (row._2.isNaN) buf
    // hot path: a full buffer rejects a non-qualifying row in O(1) — no
    // allocation, no sort. Rows that do qualify (≤ k·log n of them across a
    // partition) pay the insert.
    else if (buf.length >= k && !beats(row, buf(buf.length - 1))) buf
    else trim(buf :+ row)

  override def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
    trim((a ++ b).filterNot(_._2.isNaN))

  override def finish(buf: Array[(Long, Double)]): Seq[Long] =
    buf.map(_._1).toSeq // already sorted/trimmed by construction

  override def bufferEncoder: Encoder[Array[(Long, Double)]] =
    Encoders.kryo[Array[(Long, Double)]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object TopK {

  /** Column-level UDAF over struct(id, score) input. */
  def topKIds(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
}
