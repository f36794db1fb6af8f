package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Heavy-hitters aggregate: top-k most frequent items, in the
  * space-saving style (bounded state), as a typed
  * `org.apache.spark.sql.expressions.Aggregator` — the user-facing
  * typed-aggregate extension point (SURVEY.md §4).
  *
  * State is an exact counting map truncated to `capacity` entries at
  * merge boundaries; with `capacity ≥` the true distinct count the
  * result is exact and deterministic, beyond that it degrades to an
  * approximation like any space-saving sketch (TopKFreqSpec pins the
  * exact regime against a full wordcount). Truncation order is
  * (count desc, item asc) so equal states truncate identically on
  * every executor.
  *
  * Usage: {{{ ds.select(TopKFreq.topK(10, 1000).toColumn) }}}
  */
class TopKFreq(k: Int, capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  require(k <= capacity, "capacity must be at least k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def truncate(m: mutable.Map[String, Long]): mutable.Map[String, Long] =
    if (m.size <= capacity) m
    else mutable.Map(m.toSeq.sortBy { case (w, c) => (-c, w) }.take(capacity): _*)

  override def reduce(b: mutable.Map[String, Long],
      a: String): mutable.Map[String, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    truncate(b)
  }

  override def merge(x: mutable.Map[String, Long],
      y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (w, c) => x.update(w, x.getOrElse(w, 0L) + c) }
    truncate(x)
  }

  override def finish(m: mutable.Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKFreq {
  def topK(k: Int, capacity: Int = 4096): TopKFreq = new TopKFreq(k, capacity)
}
