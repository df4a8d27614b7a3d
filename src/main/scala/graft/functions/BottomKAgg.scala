package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: keep the k (key, payload) pairs with the
  * smallest keys — a deterministic "reservoir" when the key is a
  * content hash (md5), unlike `rand()`-based reservoir sampling which
  * can't be replayed or oracle-checked. This fills SURVEY §4.3's
  * custom-aggregate slot: a mutable-buffer aggregate with real merge
  * semantics, used from the typed Dataset API (`ds.groupByKey.agg`).
  *
  * Scale: the buffer is bounded at k entries regardless of group size,
  * and `merge` keeps partial aggregation valid — each map task
  * contributes at most k pairs per group to the shuffle.
  *
  * Output is the payloads of the k smallest keys, key-ordered, as a
  * comma-joined string (trivially comparable against DuckDB's
  * `string_agg(... ORDER BY ...)`).
  */
final class BottomKAgg[IN](k: Int, key: IN => (Long, Long))
    extends Aggregator[IN, BottomKAgg.Buf, String] {
  import BottomKAgg.Buf

  override def zero: Buf = Buf(Nil, Nil)

  private def trim(keys: Seq[Long], vals: Seq[Long]): Buf = {
    val top = keys.zip(vals).sortBy(identity).take(k)
    Buf(top.map(_._1).toList, top.map(_._2).toList)
  }

  override def reduce(b: Buf, in: IN): Buf = {
    val (h, v) = key(in)
    trim(h +: b.keys, v +: b.vals)
  }

  override def merge(a: Buf, b: Buf): Buf =
    trim(a.keys ++ b.keys, a.vals ++ b.vals)

  override def finish(b: Buf): String =
    trim(b.keys, b.vals).vals.mkString(",")

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object BottomKAgg {
  final case class Buf(keys: List[Long], vals: List[Long])
}
