package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two-phase EXCLUSIVE PREFIX SCAN over a bucket-aggregated frame —
  * the discipline e41 (watermark prefix max), e42 (state-peak offsets)
  * and any future global-running-value query share, promoted to one
  * audited implementation.
  *
  * A global running max/sum over a corpus-sized frame needs a total
  * order, and a partition-less window serializes the whole corpus
  * through one task (the board-wide WindowExec guard bans the class;
  * Catalyst folds constant partition keys right back out). The honest
  * decomposition: callers pre-aggregate to one row per BUCKET (a
  * calendar-bounded axis — hours of arrivals, never corpus rows), and
  * this helper computes each bucket's exclusive prefix (the combined
  * value of all STRICTLY EARLIER buckets) as pure expression work: the
  * bounded frame collapses to a single sorted array row, an indexed
  * transform folds each prefix slice, and the result explodes back to
  * (bucket, prefix). No WindowExec anywhere; the in-bucket residual
  * scan stays with the caller, partitioned by bucket.
  *
  * Cost note: the fold is O(B²) combine steps over the bounded bucket
  * count B (a year of hours is ~8.8k → ~39M adds in one task's
  * expression eval) — fine at the calendar scales the discipline
  * requires; a caller whose bucket axis is NOT calendar-bounded is
  * holding it wrong (that is the contract, spec-pinned by
  * PrefixScanSpec's property tests against the sequential reference).
  *
  * The first bucket's prefix is `zero` (e41 passes -1 as its "no
  * earlier watermark" sentinel; e42 passes 0 — an empty sum).
  */
object PrefixScan {

  sealed trait Op { private[PrefixScan] def sql: String }
  case object MaxOp extends Op {
    private[PrefixScan] val sql = "greatest(acc, y.v)"
  }
  case object SumOp extends Op {
    private[PrefixScan] val sql = "acc + y.v"
  }

  /** (bucket, prefix) for every bucket of `df`: prefix = the op-fold
    * of `value` over all buckets strictly below it, starting from
    * `zero`. `df` must be bucket-aggregated (one row per bucket) and
    * bounded by construction — see the scaladoc contract.
    */
  def exclusive(df: DataFrame, bucket: Column, value: Column, op: Op,
      zero: Long): DataFrame =
    df.select(bucket.cast("long").as("b"), value.cast("long").as("v"))
      .agg(sort_array(collect_list(struct(col("b"), col("v")))).as("bs"))
      .select(explode(expr(
        "transform(bs, (x, i) -> struct(x.b AS bucket, " +
          s"aggregate(slice(bs, 1, i), cast($zero as bigint), " +
          s"(acc, y) -> ${op.sql}) AS prefix))")).as("r"))
      .select(col("r.bucket").as("bucket"), col("r.prefix").as("prefix"))
}
