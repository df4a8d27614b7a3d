package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two-phase EXCLUSIVE PREFIX SCAN over a bucket-aggregated frame —
  * the discipline e41 (watermark prefix max), e42 (state-peak offsets),
  * e43 (Lindley backlog prefixes) and any future global-running-value
  * query share, promoted to one audited implementation.
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
  * requires. The calendar-boundedness CONTRACT is enforced, not just
  * documented (the round-13 advisory): a frame wider than
  * `spark.graft.prefixscan.maxBuckets` (default 131072 — generous for
  * any calendar axis, 15 years of hours) fails loudly with
  * `raise_error` inside the collapsed-row projection instead of
  * silently running a one-task quadratic blowup or OOMing the
  * collect_list. A caller whose bucket axis is NOT calendar-bounded is
  * holding it wrong; at genuinely finer grains, narrow the bucket
  * width until the count is bounded again (the structure is
  * width-agnostic) or segment the scan.
  *
  * The first bucket's prefix is `zero` (e41 passes -1 as its "no
  * earlier watermark" sentinel; e42 and e43 pass 0 — an empty sum).
  */
object PrefixScan {

  sealed trait Op { private[PrefixScan] def sql: String }
  case object MaxOp extends Op {
    private[PrefixScan] val sql = "greatest(acc, y.v)"
  }
  case object SumOp extends Op {
    private[PrefixScan] val sql = "acc + y.v"
  }
  case object MinOp extends Op {
    private[PrefixScan] val sql = "least(acc, y.v)"
  }

  /** Default ceiling on the collapsed bucket frame — see the contract
    * note in the object scaladoc. Override per session via
    * `spark.graft.prefixscan.maxBuckets`.
    */
  private[graft] val DefaultMaxBuckets = 131072L

  /** The sorted single-row bucket frame with the boundedness contract
    * enforced at the one place the frame materializes. `groups` rides
    * along untouched (empty → one global row).
    */
  private def collapsed(df: DataFrame, bucket: Column, value: Column,
      groups: Seq[String]): DataFrame = {
    val cap = df.sparkSession.conf
      .get("spark.graft.prefixscan.maxBuckets",
        DefaultMaxBuckets.toString).toLong
    require(!groups.exists(Set("b", "v")),
      "group columns may not be named 'b' or 'v'")
    val pre = df.select((groups.map(col) :+ bucket.cast("long").as("b")
      :+ value.cast("long").as("v")): _*)
    val agged =
      if (groups.isEmpty)
        pre.agg(sort_array(collect_list(struct(col("b"), col("v"))))
          .as("bs"))
      else
        pre.groupBy(groups.map(col): _*)
          .agg(sort_array(collect_list(struct(col("b"), col("v"))))
            .as("bs"))
    agged.withColumn("bs", expr(
      s"if(size(bs) <= ${cap}L, bs, raise_error(concat(" +
        "'PrefixScan: bucket frame violates the calendar-bounded " +
        s"contract (', cast(size(bs) as string), ' > ${cap} buckets " +
        "- narrow the bucket axis or raise " +
        "spark.graft.prefixscan.maxBuckets)')))"))
  }

  /** (bucket, prefix) for every bucket of `df`: prefix = the op-fold
    * of `value` over all buckets strictly below it, starting from
    * `zero`. `df` must be bucket-aggregated (one row per bucket) and
    * bounded by construction — see the scaladoc contract (enforced).
    */
  def exclusive(df: DataFrame, bucket: Column, value: Column, op: Op,
      zero: Long): DataFrame =
    collapsed(df, bucket, value, Seq.empty)
      .select(explode(expr(
        "transform(bs, (x, i) -> struct(x.b AS bucket, " +
          s"aggregate(slice(bs, 1, i), cast($zero as bigint), " +
          s"(acc, y) -> ${op.sql}) AS prefix))")).as("r"))
      .select(col("r.bucket").as("bucket"), col("r.prefix").as("prefix"))

  /** The Lindley form (e43's accumulator, promoted per the round-13
    * verdict — as a LINEAR terminal fold, deliberately NOT the O(B²)
    * per-bucket explode): per group, ONE pass of the queue recursion
    * backlog = max(0, backlog + value) over the sorted bucket frame,
    * carried in closed prefix form (p = running sum, mn = running
    * min over prefix sums seeded at the empty-prefix 0, backlog =
    * p − mn). A consumer that needs only the terminal statistics —
    * peak backlog, buckets spent backlogged, the final backlog —
    * must not pay the per-bucket quadratic fold: round 14 measured
    * e43 at 0.18 s (linear, ~4.3k epochs × 3 caps) vs 7.3 s through
    * the exclusive-prefix explode at sf0.1. The per-bucket
    * [[exclusive]] form stays for consumers that genuinely emit a
    * value per bucket (e41/e42, hours-bounded frames).
    *
    * `groups` (column NAMES of `df`; e43: the admission cap) fans the
    * fold out: one collapsed row and one linear pass per group, same
    * enforced contract per group. Output: groups ++
    * (peak_backlog, backlogged_buckets, final_backlog).
    */
  def lindleyStats(df: DataFrame, bucket: Column, value: Column,
      groups: Seq[String] = Seq.empty): DataFrame =
    collapsed(df, bucket, value, groups)
      .withColumn("acc", expr("""
        aggregate(bs,
          named_struct('p', cast(0 as bigint), 'mn', cast(0 as bigint),
            'b', cast(0 as bigint), 'peak', cast(0 as bigint),
            'nb', cast(0 as bigint)),
          (acc, y) -> named_struct(
            'p', acc.p + y.v,
            'mn', least(acc.mn, acc.p + y.v),
            'b', acc.p + y.v - least(acc.mn, acc.p + y.v),
            'peak', greatest(acc.peak,
              acc.p + y.v - least(acc.mn, acc.p + y.v)),
            'nb', acc.nb + if(acc.p + y.v
              - least(acc.mn, acc.p + y.v) > 0, 1, 0)))"""))
      .select((groups.map(col) :+ col("acc.peak").as("peak_backlog")
        :+ col("acc.nb").as("backlogged_buckets")
        :+ col("acc.b").as("final_backlog")): _*)
}
