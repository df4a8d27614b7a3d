package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation

/** STATS-FIRST PLAN SIZING — the one audited home for every budget
  * switch in the library (the round-13 verdict's unification item).
  * Three operators grew the same discipline independently:
  *
  *  - `AnnIndex.search` (probe-cell literal vs distributed probe join,
  *    `spark.graft.ann.probe.literalBudget`),
  *  - `AnnIndex.searchRefined` (candidate IN-literal vs semi-join,
  *    `spark.graft.ann.refine.literalBudget`),
  *  - `Dedup.containmentPairs` (shingle vs bands candidate generator,
  *    `spark.graft.dedup.containment.bandBudgetBytes`),
  *
  * and round 14 adds a fourth (`Events.saltedAggAuto`). Each needs
  * "how big is this frame?" answered BEFORE choosing a physical plan,
  * and the honest cost ladder is always the same: read what the
  * optimizer already knows for free, and only when the plan genuinely
  * cannot know, pay a job — eagerly checkpointing FIRST so the
  * caller's lineage is never evaluated twice (once for sizing, once
  * for the real query) and a nondeterministic frame cannot size
  * against a different evaluation than the one executed.
  *
  * Kept deliberately tiny: two questions (rows, bytes), zero policy.
  * The budget constants and the direct/switched plan pairs stay with
  * their operators — this object only answers the question they all
  * ask.
  */
object PlanSizing {

  /** Row count of `df` for plan switching, costed zero jobs when the
    * plan already knows: a `LocalRelation` (literal frames — the
    * serving tier's point-query shape) carries its rows; a plan with a
    * CBO row-count estimate carries the count. Otherwise the frame is
    * eagerly `localCheckpoint`ed FIRST and the count reads the
    * materialized partitions. Returns the (possibly checkpointed)
    * frame the caller must use in place of the original plus its
    * count — substituting the checkpoint is what guarantees the
    * sized evaluation IS the executed evaluation.
    */
  def sizedRows(df: DataFrame): (DataFrame, Long) =
    df.queryExecution.optimizedPlan match {
      case l: LocalRelation => (df, l.data.size.toLong)
      case p => p.stats.rowCount match {
        case Some(rc) => (df, rc.toLong)
        case None =>
          val q = df.localCheckpoint()
          (q, q.count())
      }
    }

  /** The optimizer's size estimate for `df` in bytes — zero jobs,
    * always available (file scans estimate from footer-reported file
    * sizes, joins/aggregates propagate). An ESTIMATE, not a
    * measurement: budget switches compare it against thresholds set
    * with order-of-magnitude headroom, which is exactly what a
    * plan-choice needs (the wrong side of a 1 GiB budget by 2× picks
    * a plan that is mildly suboptimal, never wrong).
    */
  def scanBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
