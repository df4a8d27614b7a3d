package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, CumeDist, CurrentRow, DenseRank, Expression, Lag, Lead, Literal, NTile, PercentRank, RangeFrame, Rank, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, First, Last, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.{NthValue, RowFrame, UnboundedFollowing}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** FLOODED-WINDOW PROTECTION as permanent engine behavior (the r14
  * verdict's top round-15 item): round 14's flooded-partition sweep
  * classified every `Window.partitionBy` site in THIS library and
  * moved the corpus-share exceptions to bounded twins — but that was a
  * manual audit of Scala call sites. A SQL-only client writing
  * `ntile(3) OVER (PARTITION BY lang ORDER BY ...)` or a partition-less
  * `row_number()` still got the one-task sort, caught only at runtime
  * by WindowExec's `No Partition Defined` log line. This rule is the
  * PLAN-TIME twin of that runtime guard, injected into the optimizer
  * (`GraftExtensions` / [[WindowGuard.install]]) behind
  * `spark.graft.window.guard`:
  *
  *  - `off`   — do nothing.
  *  - `warn`  — (default) log a warning naming the window, the hazard,
  *              and the sanctioned alternatives (GlobalRank closed
  *              forms, TopKPerKey / graft_topk for rank-then-filter).
  *              Zero behavior change: existing plans run untouched.
  *  - `fail`  — raise an AnalysisException instead of running a plan
  *              that serializes a corpus through one task. The strict
  *              posture for shared clusters.
  *  - `rewrite` — substitute the GlobalRank closed form when the
  *              window is PROVABLY equivalent to one. Four proven
  *              classes (round 15):
  *              (1) `row_number()` / `ntile(k)` — pure functions of
  *              the (partition, TOTAL order), the same ties caveat
  *              the window itself carries;
  *              (2) the tie-AWARE rank family `rank()` /
  *              `dense_rank()` / `percent_rank()` / `cume_dist()` —
  *              pure functions of the (partition, order VALUE), so
  *              no order caveat at all, provided every ORDER BY key
  *              resolves to a column (peer identity must be
  *              addressable — the analyzer extracts expression keys
  *              into child projections, so this usually holds);
  *              (3) `lag`/`lead` with literal offsets and foldable
  *              defaults (respecting nulls) — a rank-shifted
  *              self-join on the unique global rank;
  *              (4) running `sum` (INTEGRAL inputs only — long
  *              addition is associative, float reassociation is not
  *              bit-stable) and running `count` over UNBOUNDED
  *              PRECEDING..CURRENT ROW frames, both ROWS and RANGE
  *              (SQL's default) flavors;
  *              (5) partition-edge values — `first_value` (frame
  *              starting UNBOUNDED PRECEDING), `last_value` (frame
  *              ending UNBOUNDED FOLLOWING, or the ROWS..CURRENT ROW
  *              identity) and `nth_value` over the full-partition
  *              frame — respect-nulls, each "the value at per-group
  *              rank K" via one bounded stats broadcast;
  *              (6) running `min`/`max` — order-insensitive selection,
  *              exact for EVERY orderable type (no float caveat),
  *              ROWS and RANGE flavors;
  *              (7) full-partition-frame aggregates (`agg(x) OVER
  *              (PARTITION BY g)`, no ORDER BY) for min/max/count/
  *              sum(integral) — constant per group, one bounded
  *              groupBy broadcast; the only rewritable order-less
  *              class.
  *              Everything else — other aggregate frames, ignoreNulls
  *              variants, position-dependent nth_value, float sums —
  *              falls back to `warn`.
  *
  * A window is flagged as corpus-share when its child's optimizer size
  * estimate exceeds `spark.graft.window.guard.budgetBytes` (default
  * 1 GiB — the saltedAggAuto budget discipline: a sub-budget window
  * cannot be meaningfully flooded, and a wrong call costs one slow
  * task, not a plan) AND either
  *  - the partition spec is empty or entirely foldable (the definite
  *    class: ALL rows through one task — including the round-5 case
  *    where a constant partition key folds away between analysis and
  *    execution), or
  *  - column-level stats (CBO / ANALYZE) price the partition keys'
  *    combined distinct count low enough that the average group
  *    exceeds `spark.graft.window.guard.maxGroupRows` (default 2^26
  *    rows — a group that big IS a corpus share in one task).
  * Without column stats the low-cardinality leg stays silent rather
  * than guessing — the definite class needs no stats at all.
  *
  * The rewrite rides [[WindowRewrite]], a deferred-build unary node
  * (the ServingScan discipline): the optimizer replaces the Window
  * node, keeping its exact output attributes so parents resolve
  * untouched, and the GlobalRank program is built against the child
  * plan when the query EXECUTES. Equivalence obligations carried by
  * the rewrite (and pinned by GraftExtensionsSpec): identical values
  * for any total `ORDER BY` (the ntile/row_number precondition on
  * ties), identical schema (IntegerType), null partition keys form
  * one group exactly like the window's.
  */
object WindowGuard {

  val ModeConf = "spark.graft.window.guard"
  val BudgetConf = "spark.graft.window.guard.budgetBytes"
  val MaxGroupRowsConf = "spark.graft.window.guard.maxGroupRows"

  /** warn-once marker so the fixed-point optimizer batches the attach
    * path uses don't re-log per iteration. */
  private[plans] val Flagged = TreeNodeTag[Boolean]("graft.windowGuard")

  /** Attach to an already-built session (the `registerAll` path):
    * `experimental.extraOptimizations` runs the rule in the user
    * batch; the strategy plans the rewrite node. Both idempotent.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(WindowGuardRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowGuardRule
    if (!spark.experimental.extraStrategies.contains(WindowRewriteStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ WindowRewriteStrategy
  }
}

object WindowGuardRule extends Rule[LogicalPlan] {

  import WindowGuard._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get
    val mode = conf.getConfString(ModeConf, "warn")
    if (mode == "off") plan
    else plan.transformUp {
      case w: Window if w.getTagValue(Flagged).isEmpty =>
        hazardOf(w, conf) match {
          case None => w
          case Some(hazard) => mode match {
            case "warn" => flagAndWarn(w, hazard)
            case "fail" =>
              throw new AnalysisException(
                errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
                messageParameters = Map(
                  "parameter" -> "`window`",
                  "functionName" -> s"`${WindowGuard.ModeConf}`",
                  "value" -> (s"corpus-share window blocked: $hazard. " +
                    alternatives)))
            case "rewrite" => tryRewrite(w) match {
              case Some(p) =>
                logWarning(s"graft window guard: REWROTE corpus-share " +
                  s"window (${hazard}) to the GlobalRank closed form")
                p
              case None => flagAndWarn(w, hazard +
                " (not rewritable: proven closed forms cover " +
                "row_number/ntile, rank/dense_rank/percent_rank/" +
                "cume_dist, lag/lead with literal offsets, running " +
                "sum(integral)/count over UNBOUNDED PRECEDING.." +
                "CURRENT ROW frames, and first/last/nth_value with " +
                "partition-edge frames; rank-family and RANGE-frame " +
                "ORDER BY keys must resolve to columns)")
            }
            case other => throw new IllegalArgumentException(
              s"$ModeConf must be off|warn|fail|rewrite, got '$other'")
          }
        }
    }
  }

  private def alternatives: String =
    "Sanctioned bounded forms: graft.plans.GlobalRank (row_number/" +
      "ntile/rank/dense_rank/percent_rank/cume_dist/cumsum closed " +
      "forms), TopKPerKey or the graft_topk TVF (rank-then-filter), " +
      "Events.saltedAggAuto (decomposable aggs); " +
      "or set spark.graft.window.guard=rewrite for the provable class."

  private def flagAndWarn(w: Window, hazard: String): Window = {
    w.setTagValue(Flagged, true)
    logWarning(s"graft window guard: $hazard. $alternatives")
    w
  }

  /** The corpus-share test — see the object scaladoc. Cheap: plan
    * stats only, zero jobs. */
  private def hazardOf(w: Window, conf: SQLConf): Option[String] = {
    val budget = BigInt(conf.getConfString(BudgetConf,
      (1L << 30).toString))
    val bytes = w.child.stats.sizeInBytes
    if (bytes <= budget) None
    else if (w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable))
      Some(s"window over an estimated $bytes-byte child has no " +
        "effective partition key - the WHOLE frame sorts through one " +
        "task")
    else {
      val stats = w.child.stats
      val ndvs = w.partitionSpec.map {
        case a: Attribute =>
          stats.attributeStats.get(a).flatMap(_.distinctCount)
        case _ => None
      }
      val maxGroup = conf.getConfString(MaxGroupRowsConf,
        (1L << 26).toString).toLong
      (stats.rowCount, ndvs) match {
        case (Some(rows), nd) if nd.forall(_.isDefined) =>
          val groups = nd.flatten.product.max(BigInt(1))
          if (rows / groups > BigInt(maxGroup))
            Some(s"window partition keys " +
              s"${w.partitionSpec.map(_.sql).mkString(", ")} price " +
              s"~${rows / groups} rows per group (stats: $rows rows / " +
              s"$groups groups) - each group is a corpus share " +
              "sorting through one task")
          else None
        case _ => None
      }
    }
  }

  /** The provable rewrite classes, one case per GlobalRank closed
    * form. */
  private sealed trait RFn { def out: String; def label: String }
  private case class FPos(fn: String, k: Int, out: String) extends RFn {
    def label: String = fn
  }
  private case class FRank(fn: String, out: String) extends RFn {
    def label: String = fn
  }
  private case class FShift(valueName: String, delta: Int,
      default: Expression, out: String) extends RFn {
    def label: String = if (delta >= 0) "lag" else "lead"
  }
  private case class FRun(isCount: Boolean, valueName: Option[String],
      range: Boolean, out: String) extends RFn {
    def label: String = if (isCount) "running_count" else "running_sum"
  }
  private case class FEdge(flavor: String, valueName: String, n: Int,
      out: String) extends RFn {
    def label: String = flavor match {
      case "first" => "first_value"
      case "last" => "last_value"
      case "self" => "last_value_current"
      case _ => s"nth_value($n)"
    }
  }
  // full-partition frame (no ORDER BY, or explicit UNBOUNDED..
  // UNBOUNDED): op ∈ min|max|sum|count, constant per group
  private case class FFull(op: String, valueName: Option[String],
      out: String) extends RFn {
    def label: String = s"${op}_over_partition"
  }
  // running min/max over UNBOUNDED PRECEDING..CURRENT ROW
  private case class FExt(isMin: Boolean, valueName: String,
      range: Boolean, out: String) extends RFn {
    def label: String = if (isMin) "running_min" else "running_max"
  }

  private def integral(dt: org.apache.spark.sql.types.DataType)
      : Boolean = {
    import org.apache.spark.sql.types._
    dt == ByteType || dt == ShortType || dt == IntegerType ||
      dt == LongType
  }

  /** Build the replacement plan when EVERY window expression in the
    * node is a provable closed form. Conservative by construction:
    * any shape this can't prove returns None (→ warn).
    */
  private def tryRewrite(w: Window): Option[LogicalPlan] = {
    // partition keys must be plain attributes of the child (names the
    // GlobalRank grouped forms can address); all-foldable specs are
    // the empty partition in disguise (constant key = one group)
    val parts: Option[Seq[String]] =
      if (w.partitionSpec.forall(_.foldable)) Some(Seq.empty)
      else if (w.partitionSpec.forall(_.isInstanceOf[AttributeReference]))
        Some(w.partitionSpec.map(_.asInstanceOf[AttributeReference].name))
      else None
    // each window expression: Alias(WindowExpression(fn, spec)) with
    // fn in one of the four proven classes (see the object scaladoc)
    val fns: Option[Seq[RFn]] =
      traverseOpt(w.windowExpressions) {
        case a @ Alias(WindowExpression(RowNumber(), _), _) =>
          Some(FPos("row_number", 0, a.name))
        case a @ Alias(WindowExpression(
            NTile(Literal(k: Int, IntegerType)), _), _) if k >= 1 =>
          Some(FPos("ntile", k, a.name))
        case a @ Alias(WindowExpression(_: Rank, _), _) =>
          Some(FRank("rank", a.name))
        case a @ Alias(WindowExpression(_: DenseRank, _), _) =>
          Some(FRank("dense_rank", a.name))
        case a @ Alias(WindowExpression(_: PercentRank, _), _) =>
          Some(FRank("percent_rank", a.name))
        case a @ Alias(WindowExpression(_: CumeDist, _), _) =>
          Some(FRank("cume_dist", a.name))
        // lag/lead: plain-column input, literal offset, foldable
        // default, respecting-nulls only (ignoreNulls changes which
        // row is the donor — no closed form here)
        case a @ Alias(WindowExpression(lg: Lag, _), _)
            if !lg.ignoreNulls && lg.default.foldable =>
          (lg.input, lg.inputOffset) match {
            case (ar: AttributeReference, Literal(n: Int, IntegerType)) =>
              Some(FShift(ar.name, n, lg.default, a.name))
            case _ => None
          }
        case a @ Alias(WindowExpression(ld: Lead, _), _)
            if !ld.ignoreNulls && ld.default.foldable =>
          (ld.input, ld.offset) match {
            case (ar: AttributeReference, Literal(n: Int, IntegerType)) =>
              Some(FShift(ar.name, -n, ld.default, a.name))
            case _ => None
          }
        // aggregate window functions, dispatched on (function, frame):
        // running sum/count over UNBOUNDED PRECEDING..CURRENT ROW
        // (ROWS and RANGE flavors — sum only for INTEGRAL inputs:
        // long addition is associative so the partial-sum
        // decomposition is bit-exact; float running sums are
        // order-sensitive and stay on the window), and the
        // partition-edge values: first_value with a frame STARTING at
        // UNBOUNDED PRECEDING (the frame's first row is the group's
        // first row at every position), last_value with a frame
        // ENDING at UNBOUNDED FOLLOWING (symmetric) or a ROWS frame
        // ending at CURRENT ROW (the frame's last row IS the row —
        // identity). Respect-nulls only.
        case a @ Alias(WindowExpression(ae: AggregateExpression,
            WindowSpecDefinition(_, _, frame)), _)
            if !ae.isDistinct && ae.filter.isEmpty =>
          (ae.aggregateFunction, frame) match {
            case (s: Sum, SpecifiedWindowFrame(ft, UnboundedPreceding,
                CurrentRow)) if integral(s.child.dataType) =>
              s.child match {
                case ar: AttributeReference => Some(FRun(
                  isCount = false, Some(ar.name),
                  ft == RangeFrame, a.name))
                case _ => None
              }
            case (c: Count, SpecifiedWindowFrame(ft, UnboundedPreceding,
                CurrentRow)) => c.children match {
              // count(*) / count(const): every row counts
              case Seq(l: Literal) if l.value != null => Some(FRun(
                isCount = true, None, ft == RangeFrame, a.name))
              case Seq(ar: AttributeReference) => Some(FRun(
                isCount = true, Some(ar.name), ft == RangeFrame,
                a.name))
              case _ => None
            }
            // running min/max: order-INSENSITIVE selection, exact for
            // every orderable type — no float caveat
            case (m: Min, SpecifiedWindowFrame(ft, UnboundedPreceding,
                CurrentRow)) => m.child match {
              case ar: AttributeReference => Some(FExt(isMin = true,
                ar.name, ft == RangeFrame, a.name))
              case _ => None
            }
            case (m: Max, SpecifiedWindowFrame(ft, UnboundedPreceding,
                CurrentRow)) => m.child match {
              case ar: AttributeReference => Some(FExt(isMin = false,
                ar.name, ft == RangeFrame, a.name))
              case _ => None
            }
            case (f: First, SpecifiedWindowFrame(_, UnboundedPreceding,
                _)) if !f.ignoreNulls =>
              f.child match {
                case ar: AttributeReference =>
                  Some(FEdge("first", ar.name, 0, a.name))
                case _ => None
              }
            case (l: Last, SpecifiedWindowFrame(_, _,
                UnboundedFollowing)) if !l.ignoreNulls =>
              l.child match {
                case ar: AttributeReference =>
                  Some(FEdge("last", ar.name, 0, a.name))
                case _ => None
              }
            case (l: Last, SpecifiedWindowFrame(RowFrame, _,
                CurrentRow)) if !l.ignoreNulls =>
              l.child match {
                case ar: AttributeReference =>
                  Some(FEdge("self", ar.name, 0, a.name))
                case _ => None
              }
            // FULL-partition frame (`agg(x) OVER (PARTITION BY g)` —
            // no ORDER BY resolves to RANGE UNBOUNDED..UNBOUNDED):
            // constant per group, a bounded groupBy broadcast. Sum
            // stays integral-only (groupBy partials reassociate).
            // AFTER the First/Last cases — those own their frames.
            case (fn, SpecifiedWindowFrame(_, UnboundedPreceding,
                UnboundedFollowing)) => fn match {
              case s: Sum if integral(s.child.dataType) =>
                s.child match {
                  case ar: AttributeReference =>
                    Some(FFull("sum", Some(ar.name), a.name))
                  case _ => None
                }
              case c: Count => c.children match {
                case Seq(l: Literal) if l.value != null =>
                  Some(FFull("count", None, a.name))
                case Seq(ar: AttributeReference) =>
                  Some(FFull("count", Some(ar.name), a.name))
                case _ => None
              }
              case m: Min => m.child match {
                case ar: AttributeReference =>
                  Some(FFull("min", Some(ar.name), a.name))
                case _ => None
              }
              case m: Max => m.child match {
                case ar: AttributeReference =>
                  Some(FFull("max", Some(ar.name), a.name))
                case _ => None
              }
              case _ => None
            }
            case _ => None
          }
        // nth_value over the FULL partition frame: the group's n-th
        // row everywhere (null past the group size). The default
        // up..CURRENT ROW frame is position-dependent (null until the
        // frame holds n rows) and is NOT rewritten.
        case a @ Alias(WindowExpression(nv: NthValue,
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(_,
              UnboundedPreceding, UnboundedFollowing))), _)
            if !nv.ignoreNulls =>
          (nv.input, nv.offset) match {
            case (ar: AttributeReference, Literal(n: Int, IntegerType))
                if n >= 1 =>
              Some(FEdge("nth", ar.name, n, a.name))
            case _ => None
          }
        case _ => None
      }
    (parts, fns) match {
      // a window with NO ORDER BY is rewritable only when every
      // expression is a full-frame aggregate (the one class whose
      // value doesn't depend on an order)
      case (Some(group), Some(specs)) if specs.nonEmpty &&
          (w.orderSpec.nonEmpty ||
            specs.forall(_.isInstanceOf[FFull])) =>
        // post-analysis, every ORDER BY key is an AttributeReference
        // into the child (the analyzer extracts expressions into _w0
        // projections). The build lambda re-derives its sort Columns
        // from (name, direction, null-ordering) triples AT BUILD TIME
        // — capturing resolved Columns is WRONG: the nested execution
        // re-analyzes the child plan, and relation deduplication may
        // remap its exprIds, leaving a captured reference stale (a
        // board-run-only MISSING_ATTRIBUTES failure taught this).
        val orderAttrs: Option[Seq[(String, Boolean, Boolean)]] =
          if (w.orderSpec.forall(
              _.child.isInstanceOf[AttributeReference]))
            Some(w.orderSpec.map { so =>
              (so.child.asInstanceOf[AttributeReference].name,
                so.direction == org.apache.spark.sql.catalyst
                  .expressions.Ascending,
                so.nullOrdering == org.apache.spark.sql.catalyst
                  .expressions.NullsFirst)
            })
          else None
        val orderKeys: Option[Seq[String]] =
          orderAttrs.map(_.map(_._1))
        val childNames = w.child.output.map(_.name)
        val reservedOk = childNames.distinct.size == childNames.size &&
          !childNames.exists(n => n.startsWith("__gr") ||
            specs.exists(_.out == n)) &&
          // an OUTPUT alias in the reserved namespace would collide
          // with the closed forms' working columns mid-build — fall
          // back to warn, never crash (review r15)
          !specs.exists(_.out.startsWith("__gr")) &&
          specs.map(_.out).distinct.size == specs.size
        if (!reservedOk || orderAttrs.isEmpty) None
        else {
          val outNames = childNames ++ specs.map(_.out)
          val build: (SparkSession, LogicalPlan) => DataFrame =
            (s, child) => {
              val base = graft.functions.ColumnBridge.ofRows(s, child)
              // name-based sort columns, resolved against THIS plan
              val orderCols = orderAttrs.get.map {
                case (n, true, true) => col(n).asc_nulls_first
                case (n, true, false) => col(n).asc_nulls_last
                case (n, false, true) => col(n).desc_nulls_first
                case (n, false, false) => col(n).desc_nulls_last
              }
              val rankFns = specs.collect { case f: FRank => f }
              // the whole rank family shares one global rank + one
              // peers frame — computed together, never per-function
              val withTieAware =
                if (rankFns.isEmpty) base
                else GlobalRank.rankFunctions(base, group, orderCols,
                  orderKeys.get, rankFns.map(f => (f.fn, f.out)))
              val withRanks = specs.foldLeft(withTieAware) {
                case (df, _: FRank) => df // batched above
                case (df, FPos("row_number", _, name)) =>
                  val r =
                    if (group.isEmpty) GlobalRank(df, orderCols, name)
                    else GlobalRank.groupedRowNumber(df, group,
                      orderCols, name)
                  r.withColumn(name, col(name).cast("int"))
                case (df, FPos("ntile", k, name)) =>
                  GlobalRank.groupedNtile(df, group, orderCols, k, name)
                case (df, FShift(vn, delta, dflt, name)) =>
                  GlobalRank.groupedShift(df, group, orderCols,
                    col(vn), delta,
                    graft.functions.ColumnBridge.column(dflt)
                      .asInstanceOf[org.apache.spark.sql.Column], name)
                case (df, FRun(isCount, vn, range, name)) =>
                  val rk = if (range) Some(orderKeys.get) else None
                  if (isCount) GlobalRank.groupedRunningCount(df,
                    group, orderCols,
                    vn.map(v => col(v).isNotNull.cast("long"))
                      .getOrElse(lit(1L)), name, rk)
                  else GlobalRank.groupedRunningSum(df, group,
                    orderCols, col(vn.get), name, rk)
                case (df, FExt(isMin, vn, range, name)) =>
                  val rk = if (range) Some(orderKeys.get) else None
                  GlobalRank.groupedRunningExtremum(df, group,
                    orderCols, col(vn), isMin, name, rk)
                case (df, FFull(op, vn, name)) =>
                  val aggCol = op match {
                    case "sum" =>
                      org.apache.spark.sql.functions.sum(
                        col(vn.get).cast("long"))
                    case "count" => org.apache.spark.sql.functions
                      .count(vn.map(col).getOrElse(lit(1)))
                    case "min" =>
                      org.apache.spark.sql.functions.min(col(vn.get))
                    case "max" =>
                      org.apache.spark.sql.functions.max(col(vn.get))
                    case other => throw new IllegalStateException(
                      s"unreachable full-frame op $other")
                  }
                  GlobalRank.groupedFullAgg(df, group, aggCol, name)
                case (df, FEdge("self", vn, _, name)) =>
                  df.withColumn(name, col(vn))
                case (df, FEdge(flavor, vn, n, name)) =>
                  val tgt: (org.apache.spark.sql.Column,
                      org.apache.spark.sql.Column) =>
                      org.apache.spark.sql.Column = flavor match {
                    case "first" => (off, _) => off
                    case "last" => (_, mx) => mx
                    case "nth" => (off, _) => off + lit(n - 1)
                    case other => throw new IllegalStateException(
                      s"unreachable edge flavor $other")
                  }
                  GlobalRank.groupedEdgeValue(df, group, orderCols,
                    col(vn), tgt, name)
                case (_, f) => throw new IllegalStateException(
                  s"unreachable window fn $f")
              }
              withRanks.select(outNames.map(col): _*)
            }
          Some(WindowRewrite(w.output, w.child,
            s"${specs.map(_.label).mkString(",")} over " +
              s"(${group.mkString(",")})", build))
        }
      case _ => None
    }
  }

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B])
      : Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }
}

/** Deferred GlobalRank substitution for a flagged Window node: keeps
  * the window's exact output attributes (parents resolve untouched,
  * exprIds preserved), declares every child column referenced (column
  * pruning must not narrow the frame under the closed form), and
  * builds the GlobalRank program at EXECUTION (the ServingScan
  * discipline — the optimizer stays job-free).
  */
case class WindowRewrite(output: Seq[Attribute], child: LogicalPlan,
    desc: String,
    @transient build: (SparkSession, LogicalPlan) => DataFrame)
    extends UnaryNode {
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan)
      : WindowRewrite = copy(child = c)
}

object WindowRewriteStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case wr: WindowRewrite =>
      WindowRewriteExec(wr.output, wr.child, wr.desc, wr.build) :: Nil
    case _ => Nil
  }
}

/** `childPlan` and `build` are `@transient`: a leaf exec node under a
  * shuffle gets SERIALIZED into the parent stage's task closures
  * (WholeStageCodegen captures the plan tree), and the build lambda
  * closes over `Column`s, which are not serializable. Both fields are
  * only read in `doExecute`, which always runs driver-side while the
  * RDD DAG is being built — by the time tasks ship, the RDD exists and
  * the nulled-out fields are dead weight.
  */
case class WindowRewriteExec(output: Seq[Attribute],
    @transient childPlan: LogicalPlan, desc: String,
    @transient build: (SparkSession, LogicalPlan) => DataFrame)
    extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val df = build(session, childPlan)
    val got = df.schema
    require(got.length == output.length && got.zip(output).forall {
        case (f, a) => f.name == a.name && f.dataType == a.dataType },
      s"WindowRewrite($desc): built plan schema " +
        s"[${got.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}]" +
        s" drifted from the window's declared output " +
        s"[${output.map(a => s"${a.name}:${a.dataType.sql}").mkString(", ")}]")
    df.queryExecution.toRdd
  }

  override def simpleString(maxFields: Int): String =
    s"WindowRewriteExec $desc"
}
