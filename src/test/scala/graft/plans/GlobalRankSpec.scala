package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** GlobalRank — the distributed total rank (range sort + per-partition
  * offsets): equal to `row_number()` over the same total order, with
  * NO WindowExec anywhere in its plan (the partition-less window it
  * replaces is the one-task-sorts-everything shape PlanShapeSpec bans
  * board-wide).
  */
class GlobalRankSpec extends SparkTestBase {

  test("GlobalRank == partition-less row_number over the same total " +
      "order; the plan has no WindowExec; ranks survive input " +
      "repartitioning") {
    import spark.implicits._
    val base = Tables.load(spark, sfVerify, "documents")
      .select($"doc_id", $"n_chars")
    // a deliberately shuffled input: ranks must depend on the ORDER
    // ARGUMENT only, never on incoming partitioning
    val shuffled = base.repartition(13, $"n_chars")
    val got = GlobalRank(shuffled,
        Seq($"n_chars".desc, $"doc_id".asc), "rnk")
      .select($"doc_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = base
      .withColumn("rnk", row_number().over(
        Window.orderBy($"n_chars".desc, $"doc_id".asc)))
      .select($"doc_id", $"rnk".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(want),
      s"GlobalRank must equal the window form; first diffs: " +
        s"${got.zip(want).filter(p => p._1 != p._2).take(3).mkString(",")}")

    val ranked = GlobalRank(shuffled,
      Seq($"n_chars".desc, $"doc_id".asc), "rnk")
    assert(!ranked.queryExecution.executedPlan.toString
        .contains("Window"),
      "GlobalRank must not plan any window operator")
  }
}
