package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  test("every text query runs non-empty at sf0.001 and has an oracle") {
    ops.TextAnalysis.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfSmoke).count() > 0, s"$name empty")
    }
    assert(ops.TextAnalysis.queries.keySet == ops.TextAnalysis.oracle.keySet)
  }

  test("token stats invariants: unique ≤ total, avg length positive") {
    val df = ops.TextAnalysis.queries("t01_token_stats")(spark, sfSmoke)
    assert(df.filter(col("n_unique") > col("n_tokens")).count() == 0)
    assert(df.filter(col("avg_token_len") <= 0).count() == 0)
  }

  test("tf-idf ranks exactly ≤3 terms per doc, scores non-increasing") {
    val rows = ops.TextAnalysis.queries("t03_tfidf_top_terms")(spark, sfSmoke)
      .orderBy("doc_id", "rnk").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("quality score is bounded [0, 1]") {
    val df = ops.TextAnalysis.queries("t04_quality_scores")(spark, sfSmoke)
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1)
      .count() == 0)
  }
}
