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

  test("repetition scores: shares bounded, top-token share at least " +
      "1/n_tokens, and a hand-checked doc agrees") {
    import spark.implicits._
    val df = ops.TextAnalysis.queries("t11_repetition_scores")(spark, sfSmoke)
    assert(df.filter($"top_token_share" <= 0 || $"top_token_share" > 1)
      .count() == 0)
    assert(df.filter($"dup_2gram_share" < 0 || $"dup_2gram_share" >= 1)
      .count() == 0)
    // most frequent token appears ≥ once → share ≥ 1/n (to rounding)
    assert(df.filter($"top_token_share" <
      lit(1.0) / $"n_tokens" - 0.000001).count() == 0)
    // independent ground truth for one doc, in plain Scala
    val text = Tables.load(spark, sfSmoke, "documents")
      .filter($"doc_id" === 0).select($"text").as[String].head()
    val toks = text.split(" ", -1)
    val topCnt = toks.groupBy(identity).values.map(_.length).max
    val g2 = toks.sliding(2).map(_.mkString(" ")).toSeq
    val expectTop = math.rint(topCnt.toDouble / toks.length * 1e6) / 1e6
    val expectDup = if (g2.isEmpty) 0.0
      else math.rint((1.0 - g2.distinct.size.toDouble / g2.size) * 1e6) / 1e6
    val r = df.filter($"doc_id" === 0)
      .select($"top_token_share", $"dup_2gram_share").head()
    assert(math.abs(r.getDouble(0) - expectTop) < 1e-9 &&
      math.abs(r.getDouble(1) - expectDup) < 1e-9,
      s"engine $r vs scala ($expectTop, $expectDup)")
  }
}
