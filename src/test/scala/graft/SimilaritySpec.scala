package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  private def pairs(name: String) =
    ops.Similarity.queries(name)(spark, sfSmoke)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("every similarity query runs non-empty at sf0.001 and has an oracle") {
    ops.Similarity.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfSmoke).count() > 0, s"$name empty")
    }
    assert(ops.Similarity.queries.keySet == ops.Similarity.oracle.keySet)
  }

  test("exact top-k: 5 neighbors per query, cosine within [-1,1], " +
      "no self-matches") {
    val df = ops.Similarity.queries("s01_cosine_topk")(spark, sfSmoke)
    assert(df.count() == 50)
    assert(df.filter(col("cos") < -1 || col("cos") > 1).count() == 0)
    assert(df.filter(col("q_id") === col("n_id")).count() == 0)
  }

  test("ANN variants trade recall for candidate pruning (recall > 0, " +
      "IVF ≥ LSH on this clustered fixture)") {
    val exact = pairs("s01_cosine_topk")
    val lsh = pairs("s03_lsh_ann_topk")
    val ivf = pairs("s04_ivf_ann_topk")
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(f"LSH recall=$lshRecall%.2f IVF recall=$ivfRecall%.2f")
    assert(lshRecall > 0.0 && ivfRecall > 0.0)
    assert(ivfRecall >= lshRecall,
      "on a label-clustered fixture IVF probing should beat 1-table LSH")
  }

  test("s06: the gated recall measurement equals the independently " +
      "computed s01/s03 overlap") {
    val exact = pairs("s01_cosine_topk")
    val lsh = pairs("s03_lsh_ann_topk")
    val byQ = exact.groupBy(_._1).map { case (q, ps) =>
      q -> ps.count(lsh.contains)
    }
    val s06 = ops.Similarity.queries("s06_ann_recall")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s06 == byQ.map { case (q, n) => q -> n.toLong },
      s"gated recall disagrees with direct set intersection: $s06 vs $byQ")
  }

  test("LSH buckets partition the corpus") {
    val total = ops.Similarity.queries("s02_lsh_buckets")(spark, sfSmoke)
      .agg(sum("n_vectors")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sfSmoke, "embeddings").count())
  }
}
