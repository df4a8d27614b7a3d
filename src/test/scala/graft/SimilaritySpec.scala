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

  test("int8 quantization: fidelity high on every vector, absmax " +
      "round-trips exactly") {
    import spark.implicits._
    val df = ops.Similarity.queries("s07_int8_quant")(spark, sfSmoke)
    // 64-dim near-uniform vectors: int8 keeps cosine ≈ 1 (the gate a
    // real pipeline applies before swapping the fp index out)
    assert(df.filter($"q_cos" < 0.999).count() == 0,
      "int8 dequantized cosine must stay above 0.999 on this fixture")
    assert(df.filter($"q_cos" > 1.0).count() == 0)
    // independent ground truth for one vector: quantize in plain Scala
    val v = Tables.load(spark, sfSmoke, "embeddings")
      .filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val amax = v.map(math.abs).max
    // HALF_UP (away from zero), matching Spark/DuckDB round() — Scala's
    // math.round is half-toward-+inf and diverges on negative .5 ties
    def rnd(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    val dq = v.map(x => rnd(x * 127.0 / amax) * amax / 127.0)
    val dot = v.zip(dq).map { case (a, b) => a * b }.sum
    val expect = dot / (math.sqrt(v.map(x => x * x).sum) *
      math.sqrt(dq.map(x => x * x).sum))
    val got = df.filter($"vec_id" === 0).select($"q_cos")
      .as[Double].head()
    assert(math.abs(got - math.rint(expect * 1e6) / 1e6) < 1e-9,
      s"engine q_cos $got vs scala ground truth $expect")
  }

  test("LSH buckets partition the corpus") {
    val total = ops.Similarity.queries("s02_lsh_buckets")(spark, sfSmoke)
      .agg(sum("n_vectors")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sfSmoke, "embeddings").count())
  }

  test("s11: int8-recall + float-rerank recovers (nearly) the exact " +
      "top-k — quantization only perturbs below the candidate cut") {
    val exact = pairs("s01_cosine_topk")
    val reranked = pairs("s11_quantized_rerank")
    val recall = (exact & reranked).size.toDouble / exact.size
    info(f"two-stage recall vs exact = $recall%.2f")
    // int8 absmax on 64-dim vectors distorts cosines by <1%; with a
    // 50-candidate stage-1 cut the final top-5 should be essentially
    // exact — well above any ANN variant
    assert(recall >= 0.9, f"two-stage recall $recall%.2f too low")
  }

  test("s05 skew guard: a flooded label's pair count is capped at " +
      "C(cap,2) (uncapped all-pairs would be quadratic in occupancy)") {
    import spark.implicits._
    // Planted flood: label 0 holds 200 members against a cap of 16;
    // label 1 sits below the cap and must be EXACT (identical to the
    // uncapped statistic).
    val cap = 16
    val e = spark.range(200)
      .select($"id".as("vec_id"), lit(0L).as("label"),
        array(($"id" % 7).cast("double") + 1.0,
          ($"id" % 3).cast("double") + 1.0).as("v"))
      .union(spark.range(200, 210)
        .select($"id".as("vec_id"), lit(1L).as("label"),
          array(($"id" % 5).cast("double") + 1.0, lit(2.0)).as("v")))
    val capped = ops.Similarity.labelCohesion(spark, e, cap).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(capped(0L).getLong(1) == cap.toLong * (cap - 1) / 2,
      s"flooded label produced ${capped(0L).getLong(1)} pairs, want " +
        s"${cap * (cap - 1) / 2} (uncapped would be ${200 * 199 / 2})")
    // the cap keeps the LOWEST vec_ids: deterministic, so the capped
    // flooded-label stats equal the same computation on members 0..15
    val first16 = ops.Similarity.labelCohesion(spark,
      e.filter($"label" === 1L || $"vec_id" < cap), Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(capped(0L).getDouble(2) == first16(0L).getDouble(2) &&
      capped(0L).getDouble(3) == first16(0L).getDouble(3))
    // below-cap label: capped == uncapped exactly
    assert(capped(1L).getLong(1) == 45L &&
      capped(1L).getDouble(2) == first16(1L).getDouble(2))
  }

  test("s12: one neighbor per cell, champions are true per-cell maxima, " +
      "and the global rank orders by cosine") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val s12 = ops.Similarity.queries("s12_diverse_topk")(spark, sfSmoke)
      .collect()
    assert(s12.nonEmpty)
    s12.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val labels = rs.map(_.getAs[Int]("label"))
      assert(labels.distinct.length == labels.length,
        s"query $q returned two neighbors from one cell")
      val byRank = rs.sortBy(_.getAs[Int]("rnk"))
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"query $q ranks not ordered by cosine")
    }
    // champions must equal the per-(query, cell) max cosine computed
    // independently by brute force
    val e = Tables.load(spark, sfSmoke, "embeddings")
      .select($"vec_id", $"label",
        $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val best = e.select($"vec_id".as("n_id"), $"label", $"v")
      .join(broadcast(q), $"q_id" =!= $"n_id")
      .withColumn("cos", round(graft.functions.CosineSim($"qv", $"v"), 4))
      .groupBy($"q_id", $"label").agg(max($"cos").as("best_cos"))
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("label")) ->
        r.getAs[Double]("best_cos")).toMap
    s12.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Int]("label"))
      assert(r.getAs[Double]("cos") == best(k),
        s"champion for $k is not the cell max")
    }
  }

  test("s14/s16: trained assignments PARTITION the corpus (every vector " +
      "in exactly one cell, per subspace for PQ); s15 recall bounded") {
    val n = Tables.load(spark, sfSmoke, "embeddings").count()
    val s14 = ops.Similarity.queries("s14_kmeans_train")(spark, sfSmoke)
      .collect()
    assert(s14.map(_.getAs[Long]("n_members")).sum == n,
      "k-means cells must partition the corpus")
    assert(s14.forall(r => r.getAs[Long]("n_sample") <=
      r.getAs[Long]("n_members")), "sample members outnumber members")
    val s16 = ops.Similarity.queries("s16_pq_train")(spark, sfSmoke)
      .collect()
    s16.groupBy(_.getAs[Int]("sub")).foreach { case (sub, rs) =>
      assert(rs.map(_.getAs[Long]("n_members")).sum == n,
        s"PQ subspace $sub does not partition the corpus")
    }
    val s15 = ops.Similarity.queries("s15_trained_recall")(spark, sfSmoke)
      .collect()
    assert(s15.forall { r =>
      val rec = r.getAs[Double]("recall")
      rec >= 0.0 && rec <= 1.0
    }, "recall out of [0,1]")
  }

  test("s14 determinism: identical trained index under a different " +
      "shuffle partitioning (the 6 dp rounding discipline at work)") {
    val base = ops.Similarity.queries("s14_kmeans_train")(spark, sfSmoke)
      .collect().toSeq
    withConfs("spark.sql.shuffle.partitions" -> "3") {
      val alt = ops.Similarity.queries("s14_kmeans_train")(spark, sfSmoke)
        .collect().toSeq
      assert(alt == base,
        "trained cells changed with the partition count — a rounding " +
          "seam is leaking summation order")
    }
  }

  test("s53: artifact structure ratios hold (codes = PqM x invlists, " +
      "bands = 3 x fps), kind totals add up, and shard division is " +
      "consistent") {
    val rows = ops.Similarity.queries("s53_serving_memory_card")(
      spark, sfSmoke).collect()
      .map(r => r.getAs[String]("component") -> r).toMap
    assert(rows("ann/codes").getAs[Long]("n_rows") ==
      8L * rows("ann/invlists").getAs[Long]("n_rows"))
    assert(rows("dedup/bands").getAs[Long]("n_rows") ==
      3L * rows("dedup/fps").getAs[Long]("n_rows"))
    rows.values.groupBy(_.getAs[String]("kind")).foreach { case (k, rs) =>
      val total = rs.map(_.getAs[Long]("est_bytes")).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("kind_bytes") == total,
          s"$k kind_bytes must equal the component sum")
        assert(r.getAs[Long]("shards") == (total + (1L << 20) - 1) / (1L << 20))
        assert(r.getAs[Long]("est_bytes") > 0)
      }
    }
  }

  test("s53 migration proof: the schema-derived widths (ServingWidths) " +
      "equal the historical documented constants, and schema drift " +
      "fails loudly") {
    // the round-14 refactor swapped hand-maintained width constants
    // for the schema-validated per-field policy; this pins that the
    // derived per-row widths reproduce the documented model EXACTLY
    // (the fixed-width components divide evenly; postings decompose
    // into 24 B fixed + term bytes + 8 B per position)
    val rows = ops.Similarity.queries("s53_serving_memory_card")(
      spark, sfSmoke).collect()
      .map(r => r.getAs[String]("component") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("est_bytes"))).toMap
    Seq("ann/invlists" -> 16L, "ann/codes" -> 17L,
      "ann/centroids" -> 520L, "ann/codebooks" -> 80L,
      "text/docs" -> 16L, "dedup/fps" -> 40L, "dedup/bands" -> 32L)
      .foreach { case (c, w) =>
        val (n, b) = rows(c)
        assert(b == n * w, s"$c: derived $b != documented $w x $n rows")
      }
    val (nPost, bPost) = rows("text/postings")
    val textDir = ops.ServingIndexes.text(spark, sfSmoke)
    val agg = spark.read.parquet(s"$textDir/postings")
      .agg(org.apache.spark.sql.functions.expr("sum(length(term))"),
        org.apache.spark.sql.functions.expr("sum(tf)")).head()
    assert(bPost == 24L * nPost + agg.getLong(0) + 8L * agg.getLong(1),
      "postings width model diverged from the documented decomposition")
    // drift detection: an unlisted column must fail with the
    // actionable message, not price silently
    val tmp = tmpDir("s53-drift")
    spark.read.parquet(s"$textDir/docs")
      .withColumn("surprise", org.apache.spark.sql.functions.lit(1L))
      .write.mode("overwrite").parquet(tmp)
    val e = intercept[IllegalStateException] {
      ops.ServingWidths.measure(spark, "text/docs", tmp)
    }
    assert(e.getMessage.contains("surprise") &&
      e.getMessage.contains("schema drift"))
  }
}
