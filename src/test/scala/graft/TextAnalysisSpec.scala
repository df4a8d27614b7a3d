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

  test("t18: bigram surprisal matches an independent lead-window " +
      "formulation and is non-negative") {
    import org.apache.spark.sql.expressions.Window
    val t18 = ops.TextAnalysis.queries("t18_bigram_surprisal")(spark, sfSmoke)
    // Independent formulation: bigrams via posexplode + lead() over the
    // doc's position order instead of the positional array transform.
    val toks = Tables.load(spark, sfSmoke, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bg = toks.withColumn("nxt", lead(col("w"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("nxt")).as("bg"))
    val tf = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
    val cnt2 = tf.groupBy("bg").agg(sum("tf").as("cnt2"))
    val cnt1 = cnt2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("cnt2").as("cnt1"))
    val model = cnt2.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(cnt1, "w1").select(col("bg"), col("cnt2"), col("cnt1"))
    val alt = tf.join(model, "bg")
      .withColumn("sc", expr(
        "cast(round(cast(tf as double) * ln(cast(cnt2 as double) / " +
          "cast(cnt1 as double)), 6) as decimal(14,6))"))
      .groupBy("doc_id").agg(sum("sc").as("s"), sum("tf").as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("round(-(cast(s as double)) / cast(n_bigrams as double), 6)")
          .as("surprisal"))
    assert(t18.exceptAll(alt).count() == 0 && alt.exceptAll(t18).count() == 0,
      "array-transform and lead-window bigram formulations diverged")
    assert(t18.filter(col("surprisal") < 0).count() == 0,
      "MLE conditional probabilities cannot exceed 1")
    // conditional entropy can only refine unigram entropy: corpus-wide,
    // mean bigram surprisal must not exceed mean unigram surprisal
    val uni = ops.TextAnalysis.queries("t16_unigram_surprisal")(spark, sfSmoke)
    val mUni = uni.agg(avg("surprisal")).collect()(0).getDouble(0)
    val mBi = t18.agg(avg("surprisal")).collect()(0).getDouble(0)
    assert(mBi < mUni,
      s"bigram surprisal $mBi should sit below unigram $mUni")
  }

  test("t19: closed-form zipf slope matches Spark's regr_slope within " +
      "float tolerance and is negative (frequency falls with rank)") {
    import org.apache.spark.sql.expressions.Window
    val t19 = ops.TextAnalysis.queries("t19_zipf_slope")(spark, sfSmoke)
      .cache()
    assert(t19.filter(col("zipf_slope") >= 0).count() == 0,
      "zipf slope must be negative on any frequency-ranked vocabulary")
    // the gated query uses decimal-exact normal equations (engine
    // parity); regr_slope's running sums are the reference
    // implementation — they must agree to float tolerance
    val tf = Tables.load(spark, sfSmoke, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("term"))
    val ref = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 100)
      .groupBy("source")
      .agg(expr("regr_slope(ln(cast(freq as double)), " +
        "ln(cast(rank as double)))").as("ref_slope"))
    val joined = t19.join(ref, "source")
    assert(joined.count() == t19.count())
    assert(joined
      .filter(abs(col("zipf_slope") - col("ref_slope")) > 1e-4)
      .count() == 0, "closed form diverged from regr_slope")
    t19.unpersist()
  }

  test("t12 winnowing: fingerprint counts bounded by shingle windows, " +
      "and a hand-winnowed doc agrees") {
    import spark.implicits._
    val df = ops.TextAnalysis
      .queries("t12_winnowing_fingerprints")(spark, sfSmoke)
    // every doc with ≥4 shingles has ≥1 fingerprint and at most one
    // per window position
    assert(df.filter($"n_shingles" >= 4 &&
      ($"n_fp" < 1 || $"n_fp" > $"n_shingles" - 3)).count() == 0)
    // ground truth for doc 0 in plain Scala (same md5→7-hex→mod chain)
    val text = Tables.load(spark, sfSmoke, "documents")
      .filter($"doc_id" === 0).select($"text").as[String].head()
    val toks = text.split(" ", -1)
    val hs = (0 until toks.length - 2).map { i =>
      val sh = s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sh.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(b => f"$b%02x").mkString.take(7), 16)
    }
    val fps = hs.sliding(4).map(_.min).toSeq.distinct
    val r = df.filter($"doc_id" === 0)
      .select($"n_shingles", $"n_fp", $"fp_min", $"fp_sum").head()
    assert(r.getLong(0) == hs.length && r.getLong(1) == fps.length &&
      r.getLong(2) == fps.min && r.getLong(3) == fps.sum,
      s"engine $r vs scala (${hs.length}, ${fps.length}, ${fps.min}, " +
        s"${fps.sum})")
  }

  test("t12 winnowing guarantee: two texts sharing a >= 6-token run " +
      "share at least one fingerprint") {
    // The w+k-1 guarantee, proven through the same expression chain the
    // query uses, on constructed inputs (the fixture's near-dups are at
    // sf0.1, which the unit suite doesn't scan).
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"nine eight seven $shared six")).toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", expr(
        "transform(sequence(1, size(toks) - 2), i -> " +
          "cast(conv(substr(md5(concat_ws(' ', element_at(toks, i), " +
          "element_at(toks, i + 1), element_at(toks, i + 2))), 1, 7), " +
          "16, 10) as bigint))"))
      .withColumn("fps", array_distinct(expr(
        "transform(sequence(1, size(hs) - 3), " +
          "j -> array_min(slice(hs, j, 4)))")))
    val Seq(a, b) = df.select($"fps").as[Seq[Long]].collect().toSeq
    assert(a.toSet.intersect(b.toSet).nonEmpty,
      s"no shared fingerprint despite 6-token shared run: $a vs $b")
  }

  test("t20: redaction counts equal token-equality counts, the char " +
      "delta has its closed form, and the scrub is complete") {
    import spark.implicits._
    val t20 = ops.TextAnalysis.queries("t20_pii_redaction")(spark, sfSmoke)
      .cache()
    // fixture text is single-space token soup, so \b-regex hits must
    // equal exact-token matches counted independently via explode
    val terms = Set("customer", "order", "account")
    val ref = Tables.load(spark, sfSmoke, "documents")
      .select($"source", $"doc_id", explode(split($"text", " ")).as("tok"))
      .withColumn("hit", when($"tok".isin(terms.toSeq: _*), 1L)
        .otherwise(0L))
      .withColumn("dchar", when($"hit" === 1,
        lit(10) - length($"tok")).otherwise(0L))
      .groupBy($"source")
      .agg(sum($"hit").as("ref_hits"),
        countDistinct(when($"hit" === 1, $"doc_id")).as("ref_docs_hit"),
        sum($"dchar").as("ref_delta"))
    val j = t20.join(ref, "source")
    assert(j.count() == t20.count())
    assert(j.filter($"total_hits" =!= $"ref_hits").count() == 0)
    assert(j.filter($"docs_hit" =!= $"ref_docs_hit").count() == 0)
    assert(j.filter($"delta_chars" =!= $"ref_delta").count() == 0)
    assert(t20.agg(sum($"total_hits")).head.getLong(0) > 0,
      "denylist never fired — the gate is dead")
    // completeness: re-scanning the redacted text finds zero hits
    val residual = Tables.load(spark, sfSmoke, "documents")
      .select(regexp_replace($"text", ops.TextAnalysis.RedactPattern,
        "[REDACTED]").as("red"))
      .filter(size(regexp_extract_all($"red",
        lit(ops.TextAnalysis.RedactPattern), lit(0))) > 0)
    assert(residual.count() == 0, "redacted text still matches the pattern")
    t20.unpersist()
  }

  test("t21: per-source buckets are complete, near-equal-sized, and " +
      "mean surprisal is non-decreasing in the bucket index") {
    import spark.implicits._
    val t21 = ops.TextAnalysis.queries("t21_surprisal_buckets")(
      spark, sfSmoke).cache()
    assert(t21.filter($"bucket" < 1 || $"bucket" > 10).count() == 0)
    val perSrc = t21.groupBy($"source").agg(
      sum($"n_docs").as("n"), max($"n_docs").as("mx"),
      min($"n_docs").as("mn")).cache()
    val docCounts = Tables.load(spark, sfSmoke, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n_src"))
    assert(perSrc.join(docCounts, "source")
      .filter($"n" =!= $"n_src").count() == 0,
      "bucketed doc counts must partition each source")
    assert(perSrc.filter($"mx" - $"mn" > 1).count() == 0,
      "ntile buckets within a source must differ by at most one doc")
    // deciles ordered by surprisal ⇒ segment means are non-decreasing
    val rows = t21.orderBy($"source", $"bucket")
      .select($"source", $"avg_surprisal").collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val means = rs.map(_.getDouble(1))
      assert(means.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"bucket means not monotone for $src: ${means.mkString(",")}")
    }
    perSrc.unpersist(); t21.unpersist()
  }

  test("t23 merge fold: Spark HOF equals an independent Scala reference " +
      "of the double-pass rule (seeded fuzz incl. same-token chains)") {
    import spark.implicits._
    // Independent reference: the same documented semantics (space-wrap,
    // per-merge double replace, US joiner) via java.lang.String.replace
    // — a different kernel from both engines' SQL replace, so a
    // semantics drift in the HOF fold shows up here without DuckDB.
    def reference(text: String, merges: Seq[String]): Long = {
      var s = " " + text + " "
      for (m <- merges; _ <- 1 to 2)
        s = s.replace(" " + m + " ", " " + m.replace(' ', '\u001f') + " ")
      s.trim.split(" ", -1).length.toLong
    }
    val merges = Seq("a a", "b c", "c aa")
    val doubled = merges.flatMap(m => Seq(m, m))
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "aa", "d")
    val fuzz = (0 until 200).map { i =>
      (1 to 1 + rnd.nextInt(30))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
    }
    // the adversarial shapes the fuzz may miss: long same-token chains
    // (the alternation remainder), overlapping merge targets, the
    // empty-ish docs, a double space (empty token)
    val edges = Seq("a a a a a a a", "b c b c b c", "a a b c c aa",
      "a", "", "a  b", "c aa a a")
    val texts = fuzz ++ edges
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "s0", t) }
      .toDF("doc_id", "source", "text")
    val m = Seq(Tuple1(doubled)).toDF("ms")
    val got = ops.TextAnalysis.bpeTokenCountsOn(spark, d, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (ws, bpe) = got(i.toLong)
      assert(ws == t.split(" ", -1).length.toLong,
        s"doc $i ws-count: got $ws for '$t'")
      assert(bpe == reference(t, merges),
        s"doc $i: fold gives $bpe, reference ${reference(t, merges)} " +
          s"for '$t'")
    }
  }

  test("t29: alpha=1 reproduces the corpus exactly, weights normalize, " +
      "allocation conserves the budget to floor loss, and the dominant " +
      "language flattens as alpha drops") {
    val rows = ops.TextAnalysis.queries("t29_lang_mixture_curve")(
      spark, sfVerify).collect()
    val byAlpha = rows.groupBy(_.getAs[Double]("alpha"))
    assert(byAlpha.keySet == Set(1.0, 0.5, 0.25))
    val budget = byAlpha(1.0).map(_.getAs[Long]("lang_toks")).sum
    byAlpha.foreach { case (a, rs) =>
      val wsum = rs.map(_.getAs[Double]("weight")).sum
      assert(math.abs(wsum - 1.0) < 1e-4, s"weights at alpha=$a sum to $wsum")
      val alloc = rs.map(_.getAs[Long]("alloc_toks")).sum
      // each language's floor division loses < 1 token
      assert(alloc <= budget && alloc > budget - rs.length,
        s"allocation at alpha=$a lost more than floor slack")
    }
    byAlpha(1.0).foreach { r =>
      assert(r.getAs[Long]("alloc_toks") == r.getAs[Long]("lang_toks"))
      assert(r.getAs[Double]("upsample") == 1.0)
    }
    val top = byAlpha(1.0).maxBy(_.getAs[Double]("weight"))
      .getAs[String]("lang")
    def w(a: Double) = byAlpha(a)
      .find(_.getAs[String]("lang") == top).get.getAs[Double]("weight")
    assert(w(1.0) > w(0.5) && w(0.5) > w(0.25),
      "alpha-sampling must flatten the dominant language monotonically")
  }
}
