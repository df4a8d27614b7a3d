package graft

/** Regression guards for the plan properties SCALE.md claims — pushdown,
  * broadcast dimension joins, partial aggregation, shuffle-free
  * signature pipelines, and the custom top-k node. A future refactor
  * that silently degrades one of these shapes fails here, not at 100 TB.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfVerify)
      .queryExecution.executedPlan.toString

  test("q06: all predicates pushed into the parquet scan, columns pruned") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(1200))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      s"scan should not read unused columns: $readSchema")
  }

  test("q02: dimension joins broadcast; no sort-merge join") {
    val p = plan("q02_revenue_by_nation")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 3, p)
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 0, p)
  }

  test("q01: aggregation is partial before the exchange") {
    assert(plan("q01_pricing_summary").contains("partial_sum"))
  }

  test("d02: minhash signatures plan with NO hash shuffle (narrow map)") {
    val p = plan("d02_minhash_signatures")
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 0,
      s"signature pipeline must not shuffle:\n${p.take(2000)}")
  }

  test("s01: custom TopKPerKey node is in the plan; no window sort of " +
      "the candidate set") {
    val p = plan("s01_cosine_topk")
    assert(p.contains("TopKPerKey"), p.take(1500))
  }

  test("q03: top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q03_top_orders").contains("TakeOrderedAndProject"))
  }

  test("d07: no Filter or scan re-evaluates the simhash pipeline " +
      "(isnotnull-inference inlining regression)") {
    // A nullable simhash column once let constraint inference push
    // isnotnull(simhash64(<entire shingle+md5 pipeline>)) into the scan
    // as an interpreted per-row DataFilter — 6× slower. The coalesce in
    // simhashCore starves that inference; guard it.
    val p = plan("d07_simhash_near_dups")
    // " Filter " catches plain, codegen'd ("*(2) Filter") and
    // join-branch-nested renderings; Project lines don't contain it,
    // and "PushedFilters:"/"DataFilters:" are caught by the FileScan arm
    val bad = p.linesIterator.filter(l =>
      (l.contains(" Filter ") || l.contains("FileScan")) &&
        l.contains("simhash64"))
    assert(bad.isEmpty,
      s"simhash pipeline inlined into a Filter/scan:\n${bad.mkString("\n")}")
  }

  test("q27: correlated scalar subquery decorrelates to a broadcast " +
      "agg join, not per-row subquery execution") {
    val p = plan("q27_correlated_subquery")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("Subquery"),
      s"subquery must be decorrelated:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q28: LATERAL top-N decorrelates to a ranked window, not a " +
      "nested loop per outer row") {
    val p = plan("q28_lateral_topn")
    assert(p.contains("row_number()"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"lateral must not nested-loop:\n${p.take(1500)}")
  }

  test("s08: the metadata predicate pushes into the embeddings scan " +
      "(filtered search prunes before any distance is computed)") {
    val p = plan("s08_filtered_search")
    assert(p.contains("In(label"),
      s"label filter must reach PushedFilters:\n${p.take(1500)}")
  }

  test("t10: cheap bounds precede the DP, and pair enumeration is " +
      "segment-keyed — never a brand-triangle (predicate-order + " +
      "Σ(block²) regressions)") {
    // Two past regressions guarded at once: (1) a pushed .filter once
    // PREPENDED the levenshtein to the conjunct chain, running the DP
    // before the guards; (2) for 9 rounds enumeration was the
    // within-brand triangle (Σ(block²) at fixed brand cardinality).
    // Now: vocab-collapse + PassJoin segment equi-join.
    val p = plan("t10_levenshtein_pairs")
    val cond = p.linesIterator.find(l =>
      l.contains("abs_diff_sum") && l.contains("levenshtein")).getOrElse(
      fail("no conjunct chain with both bounds and the DP in t10 plan"))
    val bag = cond.indexOf("abs_diff_sum")
    val dp = cond.indexOf("levenshtein")
    assert(bag >= 0 && dp >= 0 && bag < dp,
      s"bag filter must precede the DP: $cond")
    // the candidate join keys on the segment signature (pl, i, sg) —
    // a join keyed only on brand would be the triangle come back
    val segJoin = p.linesIterator.filter(_.contains("HashJoin"))
      .exists(l => l.contains("sg"))
    assert(segJoin, s"candidate join must key on the segment " +
      s"signature:\n${p.take(3000)}")
    assert(!p.linesIterator.exists(l =>
      l.contains("HashJoin [brand") && l.contains("[brand_b")),
      "brand-only pair join must not return")
  }

  test("p01: pipeline stages fuse — pruned scan, partial aggregation, " +
      "no sort-merge join") {
    val p = plan("p01_curation_pipeline")
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang"),
      s"pipeline reads only doc_id/source/text: $readSchema")
    assert(p.contains("partial_"), "dedup agg must be map-side partial")
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 0,
      "summary join over two tiny aggregates must not sort-merge")
  }

  test("s03: no shuffle PARTITIONS BY a 64-dim vector (the r1 distinct " +
      "put both arrays in the dedup key)") {
    // r1 shipped distinct() over (q_id, n_id, qv, v) — ~1 KB of doubles
    // per candidate pair hashed and shuffled as part of the key. The
    // corpus-side id-join legitimately carries v THROUGH an exchange;
    // what must never return is an array inside the partitioning
    // expressions. (Checked on the plan tree — Exchange's toString
    // doesn't render key types, so a string grep can't see this.)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.ArrayType
    val exec = SparkEntry.queries("s03_lsh_ann_topk")(spark, sfVerify)
      .queryExecution.executedPlan
    val bad = exec.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning match {
        case h: HashPartitioning =>
          h.expressions.filter(_.dataType.isInstanceOf[ArrayType])
        case _ => Nil
      }
    }.flatten
    assert(bad.isEmpty,
      s"array-typed shuffle partitioning keys: ${bad.mkString(", ")}")
  }

  test("s07: quantization is scan-fused — zero hash shuffles, only the " +
      "presentation range sort") {
    val p = plan("s07_int8_quant")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      == 0, s"quantization must not shuffle:\n${p.take(2000)}")
  }

  test("t11: top-token agg is partial before its exchange and the " +
      "2-gram HOF stays out of the agg branch") {
    val p = plan("t11_repetition_scores")
    assert(p.contains("partial_count") || p.contains("partial_max"), p.take(1500))
    // the 2-gram transform is per-row presentation compute; if it ever
    // lands below the aggregate's exchange it runs per (doc, tok) pair
    val aggBranch = p.linesIterator
      .dropWhile(!_.contains("HashAggregate")).mkString("\n")
    assert(!aggBranch.contains("element_at"),
      "2-gram lambda leaked into the aggregation branch")
  }

  test("t12: winnowing is a narrow map — zero hash shuffles") {
    val p = plan("t12_winnowing_fingerprints")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      == 0, s"winnowing must not shuffle:\n${p.take(2000)}")
  }

  test("q31: date filter pushes into the orders scan; dims broadcast; " +
      "no cartesian from the two-condition supplier join") {
    val p = plan("q31_local_supply")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      p.take(1500))
    assert(p.linesIterator.exists(_.contains("BroadcastHashJoin")), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("d15: fingerprint subtree stays codegen — no interpreted HOF " +
      "lambda survives into the physical plan") {
    // Regression for the round-4 hang: d15 fans the fingerprint subtree
    // out to four consumers, and with the array-HOF formulation
    // projection collapse inlined toks→hs→fps into interpreted lambdas
    // (O(n³)-ish per doc, one scan task pinned for 5+ CPU-minutes at
    // sf0.1). The exploded form must keep the plan lambda-free.
    val p = plan("d15_winnowing_overlap")
    assert(!p.contains("lambdafunction"),
      s"d15 must not plan interpreted HOF lambdas:\n${p.take(2000)}")
  }

  test("q32: seven-table share query keeps every join hash-based " +
      "(dims broadcast; no sort-merge join at fixture scale)") {
    val p = plan("q32_market_share")
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 0, p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"nation (both roles) and region must broadcast:\n${p.take(2000)}")
  }

  test("q33: both nation roles broadcast pre-filtered to the trade " +
      "pair, the ship-date range reaches the lineitem scan") {
    val p = plan("q33_volume_shipping")
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 0, p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"both nation roles must broadcast:\n${p.take(2000)}")
    // the two-name IN prunes each side BEFORE the fact joins: the
    // broadcast build side must carry the name filter, not the final
    // inequality alone
    assert(p.contains("NATION_1"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"ship-date range must reach the scan:\n${p.take(2000)}")
  }

  test("d19: the bloom probe is a scan-side Filter fed by ONE scalar " +
      "subquery, planned before the exact verify join") {
    val p = plan("d19_bloom_decontamination")
    val probes = p.linesIterator.filter(l =>
      l.contains("Filter") && l.contains("might_contain")).toSeq
    assert(probes.nonEmpty,
      s"bloom probe must plan as a Filter:\n${p.take(2000)}")
    // constraint inference may copy the probe onto BOTH sides of the
    // verify equi-join (harmless — the eval side is the small one);
    // what matters is every probe site shares ONE subquery build
    val subqueryIds = probes
      .flatMap("subquery#\\d+".r.findFirstIn(_)).distinct
    assert(subqueryIds.size == 1,
      s"bloom must be built once, found $subqueryIds in:\n" +
        probes.mkString("\n"))
  }

  test("p07: sampling threshold joins back as a broadcast, and the " +
      "corpus-total side is a single broadcast row") {
    val p = plan("p07_source_mixture")
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 0, p)
    assert(p.linesIterator.exists(_.contains("BroadcastHashJoin")), p)
  }

  test("s10: each fusion side is a distributed top-N " +
      "(TakeOrderedAndProject), and no window ranks an unbounded set") {
    // Round-4 scale bug: both RRF sides were ranked by row_number over
    // Window.orderBy with NO partitioning — the cosine side sorted the
    // ENTIRE embeddings table through one task. The fixed shape bounds
    // each side to RetrN rows first (per-partition bounded heaps via
    // TakeOrderedAndProject) and only ranks the bounded result.
    val p = plan("s10_hybrid_rrf")
    assert(p.linesIterator.count(_.contains("TakeOrderedAndProject")) >= 2,
      s"both sides must cut to top-N distributively:\n${p.take(2000)}")
  }

  test("board-wide: no batch query plans a partition-less WindowExec " +
      "(the 'No Partition Defined' single-task sort class)") {
    // The guardrail the round-4 verdict asked for: WindowExec with an
    // empty partitionSpec serializes its whole input through one task —
    // exactly the warning the bench tail surfaced for s10. Sweep every
    // batch query's physical plan (planning only, nothing executes;
    // AQE off so the plain plan is inspectable) and fail on any
    // unpartitioned window whose input is not provably bounded by a
    // preceding limit (GlobalLimit/TakeOrderedAndProject feeds a
    // bounded row count, which a single task handles at any corpus
    // scale — that is TakeOrderedAndProject's own execution shape).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.SparkPlan
    def boundedInput(w: WindowExec): Boolean = {
      def bounded(p: SparkPlan): Boolean = p match {
        case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
        case other if other.children.size == 1 => bounded(other.children.head)
        case _ => false
      }
      bounded(w.child)
    }
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => streamingGated(n) }
        .flatMap { case (name, fn) =>
          fn(spark, sfSmoke).queryExecution.executedPlan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty && !boundedInput(w) =>
              s"$name: ${w.windowExpression.mkString(",").take(120)}"
          }
        }
      assert(offenders.isEmpty,
        s"unpartitioned unbounded windows:\n${offenders.mkString("\n")}")
    }
  }

  test("board-wide: no batch query plans a CartesianProduct (the " +
      "O(n·m) non-equi-join scale-killer class)") {
    // Companion sweep to the WindowExec guard: a CartesianProduct node
    // means some join lost its equi-keys (or a broadcast hint) and
    // would multiply two distributed relations row-by-row.
    // BroadcastNestedLoopJoin is deliberately NOT banned — the board's
    // non-equi joins all ride a broadcast of a provably tiny side
    // (query sets, one-row horizon cutoffs, centroid tables), which is
    // the correct plan for them at any corpus scale.
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => streamingGated(n) }
        .filter { case (name, fn) =>
          fn(spark, sfSmoke).queryExecution.executedPlan.toString
            .contains("CartesianProduct")
        }.map(_._1)
      assert(offenders.isEmpty,
        s"queries planning a cartesian product: $offenders")
    }
  }

  test("scan-multiplicity guard: the de-amplified queries keep their " +
      "bounded real-scan counts in the EXECUTED adaptive plan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // counts REAL FileSourceScan nodes: descends into query stages,
    // skips ReusedExchange stubs (a reused stage reads nothing), and
    // includes subquery plans. A checkpointed frame contributes its
    // one materialization scan via the checkpoint job, not this plan —
    // the bound asserts what the recurring per-query execution reads.
    def realScans(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => realScans(a.executedPlan)
      case q: QueryStageExec => realScans(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case f: FileSourceScanExec =>
        Seq(f.relation.location.rootPaths.mkString.split("/").last)
      case other => other.children.flatMap(realScans) ++
        other.subqueries.flatMap(realScans)
    }
    // name -> (table, max real scans). Bounds are the post-fix counts
    // (SCALE.md scan-multiplicity pass); a regression to per-consumer
    // re-execution fails here, not at 100 TB.
    val bounds = Seq(
      ("t16_unigram_surprisal", "documents.parquet", 1),
      ("t18_bigram_surprisal", "documents.parquet", 1),
      ("t21_surprisal_buckets", "documents.parquet", 2), // + source join
      ("e13_funnel_steps", "events.parquet", 1),
      // e40's 3-axis skew card fans out per-row (explode), not by
      // self-union: one narrow scan feeds all three key histograms
      ("e40_skew_salt_decision", "events.parquet", 1),
      // e41's two-phase prefix max is the classic 2-pass scan: one
      // narrow pass for bucket maxima, one for the joined main pass
      ("e41_watermark_delay_curve", "events.parquet", 2),
      // p24's trigger sweep fans out per-row: one narrow scan feeds
      // all three file inventories
      ("p24_ingest_file_curve", "events.parquet", 1),
      // tokenFrame rows: one media-side scan + one text-side scan of
      // documents; the patch sweep (m13) must NOT add a third — it
      // fans out per-row inside the shared helper
      ("m12_interleaved_pack", "documents.parquet", 2),
      ("m13_patch_budget_curve", "documents.parquet", 2),
      ("s03_lsh_ann_topk", "embeddings.parquet", 4), // 2 pruned q-side
      ("d05_ngram_jaccard_top_pairs", "documents.parquet", 1),
      // d12 deliberately re-reads instead of materializing the
      // corpus-sized shingle stream (checkpoint blocks evicted under
      // full-board pressure — the measured r10 4x regression): one
      // source-pruned eval leg + one train leg
      ("d12_decontamination", "documents.parquet", 2),
      ("d15_winnowing_overlap", "documents.parquet", 1),
      ("d17_incremental_near_dedup", "documents.parquet", 1),
      ("d19_bloom_decontamination", "documents.parquet", 1),
      ("d21_lsh_recall_audit", "documents.parquet", 1),
      ("p07_source_mixture", "documents.parquet", 1),
      // Composed IVF-PQ family: each query BUILDS the index (train +
      // assign + encode) and searches it in one plan, so the corpus
      // legitimately feeds several distinct pipelines (coarse
      // assignment, code encode, query side, recall baselines). The
      // bounds pin that amplification stays at these ceilings; the
      // expensive trained subtrees are deduplicated by AQE stage reuse
      // (ReusedExchange — excluded from this count), and explicit
      // materialization was MEASURED SLOWER end-to-end (SCALE.md round
      // 9: checkpoint 1.9x, persist 1.6x the plain plan on the family)
      // because it severs that reuse. At 100 TB the build half runs
      // once and its artifacts (af, enc, cb) are WRITTEN tables — the
      // recurring search scans artifacts, not the corpus; the one-plan
      // form is the honest build+search benchmark.
      // (ceilings tightened round 10: the bounded TrainN sample is
      // materialized once per train call — lazy localCheckpoint — so
      // the seeds/sampSubs branches no longer build differently-pruned
      // copies of the upstream subtree)
      ("s19_ivfpq_topk", "embeddings.parquet", 4),
      ("s20_ivfpq_recall", "embeddings.parquet", 6),
      ("s23_ivfpq_residual_topk", "embeddings.parquet", 5),
      ("s24_ivfpq_residual_recall", "embeddings.parquet", 7))
    val offenders = bounds.flatMap { case (name, table, cap) =>
      val df = SparkEntry.queries(name)(spark, sfSmoke)
      df.collect()
      val n = realScans(df.queryExecution.executedPlan)
        .count(_ == table)
      if (n > cap) Some(s"$name: $n > $cap scans of $table") else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("q40: quarter filter reaches the orders scan; top-20 plans " +
      "TakeOrderedAndProject, not a global sort") {
    val p = plan("q40_returned_items")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date range must reach the orders scan:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q42: the brand IN-list (union of the disjunctive arms) pushes " +
      "to the part scan; the join stays hash-based") {
    val p = plan("q42_disjunctive_revenue")
    assert(p.contains("In(p_brand"),
      s"brand union must reach PushedFilters:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"disjunctive predicate must ride the equi-join residual:\n" +
        p.take(2000))
  }

  test("s13/s14: the n·k argmax reduces map-side — partial max before " +
      "the exchange, and no Window over the candidate stream") {
    // The scale claim: per-vector nearest-centroid selection is a
    // groupBy + max(struct) whose map-side partials reduce each
    // vector's k candidates in task, so the exchange carries one row
    // per vector. A window formulation (row_number over vec_id) would
    // shuffle the full n·k stream — if a refactor reintroduces it,
    // these plans grow a Window node and lose the partial_max.
    for (name <- Seq("s13_ivf_refine", "s14_kmeans_train",
        "s16_pq_train")) {
      val p = plan(name)
      assert(p.contains("partial_max"),
        s"$name: argmax must aggregate partially before the exchange:\n" +
          p.take(2000))
      assert(!p.contains("Window"),
        s"$name: candidate argmax must not plan a Window:\n${p.take(2000)}")
    }
  }

  test("s17: the per-candidate ADC sum partial-aggregates in task, " +
      "below its (q_id, vec_id) exchange") {
    // The scale claim at Similarity.pqAdcTopKCore (join+sum form — the
    // r16 A/B keeps it for bounded-candidate searches, see the
    // ADC-forms note in Similarity): codes of one vector are co-located
    // by the assignment join, so the cross-subspace ADC sum reduces
    // map-side and the exchange carries one skinny row per (query,
    // candidate), never the candidate×PqM code stream. In the tree
    // print the parent exchange sits ABOVE its partial child, so the
    // pin is: a partial_sum exists, and the (q_id, vec_id) exchange
    // appears above it.
    val p = plan("s17_pq_adc_topk")
    val ls = p.linesIterator.toSeq
    val partialAt = ls.indexWhere(_.contains("partial_sum"))
    assert(partialAt >= 0,
      s"ADC sum must plan a map-side partial:\n${p.take(2000)}")
    assert(ls.take(partialAt).exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("q_id") &&
          l.contains("vec_id")),
      "the (q_id, vec_id) exchange must be the partial agg's parent:\n" +
        ls.slice(math.max(0, partialAt - 6), partialAt + 1).mkString("\n"))
    // the per-(vector, subspace) code argmax reduces map-side too
    // (prints as SortAggregate — struct buffers are sort-aggregated)
    assert(p.contains("partial_max"),
      s"code assignment argmax must be map-side partial:\n${p.take(2000)}")
  }

  test("s19/s23: both IVF-PQ variants compose the pinned shapes — " +
      "map-side argmax for the assignments, in-task ADC partial sum, " +
      "bounded-heap top-k") {
    for (name <- Seq("s19_ivfpq_topk", "s23_ivfpq_residual_topk")) {
      val p = plan(name)
      assert(p.contains("partial_max"),
        s"$name: cell/code assignments must argmax map-side:\n${p.take(2000)}")
      assert(p.contains("partial_sum"),
        s"$name: ADC sum must plan a map-side partial:\n${p.take(2000)}")
      assert(p.contains("TopKPerKey"),
        s"$name: final cut must be the bounded-heap node:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"),
        s"$name: probe/candidate joins must stay equi- or " +
          s"broadcast-joins:\n${p.take(2000)}")
    }
  }

  test("d33: the large-batch admission search keeps the lookup-form " +
      "ADC — a pure element_at projection, no per-candidate sum") {
    // The other side of the r16 A/B split: a corpus-fraction batch
    // amortizes the one-per-vector code pivot across many queries per
    // candidate, and the join+sum aggregation (candidate×PqM rows,
    // avgHashProbe ≈ 240 measured) is the hot spot — the lookup form
    // won 4.43→3.81 s. Pinned: element_at lookups present, and no
    // partial_sum keyed on the candidate stream (the assignment argmax
    // and other partials are fine — the pin is the ABSENCE of a
    // (q_id, n_id)-keyed sum, approximated as: no partial_sum(qd2)).
    // At the fixture SF the batch is small enough to fall under the
    // literal budgets, so the large branch is forced via the confs the
    // production switch reads — the pinned shape is the one d33 takes
    // at real scale.
    withConfs("spark.graft.ann.probe.literalBudget" -> "1",
        "spark.graft.ann.refine.literalBudget" -> "1") {
      val p = plan("d33_semantic_admission_serving")
      assert(p.contains("element_at"),
        s"large-batch ADC must be the lookup projection:\n${p.take(2000)}")
      assert(!p.contains("partial_sum(qd2"),
        "large-batch ADC must not re-grow the per-candidate qd2 sum:\n" +
          p.take(2000))
    }
  }

  test("d22: no corpus-stream shuffle below the broadcast eval-set " +
      "join (the first shuffle carries only matched positions)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // The scale property: the corpus-side token stream (posexplode of
    // every document) must reach the broadcast contamination join as a
    // narrow map — its first Exchange happens only AFTER the join cut
    // the stream to |hits|. An Exchange whose subtree scans documents
    // WITHOUT the eval-set pushed filter and WITHOUT a broadcast join
    // beneath it would be shuffling the full corpus stream.
    def walk(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk)
    }) :+ p
    def offends(e: SparkPlan): Boolean = {
      val sub = walk(e)
      val corpusScan = sub.exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.mkString.contains("documents") &&
            !f.metadata.getOrElse("PushedFilters", "").contains("src0")
        case _ => false
      }
      val hasBhj = sub.exists(_.isInstanceOf[BroadcastHashJoinExec])
      corpusScan && !hasBhj
    }
    val df = SparkEntry.queries("d22_contamination_spans")(spark, sfSmoke)
    df.collect()
    val bad = walk(df.queryExecution.executedPlan)
      .filter(_.isInstanceOf[ShuffleExchangeLike])
      .filter(e => offends(e))
    assert(bad.isEmpty,
      s"corpus stream shuffled before the eval-set join:\n" +
        bad.map(_.nodeName).mkString(", "))
  }

  test("s09: the query-term filter runs before the wordcount exchange " +
      "(postings only, never the full token stream)") {
    val p = plan("s09_bm25_topk")
    val lines = p.linesIterator.toVector
    val filterIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("spark"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(filterIdx >= 0, s"term filter missing:\n${p.take(2000)}")
    assert(exchangeIdx >= 0, s"wordcount exchange missing:\n${p.take(2000)}")
    // executedPlan prints top-down: the filter must sit BELOW (later
    // line than) the first aggregation exchange, i.e. on the scan side.
    assert(filterIdx > exchangeIdx, p.take(2000))
  }

  test("serving rows (s32/s33/s34/d30): the driver-gated plans answer " +
      "from written index artifacts — zero corpus scans (d30's batch " +
      "input legs excepted), every artifact scan pruned") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    def run(name: String): Seq[FileSourceScanExec] = {
      val df = SparkEntry.queries(name)(spark, sfSmoke)
      df.collect()
      scans(df.queryExecution.executedPlan)
    }
    // the pure-serving rows materialize their bounded query inputs to
    // literals, so ANY corpus byte in the gated plan would be the
    // index's fault (the AnnIndexSpec/TextIndexSpec discipline, now
    // asserted on the exact plans the driver hashes)
    // s33's final plan shows only the refine read: searchRefined
    // materializes its bounded ADC candidate set (localCheckpoint —
    // one evaluation feeds the IN-literal resolve AND the rerank
    // join), which severs the coarse/ADC stages from this plan. Their
    // shape (invlists partition-pruned, zero corpus scans) is pinned
    // by AnnIndexSpec on AnnIndex.search — the exact code path the
    // candidate stage runs.
    for ((name, artifacts) <- Seq(
        "s32_bm25_index_serving" -> Seq("postings"),
        "s33_ann_index_serving" -> Seq("vectors"),
        "s34_hybrid_index_serving" -> Seq("postings", "invlists"),
        // s36's pruned-postings frame is checkpointed (every phrase
        // slot forks from it), severing the postings scan like s33 —
        // only the zero-corpus property is assertable here
        "s36_phrase_index_serving" -> Seq.empty[String],
        "s37_batch_index_serving" -> Seq("postings"))) {
      val paths = run(name).map(_.relation.location.rootPaths.mkString)
      assert(!paths.exists(p =>
          p.contains("documents") || p.contains("embeddings")),
        s"$name must scan no corpus bytes: $paths")
      for (a <- artifacts)
        assert(paths.exists(_.contains(a)),
          s"$name must actually read the $a artifact: $paths")
    }
    // prune shapes: the refine read carries the bounded candidate
    // IN-filter into the vectors scan; s34's invlists read (which
    // runs AnnIndex.search un-severed) is cut at LISTING time
    val s34 = run("s34_hybrid_index_serving")
    val inv = s34.filter(_.relation.location.rootPaths.mkString
      .contains("invlists"))
    assert(inv.nonEmpty && inv.forall(_.partitionFilters.nonEmpty),
      s"s34: probed cells must be a partition filter: $inv")
    val vec = run("s33_ann_index_serving")
      .find(_.relation.location.rootPaths.mkString
      .contains("vectors"))
    assert(vec.isDefined &&
      vec.get.dataFilters.mkString.contains("vec_id"),
      s"s33: refine read must carry the candidate id filter: " +
        s"${vec.map(_.dataFilters)}")
    // s38's allowlist leg legitimately reads embeddings (the
    // allowlist IS an input); the index side must still prune
    val s38 = run("s38_filtered_index_serving")
    val inv38 = s38.filter(_.relation.location.rootPaths.mkString
      .contains("invlists"))
    assert(inv38.nonEmpty && inv38.forall(_.partitionFilters.nonEmpty),
      s"s38: probed cells must be a partition filter: $inv38")
    // e36: the 14-day range must prune the day-partitioned sketch
    // rollup at LISTING time (14 of 30 day partitions read); the
    // events scan is the gate's exact-count leg, a legitimate input
    val e36 = run("e36_sketch_rollup_serving")
    val roll = e36.filter(_.relation.location.rootPaths.mkString
      .contains("daily"))
    assert(roll.nonEmpty && roll.forall(_.partitionFilters.nonEmpty),
      s"e36: the date range must be a partition filter: $roll")
    assert(roll.map(_.selectedPartitions.partitionCount).max <= 14,
      s"e36: 14-day range must read at most 14 day partitions: " +
        s"${roll.map(_.selectedPartitions.partitionCount)}")

    // round-12 serving rows: s46 reads ONLY the maintenance index's
    // inverted lists (the delta membership is the id rule applied to
    // the artifact's own column — zero corpus bytes by construction);
    // s49 answers from the streamed-ingest index's pruned artifacts;
    // p22 audits the written pack files
    for ((name, artifacts) <- Seq(
        "s46_maintenance_decision" -> Seq("invlists"),
        "s49_ann_stream_ingest_serving" -> Seq("invlists", "codes"),
        // round-13 maintenance trio completion: the text/dedup compact
        // go/no-go rows read ONLY their index artifacts (the "docs"
        // artifact path is text-maint/idx/docs — distinct from the
        // "documents" corpus substring the no-corpus assertion bans)
        "s51_text_maintenance_decision" ->
          Seq("stats", "tombstones", "docs"),
        "d35_dedup_maintenance_decision" ->
          Seq("fps", "bands", "tombstones"),
        "p22_pack_balance_audit" -> Seq("pack-artifact"))) {
      val paths = run(name).map(_.relation.location.rootPaths.mkString)
      assert(!paths.exists(p =>
          p.contains("documents") || p.contains("embeddings")),
        s"$name must scan no corpus bytes: $paths")
      for (a <- artifacts)
        assert(paths.exists(_.contains(a)),
          s"$name must actually read the $a artifact: $paths")
    }
    // s47/s48 (the SQL-TVF twins) now plan as a DEFERRED ServingScan
    // leaf (round 13: EXPLAIN must run zero jobs, so the search plan
    // is built at execution — the d30 severed-plan precedent): their
    // outer plans contain the leaf and NO scans at all; what the
    // deferred search reads is pinned on the un-severed Scala twins
    // (s32/s33 above) plus GraftExtensionsSpec's schema/equality pins.
    for (name <- Seq("s47_sql_bm25_serving", "s48_sql_ann_serving",
        "s52_sql_phrase_serving")) {
      val df = SparkEntry.queries(name)(spark, sfSmoke)
      df.collect()
      def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case q: QueryStageExec => leaves(q.plan)
        case l if l.children.isEmpty => Seq(l)
        case other => other.children.flatMap(leaves)
      }
      val ls = leaves(df.queryExecution.executedPlan)
      assert(ls.exists(_.isInstanceOf[graft.plans.ServingScanExec]),
        s"$name must plan as the deferred ServingScan leaf: $ls")
      assert(scans(df.queryExecution.executedPlan).isEmpty,
        s"$name's outer plan must contain no eager scans " +
          s"(deferred execution)")
    }
    // s49's probe must prune the streamed-ingest index's cell
    // partitions at listing time, like s34/s38
    val s49 = run("s49_ann_stream_ingest_serving")
    val inv49 = s49.filter(_.relation.location.rootPaths.mkString
      .contains("invlists"))
    assert(inv49.nonEmpty && inv49.forall(_.partitionFilters.nonEmpty),
      s"s49: probed cells must be a partition filter: $inv49")

    // d30's board row checkpoints the bounded probe-decision frame
    // (two funnel consumers), which severs the artifact scans from
    // its final plan — so pin the prune shape on the probe itself,
    // against the SAME ServingIndexes artifact the board row reads
    // (its batch legs legitimately read documents: the batch IS the
    // query input)
    val probed = graft.ops.DedupIndex.probe(spark,
      graft.ops.ServingIndexes.dedup(spark, sfSmoke),
      Tables.load(spark, sfSmoke, "documents")
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 4)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
    probed.collect()
    val d30 = scans(probed.queryExecution.executedPlan)
    for (a <- Seq("fps", "bands")) {
      val sc = d30.filter(_.relation.location.rootPaths.mkString
        .contains(a))
      assert(sc.nonEmpty && sc.forall(_.partitionFilters.nonEmpty),
        s"d30: $a scan must carry a partition filter: $sc")
    }
  }
}
