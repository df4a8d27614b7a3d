package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Custom codegen'd Catalyst expressions (SURVEY.md §2.4 "custom
  * surface"): every one also registers as a SQL function so
  * `spark.sql(...)` users get the same fused kernels the DataFrame
  * operators use.
  */
package object functions {

  /** The one (name, implementing class, builder) table both
    * registration paths drive off: [[registerAll]] (attach to an
    * existing session) and [[graft.GraftExtensions]] (config-installed,
    * applies to every session built from the config).
    */
  private[graft] val sqlFunctions
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSim].getName,
      e => CosineSim(e(0), e(1))),
    ("hamming64", classOf[Hamming64].getName,
      e => Hamming64(e(0), e(1))),
    ("simhash64", classOf[SimHash64].getName,
      e => SimHash64(e(0), e(1))),
    ("dot_product", classOf[DotProduct].getName,
      e => DotProduct(e(0), e(1))),
    ("minhash_slot", classOf[MinHashSlot].getName,
      e => MinHashSlot(e(0), e(1), e(2), e(3))),
    ("abs_diff_sum", classOf[AbsDiffSum].getName,
      e => AbsDiffSum(e(0), e(1))),
    ("nfc_normalize", classOf[NfcNormalize].getName,
      e => NfcNormalize(e(0))),
    ("md5_prefix28", classOf[Md5Prefix28].getName,
      e => Md5Prefix28(e(0))),
    ("shingle3", classOf[Shingle3].getName,
      e => Shingle3(e(0))),
    ("shingle_simhash64", classOf[ShingleSimHash64].getName,
      e => ShingleSimHash64(e(0))),
    ("zorder64", classOf[ZOrder64].getName,
      e => ZOrder64(e(0), e(1))),
    ("hash_clf_score", classOf[HashClfScore].getName,
      e => HashClfScore(e(0))),
    // Spark's own bloom expressions, surfaced (they exist in the jars
    // but are absent from the public FunctionRegistry — see
    // BloomFilterFns)
    ("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      e => {
        requireArity("bloom_filter_agg", e, 3,
          "bloom_filter_agg(col, expectedItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(e(0), e(1), e(2))
      }),
    ("might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      e => {
        requireArity("might_contain", e, 2,
          "might_contain(bloomBinary, value)")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(e(0), e(1))
      }))

  /** The table-valued twins of [[sqlFunctions]] — the serving tier's
    * SQL entry points ([[graft.ops.SqlServing]]): one shared table, so
    * the config-installed path ([[graft.GraftExtensions]]) and
    * [[registerAll]] register the same builders and cannot drift.
    */
  private[graft] val sqlTableFunctions: Seq[(String, String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_bm25", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.bm25Plan(e)),
    ("graft_ann", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.annPlan(e)),
    ("graft_ann_adc", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.annAdcPlan(e)),
    ("graft_hybrid", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.hybridPlan(e)),
    ("graft_dedup_check", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.dedupCheckPlan(e)),
    ("graft_phrase", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.phrasePlan(e)),
    ("graft_skew", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.skewPlan(e)),
    ("graft_topk", "graft.ops.SqlServing",
      e => graft.ops.SqlServing.topkPlan(e)))

  /** A wrong-arity SQL call must fail as an analysis error naming the
    * expected signature, not an IndexOutOfBoundsException from e(n). */
  private[graft] def requireArity(name: String,
      e: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      n: Int, signature: String): Unit =
    if (e.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        // The error template renders docroot inside a doc URL
        // ("…refer to '<docroot>/sql-ref-functions.html'…"), so the
        // signature goes in functionName — docroot gets the real site.
        messageParameters = Map(
          "functionName" -> s"`$name` (expected: $signature)",
          "expectedNum" -> n.toString,
          "actualNum" -> e.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Register every graft SQL function (scalar + table-valued) on the
    * session, plus the flooded-window guard (the attach-path twin of
    * GraftExtensions' injectPreCBORule — same rule object, so the two
    * paths cannot drift; default mode `warn` is a pure log line). */
  def registerAll(spark: SparkSession): Unit = {
    sqlFunctions.foreach { case (name, _, _) => registerOne(spark, name) }
    sqlTableFunctions.foreach { case (name, _, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    graft.plans.WindowGuard.install(spark)
  }

  /** Register ONE function by its table name — the per-companion
    * `register` methods delegate here, so there is exactly one
    * (name, builder) pair per function in the codebase and a builder
    * fixed in the table can never diverge from what a spec registers.
    */
  private[functions] def registerOne(spark: SparkSession,
      name: String): Unit = {
    val (_, _, builder) = sqlFunctions.find(_._1 == name).getOrElse(
      throw new IllegalArgumentException(s"unknown graft function: $name"))
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
