package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary (round-6 postmortem, VERDICT.md item 4).
  *
  * The driver regenerated `/root/testdata` mid-round-6 and `events.ts`
  * changed encoding (TIMESTAMP(NANOS) → timestamp[us] no-tz, i.e.
  * TIMESTAMP_NTZ), which broke 9 queries scattered across the board with
  * errors that never named the real cause. This suite pins the contract
  * the board actually depends on, so the NEXT regeneration fails one
  * named assertion here instead.
  *
  * Contract pinned:
  *  - `Tables.load` must hand operators a true `TimestampType` for
  *    `events.ts` regardless of the on-disk encoding (`unix_micros` and
  *    `withWatermark` both reject NTZ).
  *  - Every table's loaded column names/types match FIXTURES.md §B.
  *    Timestamp-bearing columns may arrive as TIMESTAMP or TIMESTAMP_NTZ
  *    (both green against the DuckDB oracle for the relational board);
  *    anything else is drift.
  */
class FixtureCanarySpec extends SparkTestBase {

  private def loaded(name: String) =
    Tables.load(spark, sfSmoke, name).schema

  // (name -> expected type); AnyTimestamp means either TZ or NTZ is fine.
  private object AnyTimestamp extends DataType {
    def defaultSize = 8; def asNullable: DataType = this
  }

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> AnyTimestamp, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> AnyTimestamp),
    // ts is TimestampType EXACTLY: Tables.load normalizes it, and the
    // events board (unix_micros, withWatermark) cannot run on NTZ.
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def typeOk(actual: DataType, want: DataType): Boolean = want match {
    case AnyTimestamp => actual == TimestampType || actual == TimestampNTZType
    // containsNull may differ by writer; element type is the contract
    case ArrayType(el, _) => actual match {
      case ArrayType(ael, _) => ael == el
      case _ => false
    }
    case t => actual == t
  }

  for (t <- Tables.all) test(s"canary: $t loaded schema matches FIXTURES.md") {
    val schema = loaded(t)
    val want = expected(t)
    assert(schema.fieldNames.toSeq == want.map(_._1),
      s"column drift in $t fixture — regenerated with a new layout?")
    for (((name, wantType), field) <- want.zip(schema.fields))
      assert(typeOk(field.dataType, wantType),
        s"$t.$name drifted: expected $wantType, fixture now loads as " +
          s"${field.dataType} — update Tables.load normalization first")
  }

  test("canary: loadStream hands streaming gates a true TimestampType ts") {
    val schema = Tables.loadStream(spark, sfSmoke, "events").schema
    assert(schema("ts").dataType == TimestampType,
      "withWatermark requires TimestampType; loadStream must normalize " +
        "whatever encoding the regenerated fixture uses")
  }
}
