package graft

import org.apache.spark.sql.SparkSession

/** Custom codegen'd Catalyst expressions (SURVEY.md §2.4 "custom
  * surface"): every one also registers as a SQL function so
  * `spark.sql(...)` users get the same fused kernels the DataFrame
  * operators use.
  */
package object functions {
  /** Register every graft SQL function on the session. */
  def registerAll(spark: SparkSession): Unit = {
    CosineSim.register(spark)
    Hamming64.register(spark)
    SimHash64.register(spark)
    DotProduct.register(spark)
    MinHashSlot.register(spark)
    AbsDiffSum.register(spark)
    NfcNormalize.register(spark)
    ZOrder64.register(spark)
  }
}
