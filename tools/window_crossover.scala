// WindowExec-vs-closed-form crossover measurement - the per-class
// evidence the WindowGuard budget pricing assumes (r15 verdict item 7).
//
// For each rewrite class, times the SAME computation two ways over a
// synthetic single-group frame (the hazard class: a corpus-wide window
// serializes the group through ONE task):
//   (a) WindowExec with an unpartitioned window (guard off)
//   (b) the GlobalRank closed form the guard substitutes
// at growing row counts, noop-sink timed (guide 1.4), min-of-2.
//
// Usage (repo root, after sbt compile):
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/window_crossover.scala
// Pure ASCII.
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

spark.conf.set("spark.graft.window.guard", "off")

def timed(df: => DataFrame): Double = {
  val runs = (1 to 2).map { _ =>
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  runs.min
}

def frame(n: Long): DataFrame =
  spark.range(n).select(col("id"),
    (col("id") * 2654435761L % 1000003L).as("v"),
    (col("id") % 97L).as("g"))

val sizes = Seq(1000000L, 4000000L, 16000000L)
val w = Window.orderBy(col("v"), col("id"))

for (n <- sizes) {
  val f = frame(n).localCheckpoint()  // isolate input cost from both arms
  val rowsK = n / 1000
  // class 1: global rank/row_number
  val tw1 = timed(f.withColumn("r", row_number().over(w)))
  val tc1 = timed(graft.plans.GlobalRank(f, Seq(col("v"), col("id")), "r"))
  println(f"[crossover] rows=${rowsK}k rank: window=$tw1%.2f closed=$tc1%.2f")
  // class 2: global running sum
  val tw2 = timed(f.withColumn("rs",
    sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0))))
  val tc2 = timed(graft.plans.GlobalRank.groupedRunningSum(
    f, Seq.empty, Seq(col("v"), col("id")), col("v"), "rs"))
  println(f"[crossover] rows=${rowsK}k runsum: window=$tw2%.2f closed=$tc2%.2f")
  // class 3: global ntile(3)
  val tw3 = timed(f.withColumn("t", ntile(3).over(w)))
  val tc3 = timed(graft.plans.GlobalRank.groupedNtile(
    f, Seq.empty, Seq(col("v"), col("id")), 3, "t"))
  println(f"[crossover] rows=${rowsK}k ntile: window=$tw3%.2f closed=$tc3%.2f")
  // class 4: global shift (lag 1)
  val tw4 = timed(f.withColumn("p", lag(col("v"), 1).over(w)))
  val tc4 = timed(graft.plans.GlobalRank.groupedShift(
    f, Seq.empty, Seq(col("v"), col("id")), col("v"), 1,
    lit(null).cast("long"), "p"))
  println(f"[crossover] rows=${rowsK}k lag1: window=$tw4%.2f closed=$tc4%.2f")
  f.unpersist()
}
sys.exit(0)
