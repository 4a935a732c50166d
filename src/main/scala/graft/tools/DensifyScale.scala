package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the dense-id assignment two ways at increasing vertex
  * counts — the number behind the r18 q192-weak fix:
  *
  *   window  — `row_number().over(Window.orderBy(id)) - 1`: the naive
  *             form; Exchange SinglePartition, the whole vertex set
  *             sorts through ONE task.
  *   densify — [[graft.functions.GraphFunctions.densifyIds]]: range
  *             partition + per-partition zipWithIndex offsets.
  *
  * Both produce the identical bijection (asserted per size). Wall-clock
  * is the story: the window form's cost is single-core sort of N, the
  * distributed form's is a range shuffle across all cores — the gap
  * widens with N and with core count, and at 10⁹ vertices the window
  * form is the stage that never finishes.
  *
  * Usage: sbt "runMain graft.tools.DensifyScale [maxExp]"
  * (sizes 10^5 … 10^maxExp, default 7). */
object DensifyScale {
  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    for (exp <- 5 to maxExp) {
      val n = math.pow(10, exp).toLong
      // scrambled, non-contiguous ids (multiplicative hop mod a prime)
      val ids = spark.range(n)
        .select((col("id") * 2654435761L % 4294967291L).as("ext_id"))
        .localCheckpoint(true)
      val (tw, cw) = time {
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("ext_id"))
        ids.select(col("ext_id"), (row_number().over(w) - 1).cast("long").as("vid"))
          .filter(col("vid") % 1000000 === 0).count()
      }
      val (td, cd) = time {
        graft.functions.GraphFunctions.densifyIds(ids, "ext_id")
          .filter(col("vid") % 1000000 === 0).count()
      }
      require(cw == cd, s"bijections disagree at n=$n: $cw vs $cd")
      println(f"[densify-scale] n=$n%,d  window=$tw%.2f s  densify=$td%.2f s  speedup=${tw / td}%.1fx")
    }
    spark.stop()
  }
}
