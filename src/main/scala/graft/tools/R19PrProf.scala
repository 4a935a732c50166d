package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 phase profiler for the pageRank family (q192/q199/q205): times the
  * edge build, the operator's setup jobs and each power round separately,
  * so the optimization targets the phase that actually costs. Not part of
  * the library surface. */
object R19PrProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val G = graft.functions.GraphFunctions
    // warm the session + parquet listing
    val docsW = graft.catalog.Tables.documents(spark, d).select(col("doc_id"))
    docsW.count()

    for (rep <- 1 to 2) {
      println(s"== rep $rep")
      val docs = graft.catalog.Tables.documents(spark, d).select(col("doc_id"))
      val n = time("docs.count")(docs.count())
      val vmap = time("densifyIds+ckpt")(
        G.densifyIds(docs.select(col("doc_id")), "doc_id", "vid")
          .localCheckpoint(true))
      val cand = array(
        pmod(col("vid") * 31 + 7, lit(n)),
        pmod(col("vid") * 17 + 3, lit(n)),
        pmod(col("vid") * 13 + 11, lit(n)))
      val k = when(pmod(col("vid"), lit(7)) === 0, lit(0))
        .otherwise((pmod(col("vid"), lit(3)) + 1).cast("int"))
      val edges = vmap.select(col("vid"), explode(slice(cand, lit(1), k)).as("dvid"))
        .filter(col("vid") =!= col("dvid"))
        .join(vmap.select(col("vid"), col("doc_id").as("src")), "vid")
        .join(vmap.select(col("vid").as("dvid"), col("doc_id").as("dst")), "dvid")
        .select(col("src"), col("dst"))
      // ---- pageRank internals, unrolled with timers (mirror of
      // GraphFunctions.pageRankWithRounds fixed-round path) ----
      val v = time("v ckpt")(docs.select(col("doc_id").cast("long").as("id"))
        .localCheckpoint(true))
      time("v.count")(v.count())
      val e = time("e ckpt (edge build)")(edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .localCheckpoint(true))
      time("ghost check") {
        val ghosts = e.select(col("src").as("id"))
          .unionByName(e.select(col("dst").as("id")))
          .join(v, Seq("id"), "left_anti")
          .limit(5).collect()
        require(ghosts.isEmpty)
      }
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val weighted = time("weighted ckpt")(e
        .join(deg, "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
        .localCheckpoint(true))
      val outdeg = time("outdeg ckpt")(deg.select(col("src").as("id")).localCheckpoint(true))
      var ranks = time("ranks0 ckpt")(
        v.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint(true))
      val damping = 0.85
      for (r <- 1 to 8) {
        ranks = time(s"round $r") {
          val dangling = ranks.join(outdeg, Seq("id"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dang"))
          val contrib = weighted
            .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("rank") * col("w")).as("in_rank"))
          v.join(contrib, Seq("id"), "left")
            .crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit((1.0 - damping) / n) + lit(damping)
                * (coalesce(col("in_rank"), lit(0.0)) + col("dang") / lit(n.toDouble)))
                .as("rank"))
            .localCheckpoint(true)
        }
      }
      time("final collect (orderBy+round)")(
        ranks.select(col("id"), round(col("rank") * 1000, 6).as("mrank"))
          .orderBy(col("id")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
