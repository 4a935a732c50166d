package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 experiment: what does ONE pageRank round actually cost at sf0.1,
  * and which piece (dangling broadcast, contribution join, vertex
  * re-attach, checkpoint materialization) owns it? Not part of the
  * library surface. */
object R19RoundExp {
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
      println(f"[roundexp] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val G = graft.functions.GraphFunctions
    val docs = graft.catalog.Tables.documents(spark, d).select(col("doc_id"))
    val n = docs.count()
    println(s"[roundexp] n=$n")
    val vmap = G.densifyIds(docs, "doc_id", "vid").localCheckpoint(true)
    val cand = array(
      pmod(col("vid") * 31 + 7, lit(n)),
      pmod(col("vid") * 17 + 3, lit(n)),
      pmod(col("vid") * 13 + 11, lit(n)))
    val k = when(pmod(col("vid"), lit(7)) === 0, lit(0))
      .otherwise((pmod(col("vid"), lit(3)) + 1).cast("int"))
    val e = vmap.select(col("vid"), explode(slice(cand, lit(1), k)).as("dvid"))
      .filter(col("vid") =!= col("dvid"))
      .join(vmap.select(col("vid"), col("doc_id").as("src")), "vid")
      .join(vmap.select(col("vid").as("dvid"), col("doc_id").as("dst")), "dvid")
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .localCheckpoint(true)
    println(s"[roundexp] edges=${e.count()}, e partitions=${e.rdd.getNumPartitions}")
    val v = docs.select(col("doc_id").cast("long").as("id")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val weighted = e.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint(true)
    val vd = v.join(deg.select(col("src").as("id"), lit(true).as("__out")), Seq("id"), "left")
      .select(col("id"), col("__out").isNull.as("__dang"))
      .localCheckpoint(true)
    println(s"[roundexp] weighted partitions=${weighted.rdd.getNumPartitions}, vd partitions=${vd.rdd.getNumPartitions}")
    var ranks = vd.select(col("id"), lit(1.0 / n).as("rank"), col("__dang"))
      .localCheckpoint(true)
    val damping = 0.85

    for (rep <- 1 to 3) {
      println(s"== rep $rep")
      // (a) dangling scan alone, as driver scalar
      val dang = time("a dangling head()")(
        ranks.filter(col("__dang")).agg(coalesce(sum(col("rank")), lit(0.0)))
          .head().getDouble(0))
      // (b) contribution join + agg alone (count, no checkpoint)
      time("b contrib count") {
        weighted.join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") * col("w")).as("in_rank")).count()
      }
      // (c) full round WITHOUT broadcast-dangling (lit) + checkpoint
      time("c round lit-dang ckpt") {
        val contrib = weighted
          .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") * col("w")).as("in_rank"))
        vd.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit((1.0 - damping) / n) + lit(damping)
              * (coalesce(col("in_rank"), lit(0.0)) + lit(dang) / lit(n.toDouble)))
              .as("rank"),
            col("__dang"))
          .localCheckpoint(true)
      }
      // (d) full round WITH broadcast-dangling + checkpoint (shipped form)
      time("d round bcast-dang ckpt") {
        val dangling = ranks.filter(col("__dang"))
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("dang"))
        val contrib = weighted
          .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") * col("w")).as("in_rank"))
        vd.join(contrib, Seq("id"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("id"),
            (lit((1.0 - damping) / n) + lit(damping)
              * (coalesce(col("in_rank"), lit(0.0)) + col("dang") / lit(n.toDouble)))
              .as("rank"),
            col("__dang"))
          .localCheckpoint(true)
      }
      // (e) same as (d) but materialize with noop instead of checkpoint
      time("e round bcast-dang noop") {
        val dangling = ranks.filter(col("__dang"))
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("dang"))
        val contrib = weighted
          .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("rank") * col("w")).as("in_rank"))
        vd.join(contrib, Seq("id"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("id"),
            (lit((1.0 - damping) / n) + lit(damping)
              * (coalesce(col("in_rank"), lit(0.0)) + col("dang") / lit(n.toDouble)))
              .as("rank"),
            col("__dang"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
