package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DedupFunctions => D, EntityResolution => ER}

/** Round-11 scale evidence (recorded in SCALE.md):
  *
  *  1. HOT-DIGEST substring dedup — a boilerplate block shared by 50% of
  *     documents, the skew regime the r10 `count-over-Window(g)` shape
  *     could not split. Decade steps must stay near-linear now that the
  *     counts are a partial-aggregating groupBy + skew-splittable join.
  *  2. UNIQUE-REGISTRY fuzzy join — Zipf(1)-word names (mostly unique,
  *     NOT the replica corpus): candidate volume and wall across decades
  *     for the composed q-gram + length-band blocking.
  *  3. PRODUCTION-L substring cut — `cutRepeatedSpans` at L = 50 tokens
  *     (the Lee et al. removal threshold) over long multi-doc texts with
  *     injected ≥ 50-token boilerplate; wall + shuffle bytes.
  *
  * Not part of the library surface.
  */
object R11Scale {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    def time(name: String, runs: Int = 3)(f: => Long): (Double, Long) = {
      val results = (1 to runs).map { _ =>
        shuffleBytes.set(0L)
        val t0 = System.nanoTime(); val n = f
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener-bus drain
        (wall, n, shuffleBytes.get())
      }
      val best = results.minBy(_._1)
      println(f"[r11] $name%-34s best=${best._1}%.2fs rows=${best._2} " +
        f"shuffleMB=${best._3 / 1e6}%.1f")
      (best._1, best._3)
    }

    // -------------------------------------------------- 1. hot digest
    if (mode == "all" || mode == "hot") {
      val base = spark.read.parquet(s"$d/documents.parquet")
      val boiler = (0 until 40).map(i => s"boil$i").mkString(" ")
      // NON-replica: every token carries a replica suffix, so replicas
      // share ZERO windows — the only corpus-wide repeats are the injected
      // boilerplate's windows, present verbatim in 50% of ALL documents
      // (the viral-digest regime the groupBy+join shape must survive)
      def hotCorpus(k: Int): DataFrame = {
        val dir = s"/tmp/graft-r11-hot-x$k"
        if (!new java.io.File(dir).exists())
          (0 until k).map(i => base
              .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10_000_000L))
              .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + s"r$i"))
              .withColumn("text",
                when(col("doc_id") % 2 === 0, concat(lit(boiler + " "), col("text")))
                  .otherwise(col("text"))))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      }
      for (k <- Seq(1, 10, 30)) {
        val docs = hotCorpus(k)
        time(s"hot_repeated_spans ${k}x") {
          D.repeatedSpans(docs, "text", "doc_id", L = 8).count()
        }
        // hot routing forced (plan-stats gate off, threshold 1k): the
        // boilerplate digests take the salted join — the 100 TB path,
        // measured against cold routing
        spark.conf.set("graft.substring.skewGateBytes", "0")
        time(s"hot_spans_salted ${k}x") {
          D.repeatedSpans(docs, "text", "doc_id", L = 8,
            hotThreshold = 1000L, salts = 16).count()
        }
        spark.conf.unset("graft.substring.skewGateBytes")
        // aggregate n_dropped (NOT count()): a bare count lets Catalyst
        // eliminate the unique-key join and the whole dropped-position
        // branch — the measurement would time an empty plan
        time(s"hot_cut_spans ${k}x") {
          D.cutRepeatedSpans(docs, "text", "doc_id", L = 8)
            .agg(sum(col("n_dropped"))).head().getLong(0)
        }
      }
    }

    // -------------------------------------------------- 2. unique fuzzy
    if (mode == "all" || mode == "fuzzy") {
      def registry(n: Int): DataFrame = {
        val dir = s"/tmp/graft-r11-reg-$n"
        if (!new java.io.File(dir).exists()) {
          val rnd = new scala.util.Random(42)
          def word(): String = {
            var k = math.exp(rnd.nextDouble() * math.log(1e6)).toLong
            val sb = new StringBuilder
            while (k > 0) { sb.append(('a' + (k % 26)).toInt.toChar); k /= 26 }
            sb.toString
          }
          (0 until n).map(i => (i.toLong, s"${word()} ${word()} ${word()}"))
            .toDF("id", "name").write.mode("overwrite").parquet(dir)
        }
        spark.read.parquet(dir)
      }
      for (n <- Seq(4000, 40000, 120000)) {
        val reg = registry(n)
        val cands = ER.fuzzyCandidates(reg, "name", "id", maxDist = 1, q = 3).count()
        println(s"[r11] fuzzy_candidates n=$n              cands=$cands")
        time(s"fuzzy_pairs n=$n") {
          ER.fuzzyPairs(reg, "name", "id", maxDist = 1, q = 3).count()
        }
      }
    }

    // -------------------------------------------------- 3. production-L cut
    if (mode == "all" || mode == "prodL") {
      val base = spark.read.parquet(s"$d/documents.parquet")
      val boiler = (0 until 60).map(i => s"lic$i").mkString(" ")
      def longCorpus(k: Int): DataFrame = {
        val dir = s"/tmp/graft-r11-long-x$k"
        if (!new java.io.File(dir).exists()) {
          // long documents: concat 4 DISTINCT docs' texts (~165 tokens),
          // tokens replica-suffixed so replicas share no windows, then a
          // 60-token license block injected into 30% — the ≥ 50-token
          // cross-document repeats Lee et al. remove
          val longDocs = (0 until k).map(i => base
              .select((col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
                regexp_replace(col("text"), "(\\S+)", "$1" + s"r$i").as("text"),
                lit(i.toLong).as("rep")))
            .reduce(_ unionByName _)
            .withColumn("grp",
              col("rep") * 2000 + floor((col("doc_id") % 10_000_000L) / lit(4)))
            .groupBy("grp")
            .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
            .select(col("grp").cast("long").as("doc_id"),
              when(col("grp") % 10 < 3, concat(col("text"), lit(" " + boiler)))
                .otherwise(col("text")).as("text"))
          longDocs.write.mode("overwrite").parquet(dir)
        }
        spark.read.parquet(dir)
      }
      for (k <- Seq(1, 10)) {
        val docs = longCorpus(k)
        time(s"cut_spans_L50 ${k}x", runs = 2) {
          D.cutRepeatedSpans(docs, "text", "doc_id", L = 50)
            .agg(sum(col("n_dropped"))).head().getLong(0)
        }
      }
    }

    spark.stop()
  }
}
