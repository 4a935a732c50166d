package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThanOrEqual}

class RemoteCatalogSourceSpec extends SparkSpec {

  private def scenes = Seq(
    RemoteCatalog.SceneRecord("S2A_T23LLF_1", "S2_MSI_L1C", 10.0, 1_700_000_000_000_000L, "s3://a/1"),
    RemoteCatalog.SceneRecord("S2A_T23LLF_2", "S2_MSI_L1C", 55.0, 1_700_100_000_000_000L, "s3://a/2"),
    RemoteCatalog.SceneRecord("LC08_223064_1", "LANDSAT_8", 5.0, 1_700_200_000_000_000L, "s3://a/3"))

  test("pushed filters reach the provider search; residual stays in Spark (S1)") {
    @volatile var received: Seq[org.apache.spark.sql.sources.Filter] = Nil
    RemoteCatalog.register("test-usgs", { filters =>
      received = filters
      // provider honors the cloud filter, ignores the rest (over-returning
      // is allowed — Spark re-applies)
      scenes.filter(_.cloud_cover <= 20.0)
    })
    val df = spark.read.format("remote_catalog").option("provider", "test-usgs").load()
      .filter(col("cloud_cover") <= 20 && col("dataset") === "S2_MSI_L1C"
        && length(col("link")) > 2) // length() is not a source Filter → residual
      .select("scene_id")
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == Seq("S2A_T23LLF_1"), "cloud>20 and non-S2 scenes must be filtered")
    assert(received.exists { case LessThanOrEqual("cloud_cover", v) => v == 20.0; case _ => false },
      s"cloud threshold must be pushed to the provider, got $received")
    assert(received.exists { case EqualTo("dataset", v) => v == "S2_MSI_L1C"; case _ => false },
      s"dataset equality must be pushed to the provider, got $received")
    // plan shows the pushdown; the scan only materializes the pruned column set
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("remote_catalog"), plan)
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(!scanLine.contains("sensing_date"),
      s"unused columns must be pruned out of the scan: $scanLine")
  }

  test("recorded-fixture HTTP provider: pushdown travels the wire as query params") {
    val server = new FixtureCatalogServer(scenes)
    try {
      RemoteCatalog.register("http-fixture",
        HttpCatalogProvider.searchFn(server.baseUrl))
      val df = spark.read.format("remote_catalog")
        .option("provider", "http-fixture").load()
        .filter(col("cloud_cover") <= 20 && col("dataset") === "S2_MSI_L1C")
        .select("scene_id", "cloud_cover")
      val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == Seq(("S2A_T23LLF_1", 10.0)))
      // the predicate must reach the WIRE, not just the plan: the replay
      // server records the query string it served
      val q = server.queries.headOption.getOrElse("")
      assert(q.contains("max_cloud=20") && q.contains("dataset=S2_MSI_L1C"),
        s"pushed filters must arrive as provider query params, got '$q'")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("remote_catalog"), plan)
    } finally server.stop()
  }

  test("token-auth provider: one login, Bearer on every wire call, pushdown intact (S1 credentials)") {
    val server = new FixtureCatalogServer(scenes, auth = Some(("alice", "s3cret")))
    try {
      val p = new TokenAuthProvider(server.baseUrl, "alice", "s3cret")
      RemoteCatalog.registerExact("auth-fixture", p.searchFnLimited, p.countFn,
        HttpCatalogProvider.exactShapes)
      val df = spark.read.format("remote_catalog")
        .option("provider", "auth-fixture").load()
        .filter(col("cloud_cover") <= 20 && col("dataset") === "S2_MSI_L1C")
        .select("scene_id", "cloud_cover")
      val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == Seq(("S2A_T23LLF_1", 10.0)))
      assert(server.logins == 1, "the session must log in exactly once")
      assert(server.unauthorized == 0, "no request may travel without a valid token")
      val q = server.queries.headOption.getOrElse("")
      assert(q.contains("max_cloud=20"), s"pushdown must survive the auth wrapper: '$q'")
      // COUNT(*) pushdown rides the same session token
      val n = spark.read.format("remote_catalog").option("provider", "auth-fixture")
        .load().filter(col("dataset") === "S2_MSI_L1C").count()
      assert(n == 2 && server.countQueries.nonEmpty, "count must travel authenticated")
    } finally server.stop()
  }

  test("token expiry: a 401 mid-session triggers ONE transparent re-login and the call succeeds") {
    // tokens die after 2 requests; 3 wire calls force exactly one refresh
    val server = new FixtureCatalogServer(scenes, auth = Some(("alice", "s3cret")),
      tokenTtlRequests = 2)
    try {
      val p = new TokenAuthProvider(server.baseUrl, "alice", "s3cret")
      val search = p.searchFnLimited
      (1 to 3).foreach { _ =>
        assert(search(Seq(EqualTo("dataset", "LANDSAT_8")), None).map(_.scene_id)
          == Seq("LC08_223064_1"))
      }
      assert(server.logins == 2,
        s"expected initial login + one refresh, saw ${server.logins}")
      assert(server.unauthorized == 1, "exactly the expired call is rejected then retried")
    } finally server.stop()
  }

  test("bad credentials fail loudly at login; downloads honour auth end-to-end") {
    val payload = "BYTES".getBytes("UTF-8")
    val server = new FixtureCatalogServer(scenes, assets = Map("S2A_T23LLF_1" -> payload),
      auth = Some(("alice", "s3cret")))
    try {
      val bad = new TokenAuthProvider(server.baseUrl, "alice", "wrong")
      val e = intercept[IllegalArgumentException] {
        bad.searchFnLimited(Seq.empty, None)
      }
      assert(e.getMessage.contains("login failed"))
      // authenticated download kernel fetches through executors
      import spark.implicits._
      val dest = java.nio.file.Files.createTempDirectory("graft-auth-dl").toString
      val ok = new TokenAuthProvider(server.baseUrl, "alice", "s3cret")
      val out = ok.downloadKernel(dest)(
        Seq(("S2A_T23LLF_1", 1, "download", 0)).toDF(
          "sceneid", "collection_id", "activity_type", "retry_count"))
        .select("sceneid", "status").collect()
      assert(out.map(r => (r.getString(0), r.getString(1))).toSeq
        == Seq(("S2A_T23LLF_1", "SUCCESS")))
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dest, "S2A_T23LLF_1")),
        payload))
    } finally server.stop()
  }

  test("auth composes with the LTA handshake: 202 polls carry the token, then bytes") {
    val payload = "OFFLINE-THEN-ONLINE".getBytes("UTF-8")
    val server = new FixtureCatalogServer(scenes,
      assets = Map("S2A_T23LLF_1" -> payload),
      offlinePolls = Map("S2A_T23LLF_1" -> 1),
      auth = Some(("alice", "s3cret")))
    try {
      import spark.implicits._
      val p = new TokenAuthProvider(server.baseUrl, "alice", "s3cret")
      val dest = java.nio.file.Files.createTempDirectory("graft-auth-lta").toString
      val df = Seq(("S2A_T23LLF_1", 1, "download", 0)).toDF(
        "sceneid", "collection_id", "activity_type", "retry_count")
      def status() = p.downloadKernel(dest)(df)
        .select("status").head().getString(0)
      assert(status() === "RETRY", "offline asset must report RETRY through auth")
      assert(status() === "SUCCESS", "the poll triggered retrieval; next fetch lands")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dest, "S2A_T23LLF_1")), payload))
      assert(server.unauthorized === 0, "every poll must carry a valid token")
      assert(server.downloads.count(_ == "S2A_T23LLF_1") === 2)
    } finally server.stop()
  }

  test("HTTP provider round-trips timestamps and JSON symmetric encode/decode") {
    val back = HttpCatalogProvider.parseFeatures(HttpCatalogProvider.toJson(scenes))
    assert(back == scenes)
  }

  test("LIMIT pushes to the provider as max-results, locally and over the wire") {
    @volatile var receivedLimit: Option[Int] = None
    RemoteCatalog.registerLimited("test-limited", { (_, limit) =>
      receivedLimit = limit
      (1 to 100).map(i => RemoteCatalog.SceneRecord(f"s$i%03d", "D", 1.0, i.toLong, "l"))
    })
    val df = spark.read.format("remote_catalog")
      .option("provider", "test-limited").load().limit(7)
    assert(df.count() == 7)
    assert(receivedLimit.contains(7), s"limit must reach the search call, got $receivedLimit")
    assert(df.queryExecution.executedPlan.toString.contains("PushedLimit: 7"))

    // and across HTTP: max_results arrives as a query param, the fixture
    // server truncates, Spark's own Limit still guards correctness
    val server = new FixtureCatalogServer(scenes)
    try {
      RemoteCatalog.registerLimited("http-limited",
        HttpCatalogProvider.searchFnLimited(server.baseUrl))
      val got = spark.read.format("remote_catalog")
        .option("provider", "http-limited").load().limit(2)
      assert(got.count() == 2)
      assert(server.queries.exists(_.contains("max_results=2")),
        s"max_results must travel the wire, got ${server.queries}")
    } finally server.stop()
  }

  private def applyExact(rs: Seq[RemoteCatalog.SceneRecord],
                         filters: Seq[org.apache.spark.sql.sources.Filter]) =
    rs.filter(r => filters.forall {
      case EqualTo("dataset", v) => r.dataset == v
      case LessThanOrEqual("cloud_cover", v) => r.cloud_cover <= v.toString.toDouble
      case _ => true
    })

  test("COUNT(*) pushes to an exact provider as matched-count; no records ship") {
    @volatile var searches = 0
    @volatile var counted: List[Seq[org.apache.spark.sql.sources.Filter]] = Nil
    RemoteCatalog.registerExact("test-exact",
      { (filters, _) => searches += 1; applyExact(scenes, filters) },
      { filters => counted = filters :: counted
        Some(applyExact(scenes, filters).size.toLong) },
      { case EqualTo("dataset", _) | LessThanOrEqual("cloud_cover", _) => true
        case org.apache.spark.sql.sources.IsNotNull(_) => true // no nulls in records
        case _ => false })
    val df = spark.read.format("remote_catalog").option("provider", "test-exact")
      .load().filter(col("dataset") === "S2_MSI_L1C")
    assert(df.count() == 2L)
    assert(searches == 0, "a pushed COUNT(*) must never fetch records")
    assert(counted.exists(_.exists {
      case EqualTo("dataset", v) => v == "S2_MSI_L1C"; case _ => false
    }), s"the count call must receive the pushed filters, got $counted")
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]"), plan)
    assert(searches == 0)
    // the scan path of the same provider still works (exact filters were
    // consumed by pushFilters, so the provider MUST apply them — it does)
    assert(df.select("scene_id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("S2A_T23LLF_1", "S2A_T23LLF_2"))
    assert(searches >= 1) // planInputPartitions may run more than once
  }

  test("COUNT pushdown declines: grouping, residual filters, default providers") {
    @volatile var searches = 0
    RemoteCatalog.registerExact("test-exact2",
      { (filters, _) => searches += 1; applyExact(scenes, filters) },
      filters => Some(applyExact(scenes, filters).size.toLong),
      { case EqualTo("dataset", _) | LessThanOrEqual("cloud_cover", _) => true
        case org.apache.spark.sql.sources.IsNotNull(_) => true
        case _ => false })
    def relation = spark.read.format("remote_catalog")
      .option("provider", "test-exact2").load()
    // grouped aggregation: not a global COUNT(*) → falls back to scanning
    val grouped = relation.groupBy("dataset").count()
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == Map("S2_MSI_L1C" -> 2L, "LANDSAT_8" -> 1L))
    assert(searches >= 1, "grouped count must scan")
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    // a strict < is NOT exact (the wire param is <=): it stays residual,
    // which blocks aggregate pushdown automatically
    val before = searches
    val strict = relation.filter(col("cloud_cover") < 20)
    assert(strict.count() == 2L)
    assert(searches > before, "count behind a residual filter must scan")
    // a default (over-return-allowed) provider never pushes aggregates
    RemoteCatalog.register("test-default", _ => scenes)
    val d = spark.read.format("remote_catalog").option("provider", "test-default").load()
    assert(d.count() == 3L)
    assert(!d.groupBy().count().queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
  }

  test("HTTP exact provider: COUNT(*) travels as /count, matched comes back") {
    val server = new FixtureCatalogServer(scenes)
    try {
      RemoteCatalog.registerExact("http-exact",
        HttpCatalogProvider.searchFnLimited(server.baseUrl),
        HttpCatalogProvider.countFn(server.baseUrl),
        HttpCatalogProvider.exactShapes)
      val df = spark.read.format("remote_catalog").option("provider", "http-exact")
        .load().filter(col("dataset") === "S2_MSI_L1C")
      assert(df.count() == 2L)
      assert(server.countQueries.exists(_.contains("dataset=S2_MSI_L1C")),
        s"the filter must reach /count as a query param, got ${server.countQueries}")
      assert(server.queries.isEmpty, "no /search call for a pushed count")
      // the item path still works over the wire after a count
      assert(df.select("scene_id").collect().length == 2)
      assert(server.queries.nonEmpty)
    } finally server.stop()
  }

  test("empty search result and unregistered provider behave sanely") {
    RemoteCatalog.register("test-empty", _ => Nil)
    assert(spark.read.format("remote_catalog").option("provider", "test-empty")
      .load().count() == 0)
    assertThrows[Exception] {
      spark.read.format("remote_catalog").option("provider", "nope").load().count()
    }
  }

  test("partitionSize splits large results into multiple input partitions") {
    RemoteCatalog.register("test-many",
      _ => (1 to 25).map(i => RemoteCatalog.SceneRecord(s"s$i", "D", 1.0, i.toLong, "l")))
    val df = spark.read.format("remote_catalog")
      .option("provider", "test-many").option("partitionSize", "10").load()
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 25)
  }
}
