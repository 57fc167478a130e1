package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.types._

/** Local-stub drive of the REST extract + partition backfill: a JDK
  * HttpServer plays the Socrata endpoint (JSON array per GET, limit/
  * offset pagination) so fetch, skip-if-committed, and crash-replay
  * semantics are testable with zero egress.
  */
class HttpSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_http").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  /** Serve `total` rows as a JSON array; honors $limit/$offset. Returns
    * (server, baseUrl, per-path hit counts).
    */
  private def stub(total: Int): (com.sun.net.httpserver.HttpServer, String,
      ConcurrentHashMap[String, Integer]) = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new ConcurrentHashMap[String, Integer]()
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val path = ex.getRequestURI.getPath
      hits.merge(path, 1, (a, b) => a + b)
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val limit = params.get("%24limit").orElse(params.get("$limit"))
        .map(_.toInt).getOrElse(total)
      val offset = params.get("%24offset").orElse(params.get("$offset"))
        .map(_.toInt).getOrElse(0)
      val rows = (offset until math.min(offset + limit, total))
        .map(i => s"""{"id":$i,"name":"row$i"}""")
      val body = rows.mkString("[", ",", "]").getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}", hits)
  }

  test("httpFetchJson: one-shot GET normalizes the JSON array into typed rows") {
    val (srv, base, hits) = stub(total = 5)
    try {
      val df = Readers.httpFetchJson(spark, s"$base/feed", schema)
      assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq == (0 until 5).map(i => (i.toLong, s"row$i")))
      assert(hits.get("/feed") == 1)
    } finally srv.stop(0)
  }

  test("httpFetchJson: block-parallel limit/offset pagination reads the whole feed") {
    val (srv, base, hits) = stub(total = 25)
    try {
      val df = Readers.httpFetchJson(spark, s"$base/feed", schema,
        pageSize = Some(4), parallelPages = 2)
      val ids = df.select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until 25L), s"got ${ids.length} rows")
      // 25 rows / 4 per page → pages 0..6 hold data; the block layout
      // (2 pages per block) stops inside block 3 → exactly 8 page GETs
      assert(hits.get("/feed") == 8, s"hits=${hits.get("/feed")}")
    } finally srv.stop(0)
  }

  test("httpFetchJson: a server that caps the limit below pageSize fails loudly") {
    // plays Socrata's 50k cap: honors $offset but never returns more
    // than 2 rows per page however large the requested $limit — the
    // offset walk would silently skip rows 2..3, 6..7, … if trusted
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val offset = params.get("%24offset").orElse(params.get("$offset"))
        .map(_.toInt).getOrElse(0)
      val rows = (offset until math.min(offset + 2, 20))
        .map(i => s"""{"id":$i,"name":"row$i"}""")
      val body = rows.mkString("[", ",", "]").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    try {
      val e = intercept[java.io.IOException] {
        Readers.httpFetchJson(spark,
          s"http://127.0.0.1:${srv.getAddress.getPort}/feed", schema,
          pageSize = Some(4), parallelPages = 2).count()
      }
      assert(e.getMessage.contains("caps"), e.getMessage)
    } finally srv.stop(0)
  }

  test("httpFetchJson: a 200-status non-array body fails loudly, never reads as end-of-feed") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val body = """{"error":"quota exceeded"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    try {
      val e = intercept[java.io.IOException] {
        Readers.httpFetchJson(spark,
          s"http://127.0.0.1:${srv.getAddress.getPort}/feed", schema,
          pageSize = Some(4), parallelPages = 2).count()
      }
      assert(e.getMessage.contains("does not parse as a JSON array"),
        e.getMessage)
    } finally srv.stop(0)
  }

  test("backfillHttpWindows: fetches only missing windows, replays as a no-op") {
    val (srv, base, hits) = stub(total = 3)
    try {
      val raw = s"${tmp()}/raw"
      // window w2020 was committed by an earlier (crashed-midway) run
      Sinks.appendWindowOnce(spark, raw,
        Seq((100L, "old", "w2020")).toDF("id", "name", "window"),
        "pull311", "w2020")
      val windows = Seq(
        "w2019" -> s"$base/2019", "w2020" -> s"$base/2020",
        "w2021" -> s"$base/2021")
      val fetched = Sinks.backfillHttpWindows(spark, raw, "pull311",
        windows, schema)
      assert(fetched == Seq("w2019", "w2021"))
      // the committed window was skipped BEFORE any fetch
      assert(!hits.containsKey("/2020"))
      assert(hits.get("/2019") == 1 && hits.get("/2021") == 1)
      val head = Readers.readSnapshot(spark, raw)
      assert(head.count() == 7) // 1 old + 3 + 3
      assert(head.select("window").distinct().collect().map(_.getString(0))
        .sorted.toSeq == Seq("w2019", "w2020", "w2021"))
      // full replay: everything committed, zero fetches
      val again = Sinks.backfillHttpWindows(spark, raw, "pull311",
        windows, schema)
      assert(again.isEmpty)
      assert(hits.get("/2019") == 1 && hits.get("/2021") == 1)
    } finally srv.stop(0)
  }

  test("repairGaps: the gap report drives the backfill of exactly the missing buckets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val (srv, base, hits) = stub(total = 2) // each bucket URL serves 2 rows
    try {
      // live monitor: hours 10, 11, 14 arrive → hours 12, 13 reported
      val mem = MemoryStream[Long]
      val q = graft.streaming.EventStreams.gapMonitorStream(
        mem.toDF().toDF("ts_s"), s"$dir/report", "ts_s", "g1",
        bucketSeconds = 3600L)
        .option("checkpointLocation", s"$dir/ckpt").start()
      mem.addData(36000L, 39600L, 50400L)
      q.processAllAvailable(); q.stop()
      // repair: fetch each REPORTED bucket from its own range URL and
      // commit it as an exactly-once window
      def run() = Sinks.repairGaps(spark, s"$dir/report", s"$dir/raw",
        "feed", b => s"$base/bucket-$b",
        (s, url) => Readers.httpFetchJson(s, url, schema))
      val fetched = run()
      assert(fetched == Seq("s43200", "s46800"), fetched.mkString(","))
      assert(hits.get("/bucket-43200") == 1 && hits.get("/bucket-46800") == 1)
      val raw = Readers.readSnapshot(spark, s"$dir/raw")
      assert(raw.count() == 4)
      assert(raw.select("window").distinct().collect().map(_.getString(0))
        .sorted.toSeq == Seq("s43200", "s46800"))
      // re-run: both buckets committed → zero fetches, zero reports
      assert(run().isEmpty)
      assert(hits.get("/bucket-43200") == 1 && hits.get("/bucket-46800") == 1)
      // monitor replay (fresh query, same checkpoint): the report rewrite
      // is generation-keyed, so the repair is STILL a no-op
      val q2 = graft.streaming.EventStreams.gapMonitorStream(
        mem.toDF().toDF("ts_s"), s"$dir/report", "ts_s", "g1",
        bucketSeconds = 3600L)
        .option("checkpointLocation", s"$dir/ckpt").start()
      q2.processAllAvailable(); q2.stop()
      assert(run().isEmpty)
    } finally srv.stop(0)
  }

  test("an empty window commits a zero-row sentinel: replays never re-fetch it") {
    val (srv, base, hits) = stub(total = 0)
    try {
      val raw = s"${tmp()}/raw"
      val windows = Seq("w2022" -> s"$base/2022")
      val first = Sinks.backfillHttpWindows(spark, raw, "pull311",
        windows, schema)
      assert(first == Seq("w2022"))
      assert(hits.get("/2022") == 1)
      // the head is readable, zero rows, schema intact (incl. window col)
      val head = Readers.readSnapshot(spark, raw)
      assert(head.count() == 0)
      assert(head.columns.toSeq == Seq("id", "name", "window"))
      // replay: the sentinel reads as committed — no re-fetch, no
      // re-report (the old early return re-fetched empty feeds forever)
      val again = Sinks.backfillHttpWindows(spark, raw, "pull311",
        windows, schema)
      assert(again.isEmpty)
      assert(hits.get("/2022") == 1)
    } finally srv.stop(0)
  }

  test("httpFetchCsv + backfillWindows: the monthly-CSV catchup leg") {
    // a CSV endpoint (the Airbnb-listings shape): header + rows
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new ConcurrentHashMap[String, Integer]()
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val path = ex.getRequestURI.getPath
      hits.merge(path, 1, (a, b) => a + b)
      val month = path.stripPrefix("/listings-")
      val body = (s"id,name\n1,alpha $month\n2,\"beta, quoted\"\n")
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val csvSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      // direct fetch: Spark's CSV reader semantics (header, quoting)
      val one = Readers.httpFetchCsv(spark, s"$base/listings-jan",
        Some(csvSchema)).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(one.sorted.toSeq ==
        Seq((1L, "alpha jan"), (2L, "beta, quoted")))
      // the generic backfill with the CSV fetch plugged in
      val raw = s"${tmp()}/raw"
      val windows = Seq("jan" -> s"$base/listings-jan",
        "feb" -> s"$base/listings-feb")
      val fetched = Sinks.backfillWindows(spark, raw, "airbnb", windows,
        (s, url) => Readers.httpFetchCsv(s, url, Some(csvSchema)))
      assert(fetched == Seq("jan", "feb"))
      val head = Readers.readSnapshot(spark, raw)
      assert(head.count() == 4)
      assert(head.filter(head("window") === "feb").count() == 2)
      // replay: no fetches, no new rows
      assert(Sinks.backfillWindows(spark, raw, "airbnb", windows,
        (s, url) => Readers.httpFetchCsv(s, url, Some(csvSchema))).isEmpty)
      assert(hits.get("/listings-jan") == 2 && hits.get("/listings-feb") == 1)
    } finally srv.stop(0)
  }

  test("a crash mid-backfill keeps completed windows durable; the re-run fetches only the rest") {
    val (srv, base, hits) = stub(total = 2)
    try {
      val raw = s"${tmp()}/raw"
      val windows = Seq("w1" -> s"$base/w1", "w2" -> s"$base/w2",
        "w3" -> s"$base/w3")
      // the fetch DIES on w2 (network failure mid-loop): w1's commit
      // must survive; w2/w3 must be absent
      val boom = intercept[RuntimeException] {
        Sinks.backfillWindows(spark, raw, "s", windows, (s, url) => {
          if (url.endsWith("/w2")) throw new RuntimeException("net down")
          Readers.httpFetchJson(s, url, schema)
        })
      }
      assert(boom.getMessage == "net down")
      assert(Readers.readSnapshot(spark, raw).count() == 2) // w1 only
      assert(hits.get("/w1") == 1 && !hits.containsKey("/w3"))
      // the re-run skips the durable w1 WITHOUT fetching it and
      // completes exactly the missing windows
      val resumed = Sinks.backfillWindows(spark, raw, "s", windows,
        (s, url) => Readers.httpFetchJson(s, url, schema))
      assert(resumed == Seq("w2", "w3"))
      assert(hits.get("/w1") == 1)
      assert(Readers.readSnapshot(spark, raw).count() == 6)
    } finally srv.stop(0)
  }

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  /** CSV endpoint that serves `/x.csv.gz` paths as gzip WITHOUT a
    * Content-Encoding header (the static-bucket shape — the
    * reference's `listings.csv.gz` pull), `/enc/…` paths as gzip WITH
    * the header on a plain name, and everything else as plain text.
    * Records the Accept header each path was asked with.
    */
  private def csvStub(): (com.sun.net.httpserver.HttpServer, String,
      ConcurrentHashMap[String, String]) = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val accepts = new ConcurrentHashMap[String, String]()
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val path = ex.getRequestURI.getPath
      accepts.put(path, ex.getRequestHeaders.getFirst("Accept"))
      val month = path.split("/").last.split("\\.").head
      val csv = s"id,name\n1,alpha $month\n2,beta $month\n"
      val body =
        if (path.endsWith(".gz")) gz(csv)
        else if (path.startsWith("/enc/")) {
          ex.getResponseHeaders.add("Content-Encoding", "gzip"); gz(csv)
        } else csv.getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}", accepts)
  }

  test("httpFetchCsv: .gz URL without Content-Encoding decompresses transparently") {
    val (srv, base, accepts) = csvStub()
    try {
      val csvSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      // the reference's day-one feed shape: listings.csv.gz, raw gzip
      // bytes, no Content-Encoding header
      val rows = Readers.httpFetchCsv(spark, s"$base/listings-jan.csv.gz",
        Some(csvSchema)).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.sorted.toSeq ==
        Seq((1L, "alpha listings-jan"), (2L, "beta listings-jan")))
      // and the CSV path asks for CSV, not JSON
      assert(accepts.get("/listings-jan.csv.gz").startsWith("text/csv"),
        accepts.get("/listings-jan.csv.gz"))
    } finally srv.stop(0)
  }

  test("httpFetch: Content-Encoding gzip on a plain-named URL decompresses; JSON path too") {
    val (srv, base, _) = csvStub()
    try {
      val csvSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val rows = Readers.httpFetchCsv(spark, s"$base/enc/listings-feb",
        Some(csvSchema)).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.sorted.toSeq ==
        Seq((1L, "alpha listings-feb"), (2L, "beta listings-feb")))
      // JSON leg: header-declared gzip on a JSON array body
      val jsrv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      jsrv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
        val body = gz("""[{"id":7,"name":"zipped"}]""")
        ex.getResponseHeaders.add("Content-Encoding", "gzip")
        ex.sendResponseHeaders(200, body.length)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      })
      jsrv.start()
      try {
        val got = Readers.httpFetchJson(spark,
          s"http://127.0.0.1:${jsrv.getAddress.getPort}/feed", schema)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(got.toSeq == Seq((7L, "zipped")))
      } finally jsrv.stop(0)
    } finally srv.stop(0)
  }

  test("httpFetch: a declared-gzip body that is not gzip fails loudly") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val body = "id,name\n1,plain\n".getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Encoding", "gzip")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    try {
      val e = intercept[org.apache.spark.SparkException] {
        Readers.httpFetchCsv(spark,
          s"http://127.0.0.1:${srv.getAddress.getPort}/x").count()
      }
      assert(e.getCause != null || e.getMessage.contains("magic"),
        e.getMessage)
    } finally srv.stop(0)
  }

  test("a .gz-named URL whose body is actually plain text passes through untouched") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      // a misnamed artifact: .gz path, plain CSV bytes, no header
      val body = "id,name\n9,misnamed\n".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    try {
      val csvSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val rows = Readers.httpFetchCsv(spark,
        s"http://127.0.0.1:${srv.getAddress.getPort}/data.csv.gz",
        Some(csvSchema)).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((9L, "misnamed")))
    } finally srv.stop(0)
  }

  test("backfillWindows over mixed gz/plain monthly windows lands both shapes") {
    val (srv, base, _) = csvStub()
    try {
      val csvSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val raw = s"${tmp()}/raw"
      // the reference DAG's real feed list mixes compressed and plain
      // monthly artifacts; one backfill must land both
      val windows = Seq(
        "jan" -> s"$base/listings-jan.csv.gz",
        "feb" -> s"$base/listings-feb")
      val fetched = Sinks.backfillWindows(spark, raw, "airbnb", windows,
        (s, url) => Readers.httpFetchCsv(s, url, Some(csvSchema)))
      assert(fetched == Seq("jan", "feb"))
      val head = Readers.readSnapshot(spark, raw)
      assert(head.count() == 4)
      val names = head.select("name").collect().map(_.getString(0)).sorted
      assert(names.toSeq == Seq("alpha listings-feb", "alpha listings-jan",
        "beta listings-feb", "beta listings-jan"))
      // replay: both windows committed → no-op
      assert(Sinks.backfillWindows(spark, raw, "airbnb", windows,
        (s, url) => Readers.httpFetchCsv(s, url, Some(csvSchema))).isEmpty)
    } finally srv.stop(0)
  }

  test("window ids that prefix-extend each other never alias (2019 vs 2019-q1)") {
    val (srv, base, hits) = stub(total = 2)
    try {
      val raw = s"${tmp()}/raw"
      Sinks.appendWindowOnce(spark, raw,
        Seq((1L, "q1", "2019-q1")).toDF("id", "name", "window"),
        "s", "2019-q1")
      // "2019" is NOT committed even though "2019-q1"'s files carry the
      // prefix "ingest-s-w2019-"
      val fetched = Sinks.backfillHttpWindows(spark, raw, "s",
        Seq("2019" -> s"$base/y"), schema)
      assert(fetched == Seq("2019"))
      assert(hits.get("/y") == 1)
      assert(Readers.readSnapshot(spark, raw).count() == 3)
      // and the replay of the hyphenated window stays a no-op
      assert(!Sinks.appendWindowOnce(spark, raw,
        Seq((1L, "q1", "2019-q1")).toDF("id", "name", "window"),
        "s", "2019-q1"))
    } finally srv.stop(0)
  }
}
