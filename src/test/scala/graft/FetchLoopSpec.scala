package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FetchLoop, StagedFetch}
import graft.sources.StagedFetch.{Config, Response}

/** End-to-end S1/S3 fetch loops against a fake multi-page server:
  * plan → fetch (retry envelope) → stage → parse → re-plan, with a 429
  * mid-walk, down to parsed rows/envelopes. Reference loops:
  * `providers/nvd/api.py:105-147`, `providers/github/parser.py:206-229`. */
class FetchLoopSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** URL-keyed transport: each URL gets a response queue (last response
    * repeats); records the request order. */
  private class FakeServer(pages: Map[String, Seq[Response]])
      extends (String => Response) {
    val requests = scala.collection.mutable.ArrayBuffer.empty[String]
    private val remaining =
      scala.collection.mutable.Map(pages.view.mapValues(_.toList).toSeq: _*)
    def apply(url: String): Response = {
      requests += url
      remaining.get(url) match {
        case Some(r :: rest) =>
          if (rest.nonEmpty) remaining(url) = rest
          r
        case _ => Response(404)
      }
    }
  }

  private def ok(json: String) = Response(200, body = json.getBytes("UTF-8"))

  private def nvdPage(total: Int, perPage: Int, start: Int,
      ids: Seq[String]): String = {
    val vulns = ids.map { id =>
      s"""{"cve":{"id":"$id","lastModified":"2024-01-0${1 + start % 8}T00:00:00",
         |"vulnStatus":"Analyzed","descriptions":[],"configurations":[],
         |"references":[]}}""".stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"totalResults":$total,"resultsPerPage":$perPage,"startIndex":$start,
       |"vulnerabilities":[$vulns]}""".stripMargin.replaceAll("\n", "")
  }

  test("S1: NVD offset walk — 3 pages, 429 mid-walk, parsed CVE rows") {
    // totalResults=5, perPage=2 → page 0 plans offsets [2, 4]
    val base = "https://nvd.example.invalid/cves"
    val server = new FakeServer(Map(
      s"$base?startIndex=0" ->
        Seq(ok(nvdPage(5, 2, 0, Seq("CVE-2024-0001", "CVE-2024-0002")))),
      s"$base?startIndex=2" -> Seq( // rate-limited once, then serves
        Response(429, Map("Retry-After" -> "11")),
        ok(nvdPage(5, 2, 2, Seq("CVE-2024-0003", "CVE-2024-0004")))),
      s"$base?startIndex=4" ->
        Seq(ok(nvdPage(5, 2, 4, Seq("CVE-2024-0005"))))))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val dir = Files.createTempDirectory("graft-nvd-walk")

    val paths = FetchLoop.nvdWalk(spark, base, dir, server,
      Config(), sleeper = sleeps += _)

    assert(paths.size == 3)
    assert(server.requests == Seq(s"$base?startIndex=0",
      s"$base?startIndex=2", s"$base?startIndex=2", s"$base?startIndex=4"))
    assert(sleeps.toList == List(11.0)) // the Retry-After wait, no backoff
    // parse side: one distributed read over the staged directory
    val cves = graft.providers.NvdProvider.cves(spark, s"$dir/*.json")
    assert(cves.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      (1 to 5).map(i => f"CVE-2024-$i%04d"))
  }

  test("S1: trailing empty page when totalResults divides evenly") {
    // total=4, perPage=2 → reference requests offsets [2, 4]; page at 4
    // is empty but still fetched (api.py pages = total // per_page)
    val base = "https://nvd.example.invalid/cves"
    val server = new FakeServer(Map(
      s"$base?startIndex=0" -> Seq(ok(nvdPage(4, 2, 0, Seq("CVE-1", "CVE-2")))),
      s"$base?startIndex=2" -> Seq(ok(nvdPage(4, 2, 2, Seq("CVE-3", "CVE-4")))),
      s"$base?startIndex=4" -> Seq(ok(nvdPage(4, 2, 4, Seq.empty)))))
    val dir = Files.createTempDirectory("graft-nvd-walk-even")
    val paths = FetchLoop.nvdWalk(spark, base, dir, server, Config(),
      sleeper = _ => ())
    assert(paths.size == 3)
    assert(graft.providers.NvdProvider.cves(spark, s"$dir/*.json").count() == 4)
  }

  private def ghsaPage(cursor: Option[String], hasNext: Boolean,
      ghsaId: String, pkg: String): String = {
    val cur = cursor.map(c => s""""$c"""").getOrElse("null")
    s"""{"data":{"securityAdvisories":{
       |"pageInfo":{"endCursor":$cur,"hasNextPage":$hasNext},
       |"nodes":[{"ghsaId":"$ghsaId","severity":"HIGH","summary":"s",
       |"publishedAt":"2024-01-01T00:00:00Z","updatedAt":"2024-01-02T00:00:00Z",
       |"identifiers":[{"type":"CVE","value":"CVE-2024-9999"}],
       |"cvss":{"vectorString":null},
       |"vulnerabilities":{"nodes":[{"package":{"ecosystem":"NPM","name":"$pkg"},
       |"vulnerableVersionRange":"< 1.0.1",
       |"firstPatchedVersion":{"identifier":"1.0.1"}}]}}]}}}"""
      .stripMargin.replaceAll("\n", "")
  }

  test("S3: GHSA cursor walk — 3 pages, 429 mid-walk, envelopes out") {
    val base = "https://ghsa.example.invalid/graphql"
    // base64 cursors carry '+' and '=' — the walk must percent-encode
    // them ('+' in a query string otherwise decodes as a space)
    val c1 = "Y3Vyc29yOnYyOpK+aa=="
    val c1Enc = "Y3Vyc29yOnYyOpK%2Baa%3D%3D"
    val server = new FakeServer(Map(
      base -> Seq(ok(ghsaPage(Some(c1), hasNext = true, "GHSA-aaaa", "pkg-a"))),
      s"$base?after=$c1Enc" -> Seq(
        Response(429, Map("Retry-After" -> "13")),
        ok(ghsaPage(Some("c2"), hasNext = true, "GHSA-bbbb", "pkg-b"))),
      s"$base?after=c2" -> Seq(
        ok(ghsaPage(None, hasNext = false, "GHSA-cccc", "pkg-c")))))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val dir = Files.createTempDirectory("graft-ghsa-walk")

    val paths = FetchLoop.ghsaWalk(spark, base, dir, server,
      Config(), sleeper = sleeps += _)

    assert(paths.size == 3)
    assert(server.requests == Seq(base, s"$base?after=$c1Enc",
      s"$base?after=$c1Enc", s"$base?after=c2"))
    assert(sleeps.toList == List(13.0))
    // parse → envelope: the full S3 output shape from staged pages
    val adv = graft.providers.GhsaProvider.advisories(spark, s"$dir/*.json")
    val env = graft.providers.GhsaProvider.envelopes(adv).collect()
    assert(env.length == 3)
    val ids = adv.select("ghsa_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("GHSA-aaaa", "GHSA-bbbb", "GHSA-cccc"))
  }

  test("a re-run staging fewer pages clears the stale tail") {
    val base = "https://nvd.example.invalid/cves"
    val dir = Files.createTempDirectory("graft-nvd-rerun")
    val big = new FakeServer(Map(
      s"$base?startIndex=0" -> Seq(ok(nvdPage(4, 2, 0, Seq("CVE-1", "CVE-2")))),
      s"$base?startIndex=2" -> Seq(ok(nvdPage(4, 2, 2, Seq("CVE-3", "CVE-4")))),
      s"$base?startIndex=4" -> Seq(ok(nvdPage(4, 2, 4, Seq.empty)))))
    assert(FetchLoop.nvdWalk(spark, base, dir, big, Config(),
      sleeper = _ => ()).size == 3)
    // upstream shrank: the re-run stages 1 page; page_00001/2 must go
    val small = new FakeServer(Map(
      s"$base?startIndex=0" -> Seq(ok(nvdPage(2, 2, 0, Seq("CVE-9", "CVE-8")))),
      s"$base?startIndex=2" -> Seq(ok(nvdPage(2, 2, 2, Seq.empty)))))
    assert(FetchLoop.nvdWalk(spark, base, dir, small, Config(),
      sleeper = _ => ()).size == 2)
    val ids = graft.providers.NvdProvider.cves(spark, s"$dir/*.json")
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("CVE-8", "CVE-9"), s"stale pages leaked: $ids")
  }

  test("run nvd from nothing: fetch → parse → envelopes → store → status") {
    val base = "https://nvd.example.invalid/cves"
    val server = new FakeServer(Map(
      s"$base?startIndex=0" ->
        Seq(ok(nvdPage(3, 2, 0, Seq("CVE-2024-0001", "CVE-2024-0002")))),
      s"$base?startIndex=2" ->
        Seq(ok(nvdPage(3, 2, 2, Seq("CVE-2024-0003"))))))
    val stage = Files.createTempDirectory("graft-nvd-run-stage")
    val root = Files.createTempDirectory("graft-nvd-run-store").toString

    val (n, digest) = graft.providers.NvdProvider.run(
      spark, base, stage, root, server, sleeper = _ => ())
    assert(n == 3)
    assert(digest.nonEmpty)
    // the committed store is the real thing: cataloged + re-readable
    val status = graft.sinks.Catalog.status(spark, root).collect()
    assert(status.exists(r => r.getString(0) == "nvd" && r.getLong(1) == 3))
    val ids = graft.sinks.ResultStore.read(spark, s"$root/nvd")
      .select("identifier").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("2024/cve-2024-0001", "2024/cve-2024-0002",
      "2024/cve-2024-0003"))
    // identical upstream ⇒ identical digest (deterministic results)
    val server2 = new FakeServer(Map(
      s"$base?startIndex=0" ->
        Seq(ok(nvdPage(3, 2, 0, Seq("CVE-2024-0001", "CVE-2024-0002")))),
      s"$base?startIndex=2" ->
        Seq(ok(nvdPage(3, 2, 2, Seq("CVE-2024-0003"))))))
    val (n2, digest2) = graft.providers.NvdProvider.run(
      spark, base, stage, root, server2, sleeper = _ => ())
    assert(n2 == 3 && digest2 == digest)
  }

  test("run github from nothing: cursor walk → envelopes → store") {
    val base = "https://ghsa.example.invalid/graphql"
    val server = new FakeServer(Map(
      base -> Seq(ok(ghsaPage(Some("c1"), hasNext = true, "GHSA-aaaa", "pkg-a"))),
      s"$base?after=c1" -> Seq(
        ok(ghsaPage(None, hasNext = false, "GHSA-bbbb", "pkg-b")))))
    val stage = Files.createTempDirectory("graft-ghsa-run-stage")
    val root = Files.createTempDirectory("graft-ghsa-run-store").toString
    val (n, digest) = graft.providers.GhsaProvider.run(
      spark, base, stage, root, server, sleeper = _ => ())
    assert(n == 2 && digest.nonEmpty)
    val ids = graft.sinks.ResultStore.read(spark, s"$root/github")
      .select("identifier").collect().map(_.getString(0)).sorted
    assert(ids.forall(_.startsWith("github:npm/ghsa-")), ids.mkString(","))
  }

  test("walk surfaces exhausted retries instead of staging a bad page") {
    val base = "https://down.example.invalid"
    val server = new FakeServer(Map(base -> Seq(Response(500))))
    val dir = Files.createTempDirectory("graft-walk-fail")
    intercept[StagedFetch.HttpError] {
      FetchLoop.walk[Int](0, dir, server, Config(retries = 1),
        sleeper = _ => ())(_ => base)((_, _, _) => None)
    }
    assert(Files.list(dir).count() == 0) // nothing staged on failure
  }
}
