package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Url

/** Hand-pinned cases for the URL canonicalizer (the dedup-key step of
  * web-corpus curation; q_url_normalize replays the same arithmetic in
  * DuckDB). */
class UrlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def norm(us: String*): Seq[String] = {
    us.toDF("u").select(Url.normalize(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
  }

  test("case, default ports, fragments, tracking params, param order") {
    assert(norm(
      "HTTP://Example.COM:80/A/b/?utm_source=x&b=2&a=1#frag",
      "http://example.com/A/b?a=1&b=2",
      "https://Example.com:443/",
      "https://example.com:8443/x",
      "http://example.com:8080/x/",
      "https://h.example.com/p?gclid=1&fbclid=2&ref=nav&utm_campaign=c&keep=1"
    ) == Seq(
      // host lowercases, PATH case survives; :80 dies; params sort;
      // utm_* dies; trailing slash dies; fragment dies
      "http://example.com/A/b?a=1&b=2",
      "http://example.com/A/b?a=1&b=2",
      "https://example.com/",
      "https://example.com:8443/x",   // non-default port survives
      "http://example.com:8080/x",
      "https://h.example.com/p?keep=1"))
  }

  test("bare authority, userinfo, schemeless and null inputs") {
    assert(norm(
      "https://Example.com",          // no path → "/"
      "http://user:pw@Example.com/x", // userinfo stripped from host
      "  not a url  ",                // schemeless → trimmed passthrough
      "example.com/path"
    ) == Seq(
      "https://example.com/",
      "http://example.com/x",
      "not a url",
      "example.com/path"))
    val n = Seq[String](null).toDF("u")
      .select(Url.normalize(col("u"))).collect().head
    assert(n.isNullAt(0))
  }

  test("host and registered domain") {
    val df = Seq(
      "https://A.B.Example.COM:8443/x",
      "http://localhost:8080/",
      "https://example.com/").toDF("u")
    val out = df.select(Url.host(col("u")).as("h"),
      Url.registeredDomain(col("u")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("a.b.example.com", "example.com"),
      ("localhost", "localhost"),
      ("example.com", "example.com")))
  }

  test("protocol-relative URLs canonicalize and keep their prefix") {
    assert(norm(
      "//WWW.Example.com/a/?b=2&a=1&utm_source=x",
      "//CDN.Example.com:8080"
    ) == Seq(
      "//www.example.com/a?a=1&b=2",
      // no scheme → no known default port → it survives
      "//cdn.example.com:8080/"))
  }

  test("normalization is idempotent (incl. repeated slashes and ports)") {
    val urls = Seq(
      "HTTP://Example.COM:80/A/b/?utm_source=x&b=2&a=1#frag",
      "https://Example.com",
      "http://u@h.io:9999/p/?z=1&y=2",
      "http://h.io/a//",            // multi-slash: all die in one pass
      "https://h.io//",             // slashes-only path → root
      "//P.Q.org/x//?b=1&a=2")
    val once = norm(urls: _*)
    assert(norm(once: _*) == once)
    assert(once(3) == "http://h.io/a")
    assert(once(4) == "https://h.io/")
    assert(once(5) == "//p.q.org/x?a=2&b=1")
  }

  test("public functions trim their input consistently") {
    val out = Seq("  https://Example.com/x  ")
      .toDF("u").select(Url.normalize(col("u")).as("n"),
        Url.host(col("u")).as("h"),
        Url.registeredDomain(col("u")).as("d"))
      .collect().head
    assert(out.getString(0) == "https://example.com/x")
    assert(out.getString(1) == "example.com")
    assert(out.getString(2) == "example.com")
  }
}
