package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.AmazonProvider
import graft.operators.Dedup

class AmazonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ALAS new-packages extraction honours arch section gating (S8)") {
    val html = scala.io.Source.fromFile(
      getClass.getResource("/fixtures/alas.html").getPath).mkString
    val pkgs = Seq(html).toDF("html")
      .select(AmazonProvider.newPackages(col("html")).as("p"))
      .head().getSeq[String](0).toSet
    // x86_64/noarch/src kept; the i686 section must be excluded
    assert(pkgs == Set(
      "kernel-4.14.305-227.531.amzn2.rpm",
      "kernel-headers-4.14.305-227.531.amzn2.rpm",
      "kernel-doc-4.14.305-227.531.amzn2.rpm",
      "kernel-4.14.305-227.531.src.rpm"))
  }

  test("ALAS envelopes: advisory-keyed record with Metadata.CVE " +
      "aliases, rpm-split FixedIn, pubDate Available") {
    val html = scala.io.Source.fromFile(
      getClass.getResource("/fixtures/alas.html").getPath).mkString
    val pages = Seq(
      ("ALAS-2023-1726", "important",
        Seq("CVE-2023-2000", "CVE-2023-1000"), html,
        "https://alas.aws.amazon.com/AL2/ALAS-2023-1726.html",
        "2023-02-17 22:51:00")
    ).toDF("alas_id", "severity", "cves", "html", "url", "date")
    val env = AmazonProvider.envelopes(pages, "amzn:2").collect()
    // ONE record per advisory (`parser.py:332-380`), not per CVE
    assert(env.map(_.getAs[String]("identifier")).toSet ==
      Set("amzn:2/alas-2023-1726"))
    val item = env.head.getAs[String]("item")
    assert(item.contains("\"Vulnerability\":{"))
    assert(item.contains("\"Name\":\"ALAS-2023-1726\""))
    assert(item.contains("\"Severity\":\"High\"")) // important → High
    assert(item.contains("\"Name\":\"kernel\""))
    assert(item.contains("\"Version\":\"4.14.305-227.531.amzn2\""))
    // CVE aliases sorted under Metadata, the RSS pubDate as the
    // advisory-kind Available date, the RSS link as Link
    assert(item.contains("\"Metadata\":{\"CVE\":[{\"Name\":\"CVE-2023-1000\"}," +
      "{\"Name\":\"CVE-2023-2000\"}]}"))
    assert(item.contains(
      "\"Available\":{\"Date\":\"2023-02-17\",\"Kind\":\"advisory\"}"))
    assert(item.contains(
      "\"Link\":\"https://alas.aws.amazon.com/AL2/ALAS-2023-1726.html\""))
    // Description from the page's issue_overview section
    assert(item.contains("\"Description\":\""))
  }

  test("connected components resolve duplicate clusters to min-id keeper") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),   // cluster {1,2,3}
      (10L, 11L),           // cluster {10,11}
      (20L, 21L), (21L, 22L), (22L, 23L) // chain {20..23}
    ).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert((20L to 23L).forall(comp(_) == 20L))
  }
}
