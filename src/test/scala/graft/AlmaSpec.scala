package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{AlmaProvider, Registry}

/** AlmaLinux pipeline (reference `providers/alma/parser.py` — OSV
  * pass-through + modularity-from-summary, library-gap patching,
  * advisory record-type stamp). */
class AlmaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val env = AlmaProvider.envelopes(spark,
    getClass.getResource("/fixtures/alma").getPath +
      "/advisories/almalinux*/*.json").cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps alma to its patched-osv family") {
    val spec = Registry.byName("alma")
    assert(spec.family == "alma" && spec.tags.contains("osv"))
  }

  test("identifiers carry the per-release directory version") {
    import spark.implicits._
    val ids = env.select("identifier").as[String].collect().toSet
    assert(ids == Set("almalinux9/ALSA-2021:4386",
      "almalinux9/ALSA-2024:1111", "almalinux8/ALSA-2020:5487"))
  }

  test("library gap: gcc clones to libgcc with the base purl, cpp untouched") {
    val it = item("almalinux9/ALSA-2021:4386")
    assert(it.contains("\"name\":\"libgcc\""))
    // the clone keeps the BASE package's purl (reference dict-copy rule)
    assert(it.split("\"purl\":\"pkg:rpm/almalinux/gcc\"").length == 3)
    // only the gap's base package clones — one cpp entry
    assert(it.split("\"name\":\"cpp\"").length == 2)
    // no modularity: "gcc" has no interior colon
    assert(!it.contains("rpm_modularity"))
    // fixed events survive the pass-through
    assert(it.contains("\"fixed\":\"11.2.1-9.4.el9.alma\""))
    assert(it.contains("\"schema_version\":\"1.6.2\""))
  }

  test("library package already present: no duplicate clone") {
    val it = item("almalinux8/ALSA-2020:5487")
    assert(it.split("\"name\":\"pacemaker-libs\"").length == 2)
  }

  test("modularity from summary lands on affected entries; a record " +
      "without schema_version stays without one (the 1.7.0 default " +
      "labels only the envelope, parser.py:110 + __init__.py:66)") {
    val it = item("almalinux9/ALSA-2024:1111")
    assert(it.contains("\"rpm_modularity\":\"nodejs:16\""))
    assert(!it.contains("schema_version"))
    import spark.implicits._
    val url = env.filter(org.apache.spark.sql.functions.col("identifier")
        === "almalinux9/ALSA-2024:1111")
      .select("schema").as[String].head()
    assert(url.endsWith("/osv/schema-1.7.0.json"))
  }

  test("a record carrying its own schema_version labels the envelope " +
      "with it") {
    import spark.implicits._
    val url = env.filter(org.apache.spark.sql.functions.col("identifier")
        === "almalinux9/ALSA-2021:4386")
      .select("schema").as[String].head()
    assert(url.endsWith("/osv/schema-1.6.2.json"))
  }

  test("every record is stamped as an advisory") {
    import spark.implicits._
    assert(env.select("item").as[String].collect()
      .forall(_.contains("\"record_type\":\"advisory\"")))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("alma", env)
  }
}
