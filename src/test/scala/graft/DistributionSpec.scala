package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sinks.Distribution
import graft.sinks.Distribution.ListingEntry
import graft.sources.StagedFetch.Response

/** Distribution archive verification + swap (VERDICT r2 "missing" #6;
  * reference `distribution.py:49-84`, `provider.py:215-269`): listing
  * parse, latest-entry pick, checksum-verified import, state skip. */
class DistributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Build a results workspace + its tar.gz archive; returns
    * (archiveBytes, enclosedChecksum). */
  private def buildArchive(tamperAfterListing: Boolean = false): (Array[Byte], String) = {
    val src = Files.createTempDirectory("graft-dist-src")
    Files.createDirectories(src.resolve("results/sub"))
    Files.writeString(src.resolve("results/a.json"), """{"id":"a"}""")
    Files.writeString(src.resolve("results/sub/b.json"), """{"id":"b"}""")
    val checksums = Distribution.writeFileListing(src)
    if (tamperAfterListing)
      Files.writeString(src.resolve("results/a.json"), """{"id":"TAMPERED"}""")
    val enclosed = Distribution.labeledDigest(checksums, "xxh64")

    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(new GZIPOutputStream(bos))
    def add(p: Path, name: String): Unit = {
      val bytes = Files.readAllBytes(p)
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length)
      tar.putArchiveEntry(e)
      tar.write(bytes)
      tar.closeArchiveEntry()
    }
    add(checksums, "checksums")
    add(src.resolve("results/a.json"), "results/a.json")
    add(src.resolve("results/sub/b.json"), "results/sub/b.json")
    tar.close()
    (bos.toByteArray, enclosed)
  }

  private def entryFor(bytes: Array[Byte], enclosed: String,
      built: String = "2024-06-01T00:00:00Z") = {
    val dist = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      "sha256:" + d.map("%02x".format(_)).mkString
    }
    ListingEntry(built, "https://example.invalid/archive.tar.gz", dist, enclosed, 1)
  }

  test("checksums listing is ordered by path, not by digest hex") {
    val src = Files.createTempDirectory("graft-dist-order")
    Files.createDirectories(src.resolve("results/zz"))
    // contents chosen freely: whatever their digests, the listing
    // must come out in path order
    Files.writeString(src.resolve("results/a.json"), """{"id":"alpha"}""")
    Files.writeString(src.resolve("results/m.json"), """{"id":"middle"}""")
    Files.writeString(src.resolve("results/zz/b.json"), """{"id":"last"}""")
    val listing = Distribution.writeFileListing(src)
    val paths = Files.readAllLines(listing).asScala
      .filter(_.nonEmpty).map(_.split("\\s+", 2)(1)).toSeq
    assert(paths == paths.sorted, s"listing not path-ordered: $paths")
    assert(paths == Seq("results/a.json", "results/m.json",
      "results/zz/b.json"))
  }

  test("listing parse + latest-entry pick per distribution version") {
    val dir = Files.createTempDirectory("graft-listing")
    Files.writeString(dir.resolve("listing.json"),
      """{"provider": "wolfi", "available": {
        |  "1": [
        |    {"built": "2024-06-02T00:00:00Z", "url": "https://x/new.tar.gz",
        |     "distribution_checksum": "sha256:aa", "enclosed_checksum": "xxh64:bb"},
        |    {"built": "2024-05-01T00:00:00Z", "url": "https://x/old.tar.gz",
        |     "distribution_checksum": "sha256:cc", "enclosed_checksum": "xxh64:dd"}],
        |  "2": [
        |    {"built": "2024-01-01T00:00:00Z", "url": "https://x/v2.tar.gz",
        |     "distribution_checksum": "sha256:ee", "enclosed_checksum": "xxh64:ff"}]
        |}}""".stripMargin)
    val listing = Distribution.parseListing(spark, dir.resolve("listing.json").toString)
    assert(listing.count() == 3)
    val latest = Distribution.latestEntry(listing, 1).get
    assert(latest.url == "https://x/new.tar.gz" &&
      latest.built == "2024-06-02T00:00:00Z")
    assert(Distribution.latestEntry(listing, 9).isEmpty)
  }

  test("verified import: fetch, checksum, swap, state-based skip") {
    val (bytes, enclosed) = buildArchive()
    val entry = entryFor(bytes, enclosed)
    val ws = Files.createTempDirectory("graft-ws")
    Files.createDirectories(ws.resolve("results"))
    Files.writeString(ws.resolve("results/stale.json"), """{"old":true}""")

    var calls = 0
    val transport = (_: String) => { calls += 1; Response(200, body = bytes) }

    assert(Distribution.importArchive(ws, entry, transport))
    assert(calls == 1)
    // swapped: verified files in, stale results gone
    assert(Files.readString(ws.resolve("results/a.json")) == """{"id":"a"}""")
    assert(Files.exists(ws.resolve("results/sub/b.json")))
    assert(!Files.exists(ws.resolve("results/stale.json")))
    assert(Files.readString(ws.resolve("state.txt")).contains(s"enclosed:$enclosed"))
    Distribution.validateChecksums(ws)

    // same enclosed checksum → skip without fetching
    assert(!Distribution.importArchive(ws, entry, transport))
    assert(calls == 1)
  }

  test("corrupted archive fails the distribution checksum, workspace untouched") {
    val (bytes, enclosed) = buildArchive()
    val entry = entryFor(bytes, enclosed)
    val corrupted = bytes.clone(); corrupted(10) = (corrupted(10) ^ 0xFF).toByte
    val ws = Files.createTempDirectory("graft-ws2")
    val err = intercept[IllegalStateException] {
      Distribution.importArchive(ws, entry,
        _ => Response(200, body = corrupted))
    }
    assert(err.getMessage.contains("archive checksum mismatch"))
    assert(!Files.exists(ws.resolve("results")))
  }

  test("tampered enclosed file fails the per-file validation") {
    val (bytes, enclosed) = buildArchive(tamperAfterListing = true)
    val entry = entryFor(bytes, enclosed)
    val ws = Files.createTempDirectory("graft-ws3")
    val err = intercept[IllegalStateException] {
      Distribution.importArchive(ws, entry, _ => Response(200, body = bytes))
    }
    assert(err.getMessage.contains("has been modified"))
    assert(!Files.exists(ws.resolve("results")))
  }

  test("wrong enclosed checksum in the listing entry is rejected") {
    val (bytes, _) = buildArchive()
    val entry = entryFor(bytes, "xxh64:deadbeef")
    val ws = Files.createTempDirectory("graft-ws4")
    val err = intercept[IllegalStateException] {
      Distribution.importArchive(ws, entry, _ => Response(200, body = bytes))
    }
    assert(err.getMessage.contains("enclosed checksum mismatch"))
  }
}
