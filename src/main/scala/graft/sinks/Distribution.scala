package graft.sinks

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform
import graft.sources.StagedFetch

/** Distribution-archive verification + swap — the import-results
  * protocol (vunnel `distribution.py:16-84`, `provider.py:215-269,
  * 357-378`, `workspace.py:234-265`):
  *
  *  1. parse the listing document; pick the newest entry (by `built`)
  *     for the wanted distribution version
  *  2. skip when the workspace state already carries the entry's
  *     enclosed checksum (`_has_newer_archive`)
  *  3. fetch the archive (injected transport, [[StagedFetch]] retry
  *     envelope), verify the labeled `distribution_checksum` over the
  *     archive bytes, and extract to a temp dir
  *  4. verify the enclosed checksums file's own digest, then every
  *     file it lists (`validate_checksums`)
  *  5. swap the verified results into the workspace atomically and
  *     record the state
  *
  * Checksums are labeled `algorithm:hex` with xxh64 (Spark's XXH64
  * kernel, seed 42 like the SQL `xxhash64`) and sha256 registered.
  */
object Distribution {

  final case class ListingEntry(built: String, url: String,
      distributionChecksum: String, enclosedChecksum: String,
      distributionVersion: Int)

  // ---- labeled digests ---------------------------------------------------

  private def xxh64(bytes: Array[Byte]): String = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    java.lang.Long.toHexString(h)
  }

  private def sha256(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** `algorithm:hex` over a file, dispatched on the label. */
  def labeledDigest(p: Path, algorithm: String): String = {
    val bytes = Files.readAllBytes(p)
    algorithm match {
      case "xxh64" => s"xxh64:${xxh64(bytes)}"
      case "sha256" => s"sha256:${sha256(bytes)}"
      case other => throw new IllegalArgumentException(s"unknown algorithm: $other")
    }
  }

  private def algorithmOf(labeled: String): String = labeled.split(":", 2)(0)

  // ---- listing document ----------------------------------------------------

  /** Listing rows from the document's `available` map:
    * (distribution_version, built, url, distribution_checksum,
    * enclosed_checksum). */
  def parseListing(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "provider STRING, available MAP<STRING, ARRAY<STRUCT<built: STRING, " +
        "url: STRING, distribution_checksum: STRING, " +
        "enclosed_checksum: STRING>>>")
    spark.read.option("multiLine", "true").schema(schema).json(path)
      .select(col("provider"), explode(col("available")).as(Seq("ver", "entries")))
      .select(col("provider"), col("ver").cast("int").as("distribution_version"),
        explode(col("entries")).as("e"))
      .select(col("provider"), col("distribution_version"),
        col("e.built").as("built"), col("e.url").as("url"),
        col("e.distribution_checksum").as("distribution_checksum"),
        col("e.enclosed_checksum").as("enclosed_checksum"))
  }

  /** Newest entry (by `built`) for the distribution version; None when
    * the version has no entries (`latest_entry`, distribution.py:65-73). */
  def latestEntry(listing: DataFrame, version: Int): Option[ListingEntry] =
    listing.filter(col("distribution_version") === version)
      .orderBy(col("built").desc).limit(1).collect().headOption
      .map(r => ListingEntry(r.getAs[String]("built"), r.getAs[String]("url"),
        r.getAs[String]("distribution_checksum"),
        r.getAs[String]("enclosed_checksum"), version))

  // ---- workspace checksums (`workspace.py:234-281`) ----------------------

  /** Write the `checksums` listing for `resultsDir`: one
    * `<xxh64-hex>  <results/relpath>` line per file, paths sorted.
    * Returns the listing file path. */
  def writeFileListing(workspaceDir: Path, resultsDirName: String = "results"): Path = {
    val resultsDir = workspaceDir.resolve(resultsDirName)
    // sort by PATH, then format — sorting the formatted lines would
    // order the listing by digest hex (the digest is the line prefix),
    // violating the paths-sorted contract the reference's checksums
    // file follows
    val lines = Files.walk(resultsDir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(f => resultsDirName + "/" + resultsDir.relativize(f).toString -> f)
      .toSeq.sortBy(_._1)
      .map { case (rel, f) => s"${xxh64(Files.readAllBytes(f))}  $rel" }
    val out = workspaceDir.resolve("checksums")
    Files.writeString(out, lines.mkString("", "\n", "\n"))
    out
  }

  /** Verify every file the checksums listing names: missing or modified
    * files throw (`validate_checksums`, workspace.py:234-254). */
  def validateChecksums(workspaceDir: Path): Unit = {
    val listing = workspaceDir.resolve("checksums")
    require(Files.exists(listing), s"no checksums listing in $workspaceDir")
    Files.readAllLines(listing).asScala.filter(_.nonEmpty).foreach { line =>
      val Array(digest, rel) = line.split("\\s+", 2)
      val f = workspaceDir.resolve(rel.trim)
      if (!Files.exists(f))
        throw new IllegalStateException(s"file $rel does not exist")
      if (xxh64(Files.readAllBytes(f)) != digest)
        throw new IllegalStateException(s"file $rel has been modified")
    }
  }

  // ---- import protocol -----------------------------------------------------

  private def stateFile(ws: Path): Path = ws.resolve("state.txt")

  /** True when the workspace state does not already carry the entry's
    * enclosed checksum (`_has_newer_archive`, provider.py:241-257). */
  def hasNewerArchive(workspaceDir: Path, entry: ListingEntry): Boolean = {
    val st = stateFile(workspaceDir)
    !Files.exists(st) || !Files.readAllLines(st).asScala
      .exists(_ == s"enclosed:${entry.enclosedChecksum}")
  }

  /** Fetch → verify → extract → validate → swap. Returns true when the
    * archive was imported, false when the state was already current. */
  def importArchive(workspaceDir: Path, entry: ListingEntry,
      transport: StagedFetch.Transport,
      cfg: StagedFetch.Config = StagedFetch.Config(),
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong)): Boolean = {
    if (!hasNewerArchive(workspaceDir, entry)) return false

    val tmp = Files.createTempDirectory("graft-dist")
    try {
      // fetch + distribution checksum over the archive bytes
      val archiveBytes = StagedFetch.get(entry.url, transport, cfg, sleeper).body
      val algo = algorithmOf(entry.distributionChecksum)
      val actual = algo match {
        case "xxh64" => s"xxh64:${xxh64(archiveBytes)}"
        case "sha256" => s"sha256:${sha256(archiveBytes)}"
        case other => throw new IllegalArgumentException(s"unknown algorithm: $other")
      }
      if (actual != entry.distributionChecksum)
        throw new IllegalStateException(
          s"archive checksum mismatch: $actual != ${entry.distributionChecksum}")

      // extract tar.gz
      val unarchived = tmp.resolve("unarchived")
      val tin = new TarArchiveInputStream(
        new GZIPInputStream(new ByteArrayInputStream(archiveBytes)))
      Iterator.continually(tin.getNextEntry).takeWhile(_ != null).foreach { e =>
        val dest = unarchived.resolve(e.getName).normalize()
        require(dest.startsWith(unarchived), s"path traversal: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(dest)
        else {
          Files.createDirectories(dest.getParent)
          val out = new FileOutputStream(dest.toFile)
          try {
            val buf = new Array[Byte](8192)
            var n = tin.read(buf)
            while (n > 0) { out.write(buf, 0, n); n = tin.read(buf) }
          } finally out.close()
        }
      }

      // enclosed checksum = digest of the checksums file itself, then
      // validate every listed file
      val enclosedAlgo = algorithmOf(entry.enclosedChecksum)
      val enclosedActual = labeledDigest(unarchived.resolve("checksums"), enclosedAlgo)
      if (enclosedActual != entry.enclosedChecksum)
        throw new IllegalStateException(
          s"enclosed checksum mismatch: $enclosedActual != ${entry.enclosedChecksum}")
      validateChecksums(unarchived)

      // swap (`replace_results`, workspace.py:256-265) — staged so the
      // workspace is never without a results dir for longer than two
      // same-filesystem renames: the verified tree lands in the
      // workspace as results.incoming FIRST (the only possibly-slow
      // step — the temp dir can be a different filesystem, where a
      // direct move of a non-empty dir either throws or degrades to a
      // long copy inside the swap window), THEN old→aside and
      // incoming→results are both atomic renames. The state file is
      // written before the aside copy is deleted, so a crash at any
      // point leaves either the old tree (in place or at results.old)
      // or the new one recoverable on disk.
      Files.createDirectories(workspaceDir)
      val incoming = workspaceDir.resolve("results.incoming")
      deleteRecursive(incoming)
      moveTree(unarchived.resolve("results"), incoming)
      val oldResults = workspaceDir.resolve("results")
      val aside = workspaceDir.resolve("results.old")
      deleteRecursive(aside)
      if (Files.exists(oldResults))
        Files.move(oldResults, aside, StandardCopyOption.ATOMIC_MOVE)
      Files.move(incoming, oldResults, StandardCopyOption.ATOMIC_MOVE)
      Files.copy(unarchived.resolve("checksums"),
        workspaceDir.resolve("checksums"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.writeString(stateFile(workspaceDir),
        s"enclosed:${entry.enclosedChecksum}\nbuilt:${entry.built}\nstale:true\n")
      deleteRecursive(aside)
      true
    } finally deleteRecursive(tmp)
  }

  /** Move a directory tree; when the rename fails (cross-filesystem —
    * a non-empty dir cannot be renamed across stores), fall back to
    * copy-then-delete. */
  private def moveTree(src: Path, dst: Path): Unit =
    try Files.move(src, dst)
    catch {
      case _: java.io.IOException =>
        Files.walk(src).iterator().asScala.foreach { f =>
          val d = dst.resolve(src.relativize(f))
          if (Files.isDirectory(f)) Files.createDirectories(d)
          else {
            Files.createDirectories(d.getParent)
            Files.copy(f, d, StandardCopyOption.REPLACE_EXISTING)
          }
        }
        deleteRecursive(src)
    }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
}
