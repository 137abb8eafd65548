package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source adapters for the reference's scan families (SURVEY §2.1),
  * re-expressed as Spark readers. The HTTP/cursor layers (S1-S4) are
  * driver-side fetch infrastructure by design; what lands here is the
  * *parse* stage each source needs once bytes are staged:
  *
  *  - S10 secdb JSON  → nested packages[].pkg.secfixes{ver → [ids]}
  *  - S6  OVAL XML    → 4 element classes via the built-in XML reader
  *  - S9  EPSS CSV    → '#'-comment header + typed columns
  *  - S7  RSS XML     → rowTag="item" advisory summaries
  */
object Sources {

  /** S10: secdb security.json (wolfi/alpine/chainguard shape, vunnel
    * `providers/wolfi/parser.py:132-160`). One row per (package,
    * fix-version, vuln-id), the A1 explode pipeline:
    * packages[] → secfixes map → whitespace-split multi-CVE strings. */
  def secdb(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    // explicit schema: secfixes has dynamic version keys → MapType
    // (inference would type it as a struct of the versions seen)
    val schema = StructType(Seq(
      StructField("reponame", StringType),
      StructField("urlprefix", StringType),
      StructField("packages", ArrayType(StructType(Seq(
        StructField("pkg", StructType(Seq(
          StructField("name", StringType),
          StructField("secfixes",
            MapType(StringType, ArrayType(StringType))))))))))))
    spark.read.option("multiLine", "true").schema(schema).json(path)
      .select(col("reponame"), explode(col("packages")).as("p"))
      .select(col("reponame"), col("p.pkg.name").as("pkg_name"),
        explode(col("p.pkg.secfixes")).as(Seq("fix_version", "vuln_ids")))
      // secfixes values are arrays of space-separated id strings
      .select(col("reponame"), col("pkg_name"), col("fix_version"),
        explode(col("vuln_ids")).as("vuln_str"))
      .select(col("reponame"), col("pkg_name"), col("fix_version"),
        explode(split(col("vuln_str"), "\\s+")).as("vuln_id"))
      .filter(col("vuln_id") =!= "")
  }

  /** S5/S12: streaming-tar scan (ubuntu OSV `parser.py:190-201,286-302`;
    * govulndb zip is the same shape): walk each archive through a
    * commons-compress stream over `binaryFiles`' PortableDataStream —
    * the archive BYTES are never materialized (no 2 GB binaryFile row
    * cap, no whole-archive byte[] per task; a multi-GB tar reads
    * through an 8 KB buffer), only the MATCHING members' contents are
    * held, per archive, while its row batch is built. A 100-archive
    * corpus fans out one archive per partition across executors.
    * Returns (archive_path, member_name, content_string).
    *
    * `maxMemberBytes` is the hostile-archive bound: a tar header
    * DECLARES each member's size, and a hostile archive (or a gzip
    * bomb, whose embedded tar headers declare the EXPANDED sizes) can
    * declare gigabytes for a kilobyte of input — the walk refuses such
    * members loudly before buffering a byte, and the read loop
    * enforces the same cap against streams that lie. */
  def tarMembers(spark: SparkSession, path: String,
      memberGlob: String = "*",
      maxMemberBytes: Long = 1L << 28): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("archive", StringType),
      StructField("member", StringType),
      StructField("content", StringType)))
    val rows = tarMemberBytes(spark, path, memberGlob, maxMemberBytes)
      .map { case (archive, member, bytes) =>
        Row(archive, member, new String(bytes, "UTF-8"))
      }
    spark.createDataFrame(rows, schema)
  }

  /** [[tarMembers]] with the members' RAW bytes (binary payloads —
    * the read side of WebDataset-style multimodal shards, where a
    * UTF-8 round-trip would corrupt image/audio content). */
  def tarMembersBinary(spark: SparkSession, path: String,
      memberGlob: String = "*",
      maxMemberBytes: Long = 1L << 28): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("archive", StringType),
      StructField("member", StringType),
      StructField("content", BinaryType)))
    val rows = tarMemberBytes(spark, path, memberGlob, maxMemberBytes)
      .map { case (archive, member, bytes) => Row(archive, member, bytes) }
    spark.createDataFrame(rows, schema)
  }

  private def tarMemberBytes(spark: SparkSession, path: String,
      memberGlob: String, maxMemberBytes: Long)
      : org.apache.spark.rdd.RDD[(String, String, Array[Byte])] = {
    val regex = ("^" + java.util.regex.Pattern.quote(memberGlob)
      .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q") + "$").r
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (archive, pds) =>
        // gzip auto-detect by magic bytes: the OSV feeds ship both bare
        // .tar trees and .tar.gz archives (chainguard's osv url)
        val bis = new java.io.BufferedInputStream(pds.open(), 1 << 16)
        bis.mark(2)
        val b0 = bis.read(); val b1 = bis.read()
        bis.reset()
        val in: java.io.InputStream =
          if (b0 == 0x1f && b1 == 0x8b)
            new org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream(bis)
          else bis
        val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
          in, "UTF-8") // member-name decode independent of executor locale
        // eager per-archive member list + close in finally: a lazy
        // iterator would leak the underlying filesystem handle
        // whenever a downstream limit stops consuming mid-archive
        try {
          Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
            .filter(e => !e.isDirectory && regex.matches(e.getName))
            .map { e =>
              // refusal, not OOM: the DECLARED size gates before any
              // buffering (covers gzip bombs — the embedded tar header
              // declares the expanded size), and the read loop enforces
              // the same cap against a stream that contradicts its
              // header
              require(e.getSize <= maxMemberBytes,
                s"tar member ${e.getName} in $archive declares " +
                  s"${e.getSize} bytes > the $maxMemberBytes cap - " +
                  "a hostile or mis-packed archive; raise " +
                  "maxMemberBytes deliberately if the member is real")
              val out = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = tin.read(buf)
              while (n > 0) {
                require(out.size.toLong + n <= maxMemberBytes,
                  s"tar member ${e.getName} in $archive exceeds the " +
                    s"$maxMemberBytes cap mid-read - stream contradicts " +
                    "its own header")
                out.write(buf, 0, n); n = tin.read(buf)
              }
              (archive, e.getName, out.toByteArray)
            }.toList
        } finally tin.close()
      }
  }

  /** S6: OVAL XML — the 4 element classes the reference's streaming
    * parser collects (`utils/oval_v2.py:443-494`), each as a DataFrame
    * scan with its own rowTag (column pruning happens at the XML reader
    * instead of iterparse+clear). Join them with J8's chained equi-joins. */
  def ovalDefinitions(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r = spark.read.format("xml").option("rowTag", "definition")
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  def ovalTests(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "rpminfo_test").load(path)

  def ovalObjects(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "rpminfo_object").load(path)

  def ovalStates(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "rpminfo_state").load(path)

  /** S9: EPSS CSV with '#' comment header carrying score_date
    * (`providers/epss/manager.py:46-134`): comment rows skipped by the
    * reader; the score_date is read once driver-side from the head —
    * through the Hadoop FileSystem API, so the probe accepts the same
    * URIs/globs the CSV reader beside it does (a local-only
    * Source.fromFile would fail the whole scan for an s3a:// or glob
    * path before the read was ever attempted). */
  def epss(spark: SparkSession, path: String): DataFrame = {
    val scoreDate = {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a glob scans many files but one comment header dates them all:
      // probe the first match (files carry at most one score_date)
      val first = fs.globStatus(hp) match {
        case null => hp
        case arr if arr.nonEmpty => arr.head.getPath
        case _ => hp
      }
      val in = fs.open(first)
      val src = scala.io.Source.fromInputStream(in)
      try src.getLines().take(5).find(_.startsWith("#"))
        .flatMap(l => "score_date:(\\S+)".r.findFirstMatchIn(l).map(_.group(1)))
        .orNull
      finally { src.close(); in.close() }
    }
    spark.read.option("comment", "#").option("header", "true")
      .option("inferSchema", "true").csv(path)
      .withColumn("score_date", lit(scoreDate))
  }

  /** S7: RSS feed (amazon ALAS shape, `providers/amazon/parser.py:86-114`):
    * one row per <item>, summary fields projected + typed. */
  def rss(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "item").load(path)
      .select(col("title"), col("link"),
        regexp_extract(col("title"), "(ALAS[0-9-]*)", 1).as("alas_id"),
        regexp_extract(col("title"), "\\((\\w+)\\)", 1).as("severity"),
        col("pubDate"))

  /** S11: git-repo scan (alma/photon/bitnami: `providers/alma/parser.py:
    * 29,56-101`) — the clone/pull is a driver-side staging step (like
    * every fetch); the scan over the checked-out worktree is this:
    * recursive JSON read with a glob, path retained so records can be
    * keyed/sliced by repo layout (e.g. `osv/cve/2023/...`). */
  def repoJson(spark: SparkSession, worktree: String,
      glob: String = "*.json"): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .json(worktree)
      .withColumn("source_path", input_file_name())
}
