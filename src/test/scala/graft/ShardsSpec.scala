package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Shards

/** The training-shard writer: deterministic shuffle → token packing →
  * shard-partitioned layout, audited via its own manifest. */
class ShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("shards are consecutive, token-bounded, and lossless") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val budget = 2048L
    val perShard = 8L
    val m = Shards.writeTrainingShards(docs, "doc_id", "text", out,
      tokensPerBin = budget, binsPerShard = perShard).collect()
    val shards = m.map(_.getLong(0))
    assert(shards.toSeq == shards.indices.map(_.toLong),
      "shard ids not consecutive from 0")
    assert(m.map(_.getLong(1)).sum == docs.count(), "documents lost")
    val maxDoc = docs
      .select(max(graft.functions.Text.token_count(col("text"))))
      .head().getInt(0).toLong
    // a bin can overflow by at most one document's tokens; all shards
    // but the last must be (close to) full
    m.dropRight(1).foreach { r =>
      val t = r.getLong(2)
      assert(t <= perShard * (budget + maxDoc), s"shard ${r.getLong(0)} fat")
      assert(t >= perShard * (budget - maxDoc), s"shard ${r.getLong(0)} thin")
    }
    // layout readable shard-at-a-time
    val s0 = spark.read.parquet(s"$out/shard=0")
    assert(s0.count() == m.head.getLong(1))
  }

  test("shard assignment is rerun-stable; a new seed reshuffles") {
    val o1 = java.nio.file.Files.createTempDirectory("shards").toString
    val o2 = java.nio.file.Files.createTempDirectory("shards").toString
    val o3 = java.nio.file.Files.createTempDirectory("shards").toString
    Shards.writeTrainingShards(docs, "doc_id", "text", o1)
    Shards.writeTrainingShards(docs, "doc_id", "text", o2)
    Shards.writeTrainingShards(docs, "doc_id", "text", o3, seed = 7L)
    def assign(p: String) = spark.read.parquet(p)
      .select(col("doc_id"), col("shard").cast("long"), col("seq_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val a1 = assign(o1)
    assert(a1 == assign(o2), "rerun changed the shard layout")
    assert(a1 != assign(o3), "seed did not permute the pack order")
  }

  /** (key, binary payload incl. bytes invalid as UTF-8, json string)
    * — the multimodal sample shape. */
  private def mediaSamples = {
    import spark.implicits._
    (0 until 40).map { i =>
      val payload = Array.tabulate[Byte](50 + i * 7)(j =>
        ((i * 31 + j * 131 + 0x80) & 0xff).toByte) // high bytes on purpose
      (f"sample-$i%04d", payload, s"""{"id":$i}""")
    }.toDF("key", "img", "meta")
  }

  test("jsonl shards: gzip object-per-line layout, lossless round-trip, " +
      "manifest identical to the parquet writer's") {
    val outJ = java.nio.file.Files.createTempDirectory("jshards").toString
    val outP = java.nio.file.Files.createTempDirectory("pshards").toString
    val mJ = Shards.writeJsonlShards(docs, "doc_id", "text", outJ,
      tokensPerBin = 2048, binsPerShard = 8).collect()
    val mP = Shards.writeTrainingShards(docs, "doc_id", "text", outP,
      tokensPerBin = 2048, binsPerShard = 8).collect()
    // same packing discipline → the SAME manifest, format-independent
    assert(mJ.map(_.toSeq).toSeq == mP.map(_.toSeq).toSeq)
    // the files at rest are gzipped json
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(outJ))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .toArray.map(_.toString)
    assert(files.nonEmpty && files.forall(_.endsWith(".json.gz")),
      s"expected .json.gz parts, got ${files.take(3).mkString(",")}")
    // lossless: every (doc_id, text) survives the round-trip through
    // the library's OWN read path (explicit schema, like the writer)
    val schema = spark.read.parquet(s"$outP").schema
    val back = spark.read.schema(schema).json(outJ)
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == orig)
  }

  test("tar shards round-trip bytes exactly and respect the byte budget") {
    val out = java.nio.file.Files.createTempDirectory("webds").toString
    val m = Shards.writeTarShards(mediaSamples, "key",
      Seq("img" -> "bin", "meta" -> "json"), out,
      bytesPerShard = 8192L).collect()
    assert(m.length > 1, "budget should force multiple shards")
    assert(m.map(_.getLong(2)).sum == 40L, "samples lost")
    // every shard except possibly the last stays within budget + one
    // sample's tar cost (a sample is never split) + tar trailer/record
    // padding (two 512 B zero blocks, 10240 B record rounding)
    val maxSample = 2 * 512 + ((50 + 39 * 7 + 511) / 512) * 512 + 512
    m.foreach { r =>
      assert(r.getLong(3) <= 8192L + maxSample + 10240,
        s"shard ${r.getLong(0)} overshoots its byte budget") }
    // read back through the library's own binary tar scan
    val members = graft.sources.Sources
      .tarMembersBinary(spark, s"$out/shard-*.tar")
      .collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]](2).toSeq).toMap
    val expected = mediaSamples.collect().flatMap { r =>
      Seq(s"${r.getString(0)}.bin" -> r.getAs[Array[Byte]](1).toSeq,
        s"${r.getString(0)}.json" ->
          r.getString(2).getBytes("UTF-8").toSeq)
    }.toMap
    assert(members == expected, "member contents differ after round-trip")
    // manifest sha256 matches the bytes actually on disk
    m.foreach { r =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(r.getString(1)))
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(sha == r.getString(4), s"shard ${r.getLong(0)} sha drift")
    }
  }

  test("tar shard reruns are byte-identical; null payloads skip members") {
    val o1 = java.nio.file.Files.createTempDirectory("webds").toString
    val o2 = java.nio.file.Files.createTempDirectory("webds").toString
    val pay = Seq("img" -> "bin", "meta" -> "json")
    val s1 = Shards.writeTarShards(mediaSamples, "key", pay, o1, 8192L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val s2 = Shards.writeTarShards(mediaSamples, "key", pay, o2, 8192L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(s1 == s2, "rerun produced different shard bytes")

    import spark.implicits._
    val withNull = Seq(
      ("a", Array[Byte](1, 2, 3), """{"k":"a"}"""),
      ("b", null.asInstanceOf[Array[Byte]], """{"k":"b"}"""))
      .toDF("key", "img", "meta")
    val o3 = java.nio.file.Files.createTempDirectory("webds").toString
    Shards.writeTarShards(withNull, "key", pay, o3).collect()
    val names = graft.sources.Sources
      .tarMembersBinary(spark, s"$o3/shard-*.tar")
      .select("member").collect().map(_.getString(0)).toSet
    assert(names == Set("a.bin", "a.json", "b.json"),
      "null payload should skip exactly its member")
  }

  test("tar shard rerun into the same dir clears stale shards") {
    val out = java.nio.file.Files.createTempDirectory("webds").toString
    val pay = Seq("img" -> "bin", "meta" -> "json")
    val many = Shards.writeTarShards(mediaSamples, "key", pay, out, 8192L)
      .count()
    assert(many > 1)
    // bigger budget → fewer shards; the old ones must be GONE
    val few = Shards.writeTarShards(mediaSamples, "key", pay, out, 1L << 20)
      .collect()
    val onDisk = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.endsWith(".tar")).sorted.toSeq
    assert(onDisk == few.map(r => new java.io.File(r.getString(1)).getName)
      .sorted.toSeq, "stale shards from the previous run survived")
    assert(onDisk.size < many)
  }

  test("duplicate keys and non-ASCII keys stay deterministic and readable") {
    import spark.implicits._
    // two rows per key with DIFFERENT payloads (the content tie-break),
    // keys containing non-ASCII (UTF-8 name path)
    val dup = (0 until 12).map { i =>
      (s"clé-日本-${i / 2}", Array.tabulate[Byte](64)(j =>
        ((i * 37 + j) & 0xff).toByte), s"""{"i":$i}""")
    }.toDF("key", "img", "meta")
    val pay = Seq("img" -> "bin", "meta" -> "json")
    def shas(p: String) =
      Shards.writeTarShards(dup, "key", pay, p, 4096L)
        .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val o1 = java.nio.file.Files.createTempDirectory("webds").toString
    val o2 = java.nio.file.Files.createTempDirectory("webds").toString
    assert(shas(o1) == shas(o2),
      "duplicate-key corpus produced rerun-unstable shard bytes")
    // every sample readable back under its UTF-8 name, both copies kept
    val members = graft.sources.Sources
      .tarMembersBinary(spark, s"$o1/shard-*.tar")
      .select("member").collect().map(_.getString(0))
    assert(members.count(_ == "clé-日本-0.bin") == 2,
      "duplicate-key samples lost or name mangled")
  }
}
