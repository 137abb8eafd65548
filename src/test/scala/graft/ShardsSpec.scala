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
}
