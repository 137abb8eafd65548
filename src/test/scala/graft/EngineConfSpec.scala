package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the centralized engine-config layer (r17): the set of
  * performance configs every entry point's session must carry, and
  * that a [[EngineConf.tuned]]-built session actually reports them.
  * Bench, Verify, Cli, StageProfile, ExplainDump and the shared test
  * session all build through EngineConf.tuned — a config present here
  * but missing from a session means an entry point bypassed the layer
  * (the r16 verdict's finding: Cli sessions silently lost the
  * ObjectHashAggregate hash path at 128 keys). */
class EngineConfSpec extends AnyFunSuite {

  test("settings carry the engine's three performance configs") {
    val m = EngineConf.settings.toMap
    assert(m("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      === (1 << 22).toString)
    assert(m("spark.sql.adaptive.coalescePartitions.minPartitionSize")
      === "64k")
    assert(m("spark.sql.session.timeZone") === "UTC")
  }

  test("a tuned session reports every EngineConf setting") {
    val spark = SparkTestSession.spark // built via EngineConf.tuned
    for ((k, v) <- EngineConf.settings)
      assert(spark.conf.get(k) === v, s"session lost $k")
  }
}
