package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RpmVersion._

/** Pins the reference's EVR semantics (vunnel tests/unit/utils/test_rpm.py)
  * and checks the sort-key encoding agrees with the comparator. */
class RpmVersionSpec extends AnyFunSuite {

  // (a, b, expected sign) — the reference's parametrized fixture table.
  val cases: Seq[(String, String, Int)] = Seq(
    ("1", "1", 0),
    ("4.19.0a-1.el7_5", "4.19.0c-1.el7", -1),
    ("4.19.0-1.el7_5", "4.21.0-1.el7", -1),
    ("4.19.01-1.el7_5", "4.19.10-1.el7_5", -1),
    ("4.19.0-1.el7_5", "4.19.0-1.el7", 1),
    ("4.19.0-1.el7_5", "4.17.0-1.el7", 1),
    ("4.19.01-1.el7_5", "4.19.1-1.el7_5", 0),
    ("4.19.1-1.el7_5", "4.19.1-01.el7_5", 0),
    ("4.19.1", "4.19.1", 0),
    ("1.2.3-el7_5~snapshot1", "1.2.3-3-el7_5", -1),
    ("1:0", "0:1", 1),
    ("1:0", "1", -1),
    ("1:2", "1", 1),
    ("2:4.19.01-1.el7_5", "4.19.1-1.el7_5", 0),
    ("4.19.01-1.el7_5", "2:4.19.1-1.el7_5", 0),
    ("0:4.19.1-1.el7_5", "2:4.19.1-1.el7_5", -1),
    ("4.19.0-1.el7_5", "12:4.19.0-1.el7", 1),
    ("3:4.19.0-1.el7_5", "4.21.0-1.el7", -1),
    ("4:1.2.3-3-el7_5", "1.2.3-el7_5~snapshot1", 1),
  )

  test("compareVersions matches the reference fixture table") {
    for ((a, b, exp) <- cases)
      assert(compareVersions(a, b) == exp, s"compare($a, $b)")
  }

  test("compareVersions is antisymmetric on the fixture table") {
    for ((a, b, exp) <- cases)
      assert(compareVersions(b, a) == -exp, s"compare($b, $a)")
  }

  test("splitFullVersion") {
    assert(splitFullVersion("2.27-34.base.el7") == (null, "2.27", "34.base.el7"))
    assert(splitFullVersion("1:2.27-34.base.el7") == ("1", "2.27", "34.base.el7"))
    assert(splitFullVersion("1.2.3") == (null, "1.2.3", null))
    assert(splitFullVersion("1.2.3-3-el7") == (null, "1.2.3-3", "el7"))
  }

  // Deterministic pseudo-random version generator (no scalatestplus in the
  // offline cache, so properties are hand-rolled over a seeded stream).
  private def randomVersions(n: Int, seed: Long): IndexedSeq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphaSegs = Vector("a", "b", "rc", "alpha", "el7", "el7_5", "0a", "00",
      "snapshot1", "base", "ga", "beta2")
    val rels = Vector("1.el7", "34.base.el7", "0", "123a", "2.el9_2", "el7_5~snapshot1")
    (0 until n).map { _ =>
      val nSeg = 1 + rnd.nextInt(4)
      val segs = (0 until nSeg).map { _ =>
        if (rnd.nextBoolean()) rnd.nextInt(1000).toString
        else alphaSegs(rnd.nextInt(alphaSegs.length))
      }
      val v = segs.mkString(".")
      val withRel = if (rnd.nextBoolean()) s"$v-${rels(rnd.nextInt(rels.length))}" else v
      if (rnd.nextBoolean()) s"${rnd.nextInt(13)}:$withRel" else withRel
    }
  }

  private def norm(s: String) = if (s.contains(':')) s else s"0:$s"

  test("sortKey string order agrees with compareVersions (epoch-normalized)") {
    // sortKey treats missing epoch as "0"; compare against the reference
    // comparator on epoch-normalized strings, where the order IS total.
    val vs = randomVersions(400, 42L)
    for (a <- vs; b <- vs) {
      val keyCmp = Integer.signum(sortKey(a).compareTo(sortKey(b)))
      val refCmp = compareVersions(norm(a), norm(b))
      assert(keyCmp == refCmp,
        s"a=$a key=${sortKey(a)}  b=$b key=${sortKey(b)}  ref=$refCmp key=$keyCmp")
    }
  }

  test("comparator is transitive on generated triples") {
    val vs = randomVersions(60, 7L)
    for (a <- vs; b <- vs; c <- vs) {
      val (na, nb, nc) = (norm(a), norm(b), norm(c))
      if (compareVersions(na, nb) <= 0 && compareVersions(nb, nc) <= 0)
        assert(compareVersions(na, nc) <= 0, s"$a <= $b <= $c")
    }
  }
}
