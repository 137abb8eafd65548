package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame

/** Golden-snapshot harness (reference `tests/conftest.py:204-244`):
  * every result envelope is rendered as canonical JSON (key-sorted,
  * 2-space-indented, trailing newline — the orjson OPT_SORT_KEYS |
  * OPT_INDENT_2 | OPT_APPEND_NEWLINE convention, `conftest.py:221-224`)
  * and byte-compared against a committed snapshot file. The assertion
  * fails on BOTH missing snapshot files and committed snapshots the
  * run did not produce — exactly the reference's two failure lists.
  *
  * Re-record with GRAFT_SNAPSHOT_UPDATE=1 (the reference's
  * `--snapshot-update` flag): the provider's snapshot dir is wiped and
  * rewritten, so stale files can't linger.
  */
object Golden {
  private val mapper = new ObjectMapper()
  val root: Path =
    Paths.get(sys.props("user.dir"), "src", "test", "resources", "snapshots")
  val update: Boolean = sys.env.get("GRAFT_SNAPSHOT_UPDATE").contains("1")

  /** Canonical bytes for a JSON document string. */
  def canonical(json: String): String = render(mapper.readTree(json), 0) + "\n"

  private def render(n: JsonNode, depth: Int): String = {
    val pad = "  " * (depth + 1)
    val close = "  " * depth
    if (n.isObject) {
      val names = n.fieldNames.asScala.toSeq.sorted
      if (names.isEmpty) "{}"
      else names.map(k =>
        s"$pad${mapper.writeValueAsString(k)}: ${render(n.get(k), depth + 1)}")
        .mkString("{\n", ",\n", s"\n$close}")
    } else if (n.isArray) {
      val elems = n.elements.asScala.toSeq
      if (elems.isEmpty) "[]"
      else elems.map(e => pad + render(e, depth + 1))
        .mkString("[\n", ",\n", s"\n$close]")
    } else n.toString // scalar: compact JSON (strings escaped by Jackson)
  }

  /** Snapshot-relative path of an envelope: the identifier keeps its
    * "/" (namespace directory, like the reference's flat-file store
    * layout) and maps ":" to "_" for portability. */
  private def relPath(identifier: String): String =
    identifier.replace(":", "_") + ".json"

  /** Assert `envelopes` (identifier, schema, item) against the
    * committed snapshots under `snapshots/<provider>/`. */
  def assertSnapshots(provider: String, envelopes: DataFrame): Unit = {
    val dir = root.resolve(provider)
    val rows = envelopes.select("identifier", "schema", "item").collect()
    // zero envelopes must FAIL, not pass vacuously: an empty result in
    // update mode would wipe the provider's snapshot dir and record
    // nothing, after which every run compares ∅ to ∅ and goes green
    // with zero golden coverage
    require(rows.nonEmpty,
      s"$provider produced ZERO envelopes — regression or wrong fixture")
    val produced = rows.map { r =>
      val doc = "{" +
        "\"identifier\":" + mapper.writeValueAsString(r.getString(0)) + "," +
        "\"item\":" + r.getString(2) + "," +
        "\"schema\":" + mapper.writeValueAsString(r.getString(1)) + "}"
      relPath(r.getString(0)) -> canonical(doc)
    }.toMap
    require(produced.size == rows.length,
      s"$provider: duplicate identifiers in result set")

    if (update) {
      deleteRecursive(dir)
      produced.foreach { case (rel, bytes) =>
        val p = dir.resolve(rel)
        Files.createDirectories(p.getParent)
        Files.writeString(p, bytes)
      }
      return
    }

    val committed: Set[String] =
      if (!Files.exists(dir)) Set.empty
      else Files.walk(dir).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => dir.relativize(p).toString).toSet

    val missing = produced.keySet.diff(committed).toSeq.sorted
    val unasserted = committed.diff(produced.keySet).toSeq.sorted
    val mismatched = produced.toSeq.sorted.collect {
      case (rel, bytes) if committed(rel) &&
        Files.readString(dir.resolve(rel)) != bytes => rel
    }

    val lines = Seq(
      if (missing.nonEmpty)
        s"missing snapshot files (run with GRAFT_SNAPSHOT_UPDATE=1):\n" +
          missing.map("  - " + _).mkString("\n") else "",
      if (unasserted.nonEmpty)
        s"existing snapshot files that were not asserted:\n" +
          unasserted.map("  - " + _).mkString("\n") else "",
      if (mismatched.nonEmpty)
        s"snapshot byte mismatches:\n" +
          mismatched.map("  - " + _).mkString("\n") else ""
    ).filter(_.nonEmpty)
    if (lines.nonEmpty)
      throw new AssertionError(s"[$provider]\n" + lines.mkString("\n"))
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
}
