package graft.providers

/** Provider catalog mirroring the reference's registry
  * (`src/vunnel/providers/__init__.py:44-74`, 28 providers): every name a
  * vunnel user can `run`, mapped to the graft pipeline family that
  * implements its parse/transform stages. The fetch stage (HTTP/git/OCI)
  * is driver-side infrastructure for all of them; `family` names the
  * Spark pipeline the staged bytes flow through, and `tags` mirror the
  * reference's ALL-of/NONE-of provider selection (T6,
  * `providers/__init__.py:150-183`).
  */
object Registry {

  final case class Spec(
      name: String,
      family: String, // the pipeline implementation family
      source: String, // staged-input format
      tags: Set[String])

  val providers: Seq[Spec] = Seq(
    Spec("alma", "alma", "git:osv-json", Set("os", "osv")),
    Spec("alpine", "secdb", "secdb-json", Set("os")),
    Spec("amazon", "amazon", "rss+html", Set("os")),
    Spec("arch", "arch", "tracker-json", Set("os")),
    Spec("bitnami", "osv", "git:osv-json", Set("application", "osv")),
    // chainguard flips between the secdb and OSV parsers by config
    // (`providers/chainguard/__init__.py:50-70` use_osv); the OSV leg
    // is `providers/ChainguardProvider`, same registered name
    Spec("chainguard", "secdb", "secdb-json|tar:osv-json", Set("os")),
    Spec("chainguard_libraries", "openvex", "openvex-json", Set("application")),
    Spec("debian", "debian", "tracker-json+dsa", Set("os")),
    Spec("echo", "echo", "pkg-cve-map-json", Set("os")),
    Spec("fedora", "fedora", "bodhi-json", Set("os")),
    Spec("github", "ghsa", "graphql-json", Set("application")),
    Spec("govulndb", "osv", "zip:osv-json", Set("application", "osv")),
    Spec("hummingbird", "csaf", "csaf-vex-json", Set("os")),
    Spec("mariner", "mariner", "oval-xml", Set("os")),
    Spec("minimos", "secdb", "secdb-json", Set("os")),
    Spec("nvd", "nvd", "rest-json", Set("nvd")),
    Spec("oracle", "oval", "oval-xml", Set("os")),
    Spec("photon", "photon", "json+wiki-md", Set("os")),
    Spec("rhel", "rhel", "hydra-json+csaf", Set("os")),
    Spec("rocky", "osv", "osv-json", Set("os", "osv")),
    Spec("secureos", "secdb", "secdb-json", Set("os")),
    Spec("sles", "oval", "oval-xml", Set("os")),
    // the OSV-native default emission is `providers/UbuntuProvider`;
    // the OS-schema downconvert compatibility leg stays in OsvProvider
    Spec("ubuntu", "osv", "tar:osv-json+vex", Set("os", "osv")),
    Spec("wolfi", "secdb", "secdb-json", Set("os")),
    // auxiliary decorators
    Spec("kev", "decorator", "rest-json", Set("aux")),
    Spec("epss", "decorator", "csv", Set("aux")),
    Spec("eol", "decorator", "rest-json", Set("aux")))

  val byName: Map[String, Spec] = providers.map(s => s.name -> s).toMap

  /** T6: tag-based selection — ALL of `includes` present, NONE of
    * `excludes` (`providers/__init__.py:150-183`). */
  def select(includes: Set[String], excludes: Set[String] = Set.empty): Seq[Spec] =
    providers.filter(s =>
      includes.subsetOf(s.tags) && s.tags.intersect(excludes).isEmpty)

  /** Plugin duplicate-name resolution
    * (`providers/__init__.py:77-143`): FAIL raises on a name collision
    * with a DIFFERENT spec (the default, historical behavior), REPLACE
    * lets the plugin win, IGNORE keeps the built-in. Re-registering an
    * identical spec is never a conflict in any mode. */
  sealed trait OverrideMode
  object OverrideMode {
    case object Fail extends OverrideMode
    case object Replace extends OverrideMode
    case object Ignore extends OverrideMode
    /** unset/unknown → FAIL, like `PluginOverrideMode.from_env`. */
    def parse(raw: String): OverrideMode =
      raw.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "replace" => Replace
      case "ignore" => Ignore
      case _ => Fail
    }
  }

  /** The built-in catalog merged with `plugins` in registration order
    * under `mode` — a replaced name keeps its original catalog
    * position (dict-replacement semantics); new names append. Later
    * plugins see earlier plugins' registrations, so plugin-vs-plugin
    * collisions follow the same rule. */
  def withPlugins(plugins: Seq[Spec],
      mode: OverrideMode = OverrideMode.Fail): Seq[Spec] =
    plugins.foldLeft(providers) { (catalog, p) =>
      catalog.find(_.name == p.name) match {
        case None => catalog :+ p
        case Some(existing) if existing == p => catalog // same spec: no-op
        case Some(_) => mode match {
          case OverrideMode.Replace =>
            catalog.map(s => if (s.name == p.name) p else s)
          case OverrideMode.Ignore => catalog
          case OverrideMode.Fail => throw new IllegalArgumentException(
            s"provider '${p.name}' is already registered to a different spec")
        }
      }
    }
}
