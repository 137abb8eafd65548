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
    Spec("chainguard", "secdb", "secdb-json", Set("os")),
    Spec("chainguard_libraries", "passthrough", "openvex-json", Set("application")),
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
}
