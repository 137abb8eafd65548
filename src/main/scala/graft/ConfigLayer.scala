package graft

import scala.jdk.CollectionConverters._

/** Application-config layer (reference: `src/vunnel/cli/config.py` +
  * the `vunnel config` command, `cli/cli.py:93-130`): per-provider
  * runtime defaults, deep-merged with an optional YAML file and
  * `GRAFT_<PROVIDER>_<FIELD>` environment overrides, rendered as
  * block-style YAML with policy enums as plain strings (the reference's
  * IndentDumper + enum_asdict_factory behavior).
  */
object ConfigLayer {

  /** The reference's per-provider runtime defaults
    * (`provider.RuntimeConfig`): state policies + on-error policy. */
  def providerDefaults: Map[String, Any] = Map(
    "existing_input" -> "keep",
    "existing_results" -> "delete-before-write",
    "on_error" -> Map(
      "action" -> "fail",
      "retry_count" -> 3,
      "retry_delay" -> 5,
      "input" -> "keep",
      "results" -> "keep").asInstanceOf[Any],
    "request_timeout" -> 125,
    "import_results" -> Map(
      "enabled" -> false,
      "host" -> "",
      "path" -> "providers/{provider_name}/listing.json").asInstanceOf[Any])

  def defaults(providers: Seq[String]): Map[String, Any] = Map(
    "root" -> "./data",
    "log" -> Map("level" -> "INFO").asInstanceOf[Any],
    "providers" -> providers.sorted.map(p => p -> providerDefaults).toMap
      .asInstanceOf[Any])

  /** Right-biased deep merge (maps merge recursively, scalars replace) —
    * the reference's mergedeep semantics. */
  def merge(base: Map[String, Any], over: Map[String, Any]): Map[String, Any] =
    (base.keySet ++ over.keySet).map { k =>
      k -> ((base.get(k), over.get(k)) match {
        case (Some(b: Map[_, _]), Some(o: Map[_, _])) =>
          merge(b.asInstanceOf[Map[String, Any]],
            o.asInstanceOf[Map[String, Any]])
        case (_, Some(o)) => o
        case (Some(b), None) => b
        case _ => null
      })
    }.toMap

  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> fromJava(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(fromJava).toList
    case other => other
  }

  /** Parse a YAML config file into the nested-map model. */
  def loadYaml(path: String): Map[String, Any] = {
    val src = scala.io.Source.fromFile(path)
    try {
      val parsed = new org.yaml.snakeyaml.Yaml().load[Any](src.mkString)
      fromJava(parsed) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      }
    } finally src.close()
  }

  /** Environment overrides: GRAFT_<PROVIDER>_<FIELD>=value sets
    * providers.<provider>.<field> (field lowercased; nested fields via
    * double underscore, e.g. GRAFT_NVD_ON_ERROR__ACTION=skip). */
  def envOverrides(env: Map[String, String], providers: Seq[String])
      : Map[String, Any] = {
    // Each env key is assigned to exactly ONE provider — the one with
    // the longest matching prefix — so with providers that are prefixes
    // of one another (nvd / nvd-extra), GRAFT_NVD_EXTRA_X goes only to
    // nvd-extra instead of also hitting nvd as field "extra_x".
    val prefixed = providers
      .map(p => p -> s"GRAFT_${p.toUpperCase(java.util.Locale.ROOT)
        .replace('-', '_')}_")
      .sortBy(-_._2.length)
    val assigned = env.toSeq.flatMap { case (k, v) =>
      prefixed.collectFirst { case (p, pre) if k.startsWith(pre) =>
        (p, k.stripPrefix(pre).toLowerCase(java.util.Locale.ROOT)
          .split("__").toList, coerce(v))
      }
    }
    val byProvider = assigned.groupBy(_._1).map { case (p, fs) =>
      p -> fs.foldLeft(Map.empty[String, Any]) {
        case (acc, (_, path, v)) => merge(acc, nest(path, v))
      }.asInstanceOf[Any]
    }
    if (byProvider.isEmpty) Map.empty
    else Map("providers" -> byProvider.asInstanceOf[Any])
  }

  private def nest(path: List[String], v: Any): Map[String, Any] =
    path match {
      case last :: Nil => Map(last -> v)
      case head :: tail => Map(head -> nest(tail, v).asInstanceOf[Any])
      case Nil => Map.empty
    }

  private def coerce(v: String): Any =
    if (v == "true" || v == "false") v.toBoolean
    else v.toIntOption.orElse(v.toDoubleOption).getOrElse(v)

  /** Resolved config: defaults ⊕ YAML file ⊕ env. */
  def resolve(providers: Seq[String], yamlPath: Option[String],
      env: Map[String, String] = sys.env): Map[String, Any] = {
    val fileCfg = yamlPath.map(loadYaml).getOrElse(Map.empty)
    merge(merge(defaults(providers), fileCfg), envOverrides(env, providers))
  }

  private def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val t = new java.util.TreeMap[String, Any]() // sorted keys
      m.foreach { case (k, x) => t.put(String.valueOf(k), toJava(x)) }
      t
    case l: Seq[_] => l.map(toJava).asJava
    case other => other
  }

  /** Block-style YAML rendering with sorted keys. */
  def render(cfg: Map[String, Any]): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(
      org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    opts.setIndent(2)
    new org.yaml.snakeyaml.Yaml(opts).dump(toJava(cfg))
  }
}
