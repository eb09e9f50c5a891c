package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Configuration model + YAML loading for the pipeline engine.
  *
  * Mirrors the reference's config surface (dongwonmoon/Yaml-Pipe,
  * `yamlpipe/utils/config_models.py:5-18`): a pipeline is four typed
  * component blocks `source / chunker / embedder / sink`, each
  * `{type: <registry key>, config: {...}}`, plus an optional
  * `state_manager` block defaulting to a JSON-file backend
  * (`yamlpipe/core/pipeline.py:112-115`).
  *
  * Error semantics preserved from `yamlpipe/utils/config.py:18-57`: missing
  * file, empty file, non-mapping root, and missing/invalid blocks all raise
  * [[GraftConfigException]] with a message naming the problem.
  */
final case class ComponentConfig(componentType: String, config: Map[String, Any]) {
  def str(key: String): Option[String] = config.get(key).map(String.valueOf)
  def strOr(key: String, default: String): String = str(key).getOrElse(default)
  def int(key: String, default: Int): Int =
    config.get(key).map(String.valueOf(_).toInt).getOrElse(default)
  def require(key: String): String =
    str(key).getOrElse(throw new GraftConfigException(s"missing required config key: $key"))
}

final case class PipelineConfig(
    source: ComponentConfig,
    chunker: ComponentConfig,
    embedder: ComponentConfig,
    sink: ComponentConfig,
    stateManager: ComponentConfig)

class GraftConfigException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

object Configs {

  /** Default state backend when the YAML has no `state_manager` block —
    * same default shape as the reference (`core/pipeline.py:112-115`).
    */
  val DefaultStateManager: ComponentConfig =
    ComponentConfig("json", Map("path" -> ".graft_state.json"))

  /** Parse a YAML string into a [[PipelineConfig]]. */
  def parse(yamlText: String): PipelineConfig = {
    if (yamlText == null || yamlText.trim.isEmpty)
      throw new GraftConfigException("config file is empty")
    val root =
      try new org.yaml.snakeyaml.Yaml().load[Any](yamlText)
      catch {
        case e: Exception => throw new GraftConfigException(s"invalid YAML: ${e.getMessage}", e)
      }
    root match {
      case m: java.util.Map[_, _] => fromMap(asScalaMap(m))
      case _ => throw new GraftConfigException("config root must be a mapping")
    }
  }

  /** Load + parse a YAML file. */
  def load(path: String): PipelineConfig = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      throw new GraftConfigException(s"config file not found: $path")
    parse(new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
  }

  private def asScalaMap(m: java.util.Map[_, _]): Map[String, Any] =
    m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap

  private def component(root: Map[String, Any], name: String): ComponentConfig =
    root.get(name) match {
      case Some(m: java.util.Map[_, _]) =>
        val block = asScalaMap(m)
        val tpe = block.get("type") match {
          case Some(t: String) if t.nonEmpty => t
          case _ => throw new GraftConfigException(s"component '$name' is missing 'type'")
        }
        val cfg = block.get("config") match {
          case Some(c: java.util.Map[_, _]) => asScalaMap(c)
          case None | Some(null) => Map.empty[String, Any]
          case _ => throw new GraftConfigException(s"component '$name' config must be a mapping")
        }
        ComponentConfig(tpe, cfg)
      case Some(_) => throw new GraftConfigException(s"component '$name' must be a mapping")
      case None => throw new GraftConfigException(s"missing required component: $name")
    }

  private def fromMap(root: Map[String, Any]): PipelineConfig = {
    val state = if (root.contains("state_manager")) component(root, "state_manager")
                else DefaultStateManager
    PipelineConfig(
      source = component(root, "source"),
      chunker = component(root, "chunker"),
      embedder = component(root, "embedder"),
      sink = component(root, "sink"),
      stateManager = state)
  }
}
