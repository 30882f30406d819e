package graft.engine

import java.io.FileInputStream
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** YAML config model mirroring the reference's shape (reference
  * docs/usage.rst:17-58, cli.py:35-70): global size/time limits, named
  * blocks, and flows as [input, output] pairs with per-end kwargs.
  */
object Config {
  case class Block(name: String, typ: String, kwargs: Map[String, Any])
  case class FlowEnd(name: String, kwargs: Map[String, Any])
  case class Flow(input: FlowEnd, output: FlowEnd)
  case class Engine(
      sizeLimit: Int,
      timeLimit: Int,
      blocks: Seq[Block],
      flows: Seq[Flow]) {
    def block(name: String): Block =
      blocks.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"undefined block: $name"))
  }

  /** Defaults match the reference batcher (batcher.py:40-41). */
  val DefaultSizeLimit = 5
  val DefaultTimeLimit = 15

  def load(path: String): Engine = {
    val in = new FileInputStream(path)
    try parse(new Yaml().load[java.util.Map[String, Any]](in).asScala.toMap)
    finally in.close()
  }

  def parseString(yaml: String): Engine =
    parse(new Yaml().load[java.util.Map[String, Any]](yaml).asScala.toMap)

  private def anyMap(v: Any): Map[String, Any] = v match {
    case null => Map.empty
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case other =>
      throw new IllegalArgumentException(s"expected mapping, got: $other")
  }

  private def parse(root: Map[String, Any]): Engine = {
    def int(k: String, dflt: Int): Int =
      root.get(k).map(_.asInstanceOf[Number].intValue).getOrElse(dflt)
    val blocks = root.getOrElse("blocks", new java.util.ArrayList[Any]())
      .asInstanceOf[java.util.List[Any]].asScala.toSeq.map { b =>
        val m = anyMap(b)
        Block(m("name").toString, m("type").toString,
          anyMap(m.getOrElse("kwargs", null)))
      }
    val flows = root.getOrElse("flows", new java.util.ArrayList[Any]())
      .asInstanceOf[java.util.List[Any]].asScala.toSeq.map { f =>
        val ends = f.asInstanceOf[java.util.List[Any]].asScala.toSeq.map { e =>
          val m = anyMap(e)
          FlowEnd(m("name").toString, anyMap(m.getOrElse("kwargs", null)))
        }
        require(ends.length == 2,
          s"flow must be an [input, output] pair, got ${ends.length} entries")
        Flow(ends(0), ends(1))
      }
    Engine(int("size_limit", DefaultSizeLimit),
      int("time_limit", DefaultTimeLimit), blocks, flows)
  }
}
