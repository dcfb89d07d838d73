package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Minimal JSON utilities on top of Jackson (ships with Spark — no new deps).
  *
  * Values are represented as plain Scala types:
  * ObjectNode -> ListMap[String, Any] (insertion order preserved),
  * ArrayNode -> Vector[Any], text -> String, int -> Long, float -> Double,
  * bool -> Boolean, null -> null.
  *
  * `canonical` renders with sorted keys — the cache-key contract of the
  * reference (reference sources.py:32-39 uses json.dumps(..., sort_keys=True)).
  */
object Jsons {
  private val mapper = new ObjectMapper()

  def parse(s: String): Any = fromNode(mapper.readTree(s))

  def parseOpt(s: String): Option[Any] =
    try Some(parse(s))
    catch { case _: Exception => None }

  private def fromNode(n: JsonNode): Any = n match {
    case null => null
    case o: ObjectNode =>
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      o.properties().asScala.foreach(e => b += (e.getKey -> fromNode(e.getValue)))
      b.result()
    case a: ArrayNode => a.elements().asScala.map(fromNode).toVector
    case v if v.isTextual => v.asText()
    case v if v.isIntegralNumber => v.asLong()
    case v if v.isFloatingPointNumber => v.asDouble()
    case v if v.isBoolean => v.asBoolean()
    case v if v.isNull => null
    case v => v.asText()
  }

  /** Render any supported Scala value as JSON. Maps keep their order. */
  def render(v: Any): String = {
    val sb = new StringBuilder
    write(v, sb, sortKeys = false)
    sb.toString
  }

  /** Render with recursively sorted object keys — deterministic cache keys. */
  def canonical(v: Any): String = {
    val sb = new StringBuilder
    write(v, sb, sortKeys = true)
    sb.toString
  }

  private def write(v: Any, sb: StringBuilder, sortKeys: Boolean): Unit = v match {
    case null => sb.append("null")
    case m: scala.collection.Map[_, _] =>
      val entries = m.toSeq.map { case (k, x) => (k.toString, x) }
      val ordered = if (sortKeys) entries.sortBy(_._1) else entries
      sb.append('{')
      var first = true
      ordered.foreach { case (k, x) =>
        if (!first) sb.append(',')
        first = false
        writeString(k, sb); sb.append(':'); write(x, sb, sortKeys)
      }
      sb.append('}')
    case s: Seq[_] =>
      sb.append('[')
      var first = true
      s.foreach { x =>
        if (!first) sb.append(',')
        first = false
        write(x, sb, sortKeys)
      }
      sb.append(']')
    case s: String => writeString(s, sb)
    case b: Boolean => sb.append(b)
    case i: Int => sb.append(i)
    case l: Long => sb.append(l)
    case d: Double =>
      // keep the ".0": rendering 8.0 as "8" would make a column of whole
      // doubles infer LongType downstream — a silent f64 -> i64 divergence
      // from the reference's schema inference
      sb.append(d)
    case f: Float => write(f.toDouble, sb, sortKeys)
    case other => writeString(other.toString, sb)
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
