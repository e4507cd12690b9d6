package graft.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Minimal JSON facade over Jackson (ships with Spark — zero extra deps).
  *
  * Used for: pipeline-config parsing (ref: src/config/loader.py:10-68),
  * response-body validity probing (ref:
  * src/request_execution/middleware/interceptors.py:139-151), and
  * middleware-metadata serialization into the bronze `response_metadata`
  * column (ref: src/request_execution/models.py:104-122).
  *
  * Rendering is deterministic: object keys keep insertion order, numbers
  * render via Jackson's canonical writer.
  */
object Json {
  private val mapper = new ObjectMapper()

  /** Parse; throws on invalid JSON. */
  def parse(s: String): JsonNode = mapper.readTree(s)

  /** Validity probe for JsonResponseMiddleware: Right(node) or Left(error). */
  def tryParse(s: String): Either[String, JsonNode] =
    try Right(mapper.readTree(s))
    catch { case e: Exception => Left(Option(e.getMessage).getOrElse(e.getClass.getName)) }

  /** Render a Scala value tree to a JSON string.
    * Accepts: null, String, Boolean, Int/Long/Double/Float/BigDecimal,
    * Seq[_], Map[String, _], JsonNode.
    */
  def write(v: Any): String = mapper.writeValueAsString(toNode(v))

  def toNode(v: Any): JsonNode = v match {
    case null            => mapper.nullNode()
    case n: JsonNode     => n
    case s: String       => mapper.getNodeFactory.textNode(s)
    case b: Boolean      => mapper.getNodeFactory.booleanNode(b)
    case i: Int          => mapper.getNodeFactory.numberNode(i)
    case l: Long         => mapper.getNodeFactory.numberNode(l)
    case d: Double       => mapper.getNodeFactory.numberNode(d)
    case f: Float        => mapper.getNodeFactory.numberNode(f.toDouble)
    case bd: BigDecimal  => mapper.getNodeFactory.numberNode(bd.bigDecimal)
    case o: Option[_]    => o.map(toNode).getOrElse(mapper.nullNode())
    case m: scala.collection.Map[_, _] =>
      val on: ObjectNode = mapper.createObjectNode()
      m.foreach { case (k, value) => on.set[JsonNode](String.valueOf(k), toNode(value)) }
      on
    case xs: Iterable[_] =>
      val an: ArrayNode = mapper.createArrayNode()
      xs.foreach(x => an.add(toNode(x)))
      an
    case other => mapper.getNodeFactory.textNode(String.valueOf(other))
  }

  // --- decode helpers for config loading (tree -> case classes) ---

  def obj(n: JsonNode): Map[String, JsonNode] =
    if (n == null || !n.isObject) Map.empty
    else n.properties().asScala.map(e => e.getKey -> e.getValue).toMap

  def str(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText())

  def int(n: JsonNode, field: String): Option[Int] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asInt())

  def dbl(n: JsonNode, field: String): Option[Double] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asDouble())

  def bool(n: JsonNode, field: String): Option[Boolean] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asBoolean())

  def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull).toSeq.flatMap(_.elements().asScala)

  def strMap(n: JsonNode, field: String): Map[String, String] =
    Option(n.get(field)).map(obj(_).map { case (k, v) => k -> v.asText() }).getOrElse(Map.empty)

  def intSeq(n: JsonNode, field: String): Option[Seq[Int]] =
    Option(n.get(field)).filterNot(_.isNull).map(_.elements().asScala.map(_.asInt()).toSeq)
}
