package graft.model

import java.time.Instant

/** OAuth2/bearer token with expiry predicates.
  * Ref: src/auth/token/models.py:5-33.
  */
final case class Token(tokenValue: String, expiresAt: Option[Instant]) {
  def isExpired(now: Instant = Instant.now()): Boolean =
    expiresAt.exists(e => !now.isBefore(e))
  /** True when the token expires within `marginSeconds` from now. */
  def expiresWithin(marginSeconds: Long, now: Instant = Instant.now()): Boolean =
    expiresAt.exists(e => !now.plusSeconds(marginSeconds).isBefore(e))
}

/** Wire-level request handed to the transport engine.
  * Ref: src/request_execution/models.py:125-140.
  */
final case class TransportRequest(
    url: String,
    method: String,
    headers: Map[String, String] = Map.empty,
    params: Map[String, String] = Map.empty,
    body: Option[String] = None,
    timeoutSeconds: Double = 30.0
)

/** Wire-level response. The transport NEVER throws: network errors come
  * back as `error = Some(...)` with status = None.
  * Ref: src/request_execution/models.py:143-152; contract docs/transport.md:87-101.
  */
final case class TransportResponse(
    status: Option[Int],
    headers: Map[String, String] = Map.empty,
    body: Array[Byte] = Array.emptyByteArray,
    error: Option[String] = None
)

/** Immutable request parameterization for one endpoint call (pre-row).
  * Ref: src/request_execution/models.py:30-62 + config/models/endpoint.py:7-24.
  * `url` is the fully resolved base_url + url_path (fixes quirk Q4).
  */
final case class RequestContext(
    url: String,
    method: String = "GET",
    headers: Map[String, String] = Map.empty,
    params: Map[String, String] = Map.empty,
    paramMapping: Map[String, String] = Map.empty, // endpoint_param -> source_column
    metadata: Map[String, String] = Map.empty,     // e.g. vendor
    requestTemplate: Option[String] = None
)

/** The unit of state flowing through the middleware chain: one source row's
  * request lifecycle. Immutable — middleware returns updated copies (the
  * reference mutates in place; ref: src/request_execution/models.py:65-122).
  *
  * `row` carries the source-row fields needed by ParamInjectorMiddleware.
  * `metadata` is a JSON-serializable tree rendered into bronze
  * `response_metadata`.
  */
final case class RequestExchange(
    context: RequestContext,
    row: Map[String, String] = Map.empty,
    request: Option[TransportRequest] = None,
    response: Option[TransportResponse] = None,
    bodyText: Option[String] = None,
    success: Option[Boolean] = None,
    errorMessage: Option[String] = None,
    attempts: Int = 1, // reference default (models.py:90)
    metadata: Map[String, Any] = Map.empty
) {
  def statusCode: Option[Int] = response.flatMap(_.status)
  def withMeta(key: String, value: Any): RequestExchange =
    copy(metadata = metadata + (key -> value))
  /** Append a log line to metadata.logs (ref: injectors.py:90-112). */
  def withLog(line: String): RequestExchange = {
    val logs = metadata.get("logs") match {
      case Some(xs: Seq[_]) => xs.map(String.valueOf) :+ line
      case _                => Seq(line)
    }
    copy(metadata = metadata + ("logs" -> logs))
  }
}
