package graft.transport

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.security.cert.X509Certificate
import java.time.Duration
import java.util.concurrent.{CompletableFuture, Executors}
import javax.net.ssl.{SSLContext, TrustManager, X509TrustManager}
import scala.concurrent.{Future, Promise}
import scala.jdk.CollectionConverters._

import graft.config.TransportConfig
import graft.model.{TransportRequest, TransportResponse}

/** Transport abstraction. Contract (ref: docs/transport.md:87-101 and
  * src/request_execution/transport/base.py:14-38): `send` NEVER throws —
  * network-level failures come back as `TransportResponse(error = Some(..))`.
  */
trait TransportEngine {
  def send(req: TransportRequest): Future[TransportResponse]
  def warmup(): Unit
  /** connection_warmup diagnostics read by TransportDiagnosticMiddleware
    * (ref: src/request_execution/middleware/injectors.py:172-199).
    */
  def diagnostics: Map[String, Any]
  def transportType: String
}

/** JVM-native async transport on `java.net.http.HttpClient` — the Scala
  * analog of the reference's AiohttpEngine
  * (ref: src/request_execution/transport/engine.py:16-148): process-scoped
  * client with built-in connection pooling + keep-alive, optional
  * trust-all / custom-CA TLS, a warmup GET priming DNS+TCP+TLS, and a
  * never-throw send.
  *
  * Pool-limit mapping: aiohttp's TCPConnector(limit=N) caps sockets; the JDK
  * client pools per-route automatically and total in-flight concurrency is
  * bounded upstream by the partition executor's semaphore
  * (SURVEY.md §2.C), so `tcp_connection.limit` bounds the async executor's
  * thread pool here instead of a socket count.
  */
final class JdkHttpEngine(cfg: TransportConfig, baseUrl: String) extends TransportEngine {
  val transportType: String = cfg.transportType

  // Small daemon pool: HttpClient I/O is NIO-selector based; this pool only
  // runs response-completion callbacks.
  private val callbackPool = Executors.newFixedThreadPool(
    math.max(4, math.min(16, Runtime.getRuntime.availableProcessors() / 2)),
    r => { val t = new Thread(r, "graft-http"); t.setDaemon(true); t })

  private val client: HttpClient = {
    val b = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis((cfg.baseTimeoutSeconds * 1000).toLong))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .executor(callbackPool)
    JdkHttpEngine.sslContextFor(cfg.tcpConnection.tls).foreach(b.sslContext)
    b.build()
  }

  @volatile private var warmedUp = false
  @volatile private var warmupError: Option[String] = None

  /** One GET against base_url at engine init primes DNS/TCP/TLS so the first
    * real request doesn't pay connection setup (ref: engine.py:95-121).
    * Any status code counts as warmed-up — only transport errors don't.
    */
  def warmup(): Unit = {
    try {
      val req = HttpRequest.newBuilder(URI.create(baseUrl))
        .timeout(Duration.ofMillis((cfg.warmupTimeoutSeconds * 1000).toLong))
        .GET().build()
      client.send(req, HttpResponse.BodyHandlers.discarding())
      warmedUp = true
    } catch {
      case e: Exception =>
        warmedUp = false
        warmupError = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
    }
  }

  def diagnostics: Map[String, Any] = Map(
    "warmed_up" -> warmedUp,
    "warmup_error" -> warmupError.orNull,
    "warmup_timeout" -> cfg.warmupTimeoutSeconds)

  private def encodeQuery(params: Map[String, String]): String =
    params.iterator.map { case (k, v) =>
      URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" + URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")

  /** Stale pooled-connection race signatures: the server closed a
    * keep-alive connection as we reused it. For idempotent bodyless methods
    * the retry is always safe (same courtesy the JDK client extends to GET).
    * For requests with bodies a reset can arrive AFTER the server executed
    * the request, so transparent retry is gated on
    * `transport.retry_non_idempotent` (default off) — the row-level
    * anti-join checkpoint dedups sink rows, not remote side effects.
    */
  private val staleConnPattern =
    "(?i)(header parser received no bytes|connection reset|goaway|EOFException)".r.unanchored

  /** A refused connection never reached the server, so retrying is safe for
    * ANY method — no request was executed. */
  private val neverSentPattern = "(?i)connection refused".r.unanchored

  private val idempotentMethods = Set("GET", "HEAD", "OPTIONS", "DELETE", "PUT")

  def send(req: TransportRequest): Future[TransportResponse] = {
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(callbackPool)
    val retryable =
      idempotentMethods.contains(req.method.toUpperCase) || cfg.retryNonIdempotent
    def loop(attempt: Int): Future[TransportResponse] =
      sendOnce(req).flatMap {
        case r if attempt < 2 && r.error.exists(e =>
            neverSentPattern.matches(e) ||
              (retryable && staleConnPattern.matches(e))) =>
          loop(attempt + 1)
        case r => Future.successful(r)
      }
    loop(0)
  }

  private def sendOnce(req: TransportRequest): Future[TransportResponse] = {
    val p = Promise[TransportResponse]()
    try {
      val uri =
        if (req.params.isEmpty) URI.create(req.url)
        else URI.create(req.url + (if (req.url.contains("?")) "&" else "?") + encodeQuery(req.params))
      val b = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofMillis((req.timeoutSeconds * 1000).toLong))
      req.headers.foreach { case (k, v) => b.header(k, v) }
      val publisher = req.body
        .map(s => HttpRequest.BodyPublishers.ofString(s, StandardCharsets.UTF_8))
        .getOrElse(HttpRequest.BodyPublishers.noBody())
      b.method(req.method, publisher)
      val cf: CompletableFuture[HttpResponse[Array[Byte]]] =
        client.sendAsync(b.build(), HttpResponse.BodyHandlers.ofByteArray())
      cf.whenComplete { (resp, err) =>
        if (err != null) {
          val cause = Option(err.getCause).getOrElse(err)
          // JDK network exceptions often carry a null message — fall back
          // to the target so bronze error rows stay diagnosable.
          val detail = Option(cause.getMessage).filter(_.nonEmpty)
            .getOrElse(s"connecting to $uri")
          p.success(TransportResponse(None,
            error = Some(s"${cause.getClass.getSimpleName}: $detail")))
        } else {
          val headers = resp.headers().map().asScala.map { case (k, vs) =>
            k -> vs.asScala.mkString(",")
          }.toMap
          p.success(TransportResponse(Some(resp.statusCode()), headers, resp.body()))
        }
      }
    } catch {
      // even request-construction errors must not escape (never-throw contract)
      case e: Exception =>
        p.success(TransportResponse(None,
          error = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")))
    }
    p.future
  }
}

object JdkHttpEngine {
  import javax.net.ssl.{KeyManager, KeyManagerFactory, TrustManagerFactory}

  /** Full TLS wiring from config (ref: engine.py:51-67): custom CA trust
    * (`ca_bundle`), trust-all (`verify: false`), and client-cert mTLS
    * (`client_cert` + `client_key`, PEM with a PKCS#8 key — the format
    * `openssl genpkey`/`req` emit). Returns None when the JDK defaults
    * suffice (verify on, no CA bundle, no client cert).
    */
  def sslContextFor(tls: graft.config.TlsConfig): Option[SSLContext] = {
    val kms: Option[Array[KeyManager]] =
      (tls.clientCert, tls.clientKey) match {
        case (Some(c), Some(k)) => Some(keyManagersFromPem(c, k))
        case (None, None) => None
        case _ => throw new IllegalArgumentException(
          "tls.client_cert and tls.client_key must be set together")
      }
    val tms: Option[Array[javax.net.ssl.TrustManager]] =
      if (!tls.verify) Some(trustAllManagers)
      else tls.caBundle.map(trustManagersFromCaBundle)
    if (kms.isEmpty && tms.isEmpty) None
    else {
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kms.orNull, tms.orNull, new java.security.SecureRandom())
      Some(ctx)
    }
  }

  /** X.509 certificate(s) from a PEM file/bundle. */
  def certificatesFromPem(pemPath: String): Seq[X509Certificate] = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(pemPath))
    val certs = try cf.generateCertificates(in) finally in.close()
    import scala.jdk.CollectionConverters._
    certs.asScala.map(_.asInstanceOf[X509Certificate]).toSeq
  }

  /** PKCS#8 private key from PEM ("BEGIN PRIVATE KEY"); tries RSA then EC.
    * PKCS#1 ("BEGIN RSA PRIVATE KEY") is not a JDK-native encoding —
    * convert with `openssl pkcs8 -topk8 -nocrypt`.
    */
  def privateKeyFromPem(pemPath: String): java.security.PrivateKey = {
    val pem = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(pemPath)), java.nio.charset.StandardCharsets.US_ASCII)
    if (pem.contains("BEGIN RSA PRIVATE KEY") || pem.contains("BEGIN EC PRIVATE KEY"))
      throw new IllegalArgumentException(
        s"$pemPath is PKCS#1/SEC1; convert to PKCS#8 with 'openssl pkcs8 -topk8 -nocrypt'")
    val b64 = pem.replaceAll("-----BEGIN [A-Z ]+-----", "")
      .replaceAll("-----END [A-Z ]+-----", "").replaceAll("\\s", "")
    val der = java.util.Base64.getDecoder.decode(b64)
    val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC").view.flatMap { alg =>
      try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"$pemPath: PKCS#8 key is neither RSA nor EC"))
  }

  /** KeyManagers presenting the client certificate chain during the TLS
    * handshake (mTLS). */
  def keyManagersFromPem(certPath: String, keyPath: String): Array[KeyManager] = {
    val chain = certificatesFromPem(certPath)
    val key = privateKeyFromPem(keyPath)
    val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    ks.setKeyEntry("client", key, Array.emptyCharArray, chain.toArray[java.security.cert.Certificate])
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    kmf.getKeyManagers
  }

  private def trustManagersFromCaBundle(pemPath: String): Array[javax.net.ssl.TrustManager] = {
    val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    certificatesFromPem(pemPath).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"ca$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    tmf.getTrustManagers
  }

  private def trustAllManagers: Array[TrustManager] = Array(new X509TrustManager {
    def checkClientTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
    def checkServerTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
    def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  })
}
