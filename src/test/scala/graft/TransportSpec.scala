package graft

import com.sun.net.httpserver.{HttpsConfigurator, HttpsServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import javax.net.ssl.{KeyManagerFactory, SSLContext}
import scala.concurrent.Await
import scala.concurrent.duration._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.config.{TcpConnectionConfig, TlsConfig, TransportConfig}
import graft.model.TransportRequest
import graft.transport.JdkHttpEngine

/** Transport TLS paths (ref: src/request_execution/transport/engine.py:51-67
  * + tests/unit/transport/test_ssl_context.py): a live in-JVM HTTPS server
  * with a self-signed cert exercises verify=false (trust-all), verify=true
  * with a custom CA bundle, and the never-throw contract on trust failure.
  */
class TransportSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  private var dir: Path = _
  private var certPem: Path = _
  private var server: HttpsServer = _
  private def baseUrl = s"https://localhost:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("ks.p12")
    certPem = dir.resolve("cert.pem")
    def run(cmd: String*): Unit = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      p.waitFor()
      require(p.exitValue() == 0, s"${cmd.head} failed: $out")
    }
    run("keytool", "-genkeypair", "-alias", "t", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-keystore", ks.toString, "-storetype", "PKCS12",
      "-storepass", "changeit", "-dname", "CN=localhost",
      "-ext", "san=dns:localhost,ip:127.0.0.1")
    run("keytool", "-exportcert", "-rfc", "-alias", "t", "-keystore", ks.toString,
      "-storepass", "changeit", "-file", certPem.toString)

    val keyStore = java.security.KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(ks)
    try keyStore.load(in, "changeit".toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(keyStore, "changeit".toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)

    server = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(ctx))
    server.createContext("/", x => {
      val body = """{"secure":true}""".getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, body.length)
      val os = x.getResponseBody; os.write(body); os.close()
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def engine(tls: TlsConfig) = new JdkHttpEngine(
    TransportConfig(baseTimeoutSeconds = 10, warmupTimeoutSeconds = 5,
      tcpConnection = TcpConnectionConfig(tls = tls)), baseUrl)

  private def send(tls: TlsConfig) =
    Await.result(engine(tls).send(TransportRequest(baseUrl, "GET")), 30.seconds)

  test("verify=false (trust-all) accepts the self-signed cert (engine.py:51-60)") {
    val resp = send(TlsConfig(verify = false))
    resp.status shouldBe Some(200)
    new String(resp.body, "UTF-8") shouldBe """{"secure":true}"""
  }

  test("verify=true with ca_bundle trusts the custom CA (engine.py:61-67)") {
    val resp = send(TlsConfig(verify = true, caBundle = Some(certPem.toString)))
    resp.status shouldBe Some(200)
  }

  test("verify=true without the CA fails closed as an error response — never throws") {
    val resp = send(TlsConfig(verify = true))
    resp.status shouldBe None
    resp.error.get.toLowerCase should (include("ssl") or include("pkix") or include("cert"))
  }

  test("warmup records diagnostics on the TLS path (engine.py:95-121)") {
    val e = engine(TlsConfig(verify = false))
    e.warmup()
    e.diagnostics("warmed_up") shouldBe true
  }
}
