package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import java.util.concurrent.Executors
import javax.net.ssl.SSLContext

import scala.concurrent.Await
import scala.concurrent.duration._
import scala.sys.process._

import com.sun.net.httpserver.{HttpsConfigurator, HttpsParameters, HttpsServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.config.{TcpConnectionConfig, TlsConfig, TransportConfig}
import graft.model.TransportRequest
import graft.transport.JdkHttpEngine

/** Client-certificate mTLS (ref: engine.py:51-67 builds the ssl context from
  * client_cert/client_key): a local HTTPS server with needClientAuth=true
  * accepts the engine only when it presents the CA-signed client cert.
  */
class MtlsSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var dir: Path = _
  private var server: HttpsServer = _
  private var port: Int = 0

  private def sh(cmd: String): Unit = {
    val rc = Process(Seq("bash", "-c", cmd), dir.toFile).!(ProcessLogger(_ => (), _ => ()))
    require(rc == 0, s"command failed: $cmd")
  }

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-mtls")
    Files.writeString(dir.resolve("san.ext"), "subjectAltName=IP:127.0.0.1\n")
    sh("openssl genpkey -algorithm RSA -pkeyopt rsa_keygen_bits:2048 -out ca.key 2>/dev/null")
    sh("""openssl req -x509 -new -key ca.key -days 2 -subj "/CN=graft-test-ca" -out ca.pem""")
    for (who <- Seq("server", "client")) {
      sh(s"openssl genpkey -algorithm RSA -pkeyopt rsa_keygen_bits:2048 -out $who.key 2>/dev/null")
      sh(s"""openssl req -new -key $who.key -subj "/CN=127.0.0.1" -out $who.csr""")
      sh(s"openssl x509 -req -in $who.csr -CA ca.pem -CAkey ca.key -CAcreateserial " +
        s"-days 2 -extfile san.ext -out $who.pem 2>/dev/null")
    }

    // HTTPS server: presents server.pem, trusts our CA for verifying the
    // client cert, and (below) REQUIRES one.
    val ctxWithTrust = JdkHttpEngine.sslContextFor(TlsConfig(
      verify = true, caBundle = Some(p("ca.pem")),
      clientCert = Some(p("server.pem")), clientKey = Some(p("server.key")))).get
    server = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 16)
    server.setHttpsConfigurator(new HttpsConfigurator(ctxWithTrust) {
      override def configure(params: HttpsParameters): Unit = {
        val ssl = ctxWithTrust.getDefaultSSLParameters
        ssl.setNeedClientAuth(true)
        params.setSSLParameters(ssl)
      }
    })
    server.createContext("/ping", x => {
      val body = """{"pong":true}""".getBytes
      x.sendResponseHeaders(200, body.length)
      x.getResponseBody.write(body)
      x.close()
    })
    server.setExecutor(Executors.newFixedThreadPool(4))
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def p(name: String): String = dir.resolve(name).toString

  private def engine(tls: TlsConfig): JdkHttpEngine =
    new JdkHttpEngine(
      TransportConfig(baseTimeoutSeconds = 10, warmupTimeoutSeconds = 5,
        tcpConnection = TcpConnectionConfig(tls = tls)),
      s"https://127.0.0.1:$port")

  test("engine with client cert + CA bundle completes the mTLS handshake") {
    val e = engine(TlsConfig(verify = true, caBundle = Some(p("ca.pem")),
      clientCert = Some(p("client.pem")), clientKey = Some(p("client.key"))))
    val resp = Await.result(
      e.send(TransportRequest(s"https://127.0.0.1:$port/ping", "GET")), 30.seconds)
    resp.error shouldBe None
    resp.status shouldBe Some(200)
    new String(resp.body) should include("pong")
  }

  test("engine without a client cert is rejected by needClientAuth") {
    val e = engine(TlsConfig(verify = true, caBundle = Some(p("ca.pem"))))
    val resp = Await.result(
      e.send(TransportRequest(s"https://127.0.0.1:$port/ping", "GET")), 30.seconds)
    resp.status shouldBe None
    resp.error should not be empty
  }

  test("client_cert without client_key is a config error") {
    an[IllegalArgumentException] should be thrownBy
      JdkHttpEngine.sslContextFor(TlsConfig(clientCert = Some(p("client.pem"))))
  }
}
