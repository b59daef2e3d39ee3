package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.cli.{Cli, ConfigFile}
import graft.sources.salesforce.{SfAuthFailed, SfLogin}

/** SOAP login against the vendored client's golden fixtures
  * (`tests/__init__.py:14-53` LOGIN_RESPONSE_SUCCESS,
  * `test_login.py` success / custom-domain / INVALID_LOGIN cases),
  * plus the config-alone CLI bootstrap the reference performs on
  * every run (`salesforce.py:17-26`).
  */
class SfLoginSpec extends SparkSpec with BeforeAndAfterAll {

  // ---- golden fixtures (tests/__init__.py) ---------------------------

  private val SessionId = "12345"
  private val ServerUrl =
    "https://na15.salesforce.com/services/Soap/c/29.0/00Di0000000icUB/0DFi00000008UYO"

  private def loginSuccessXml(serverUrl: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/" xmlns="urn:enterprise.soap.sforce.com" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
       |   <soapenv:Body>
       |      <loginResponse>
       |         <result>
       |            <metadataServerUrl>https://na15.salesforce.com/services/Soap/m/29.0/00Di0000000icUB</metadataServerUrl>
       |            <passwordExpired>false</passwordExpired>
       |            <sandbox>false</sandbox>
       |            <serverUrl>$serverUrl</serverUrl>
       |            <sessionId>$SessionId</sessionId>
       |            <userId>005i0000002MUqLAAW</userId>
       |         </result>
       |      </loginResponse>
       |   </soapenv:Body>
       |</soapenv:Envelope>""".stripMargin

  // test_login.py:122-125 (verbatim fault body)
  private val InvalidLoginXml =
    """<?xml version="1.0" encoding="UTF-8"?><soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/" xmlns:sf="urn:fault.partner.soap.sforce.com" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"><soapenv:Body><soapenv:Fault><faultcode>INVALID_LOGIN</faultcode><faultstring>INVALID_LOGIN: Invalid username, password, security token; or user locked out.</faultstring><detail><sf:LoginFault xsi:type="sf:LoginFault"><sf:exceptionCode>INVALID_LOGIN</sf:exceptionCode><sf:exceptionMessage>Invalid username, password, security token; or user locked out.</sf:exceptionMessage></sf:LoginFault></detail></soapenv:Fault></soapenv:Body></soapenv:Envelope>"""

  private val DescribeJson =
    """{"name":"Contact","fields":[
      |{"name":"Id","type":"id","length":18,"nillable":false},
      |{"name":"Name","type":"string","length":80,"nillable":true}
      |]}""".stripMargin

  // ---- local fixture server ------------------------------------------

  private var server: HttpServer = _
  private def base: String = s"http://localhost:${server.getAddress.getPort}"
  @volatile private var lastLoginBody: String = ""
  @volatile private var lastLoginHeaders: Map[String, String] = Map.empty

  private def respond(ex: HttpExchange, body: String, status: Int = 200,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        (ex.getRequestMethod, path) match {
          case ("POST", "/soap/login") =>
            lastLoginBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            lastLoginHeaders = Map(
              "Content-Type" -> ex.getRequestHeaders.getFirst("Content-Type"),
              "SOAPAction" -> ex.getRequestHeaders.getFirst("SOAPAction"))
            respond(ex, loginSuccessXml(ServerUrl), contentType = "text/xml")
          case ("POST", "/soap/local") =>
            // serverUrl pointing back at this fixture server, so the
            // bootstrapped transport's REST calls stay local
            respond(ex, loginSuccessXml(s"$base/services/Soap/u/47.0/00D"),
              contentType = "text/xml")
          case ("POST", "/soap/fail") =>
            respond(ex, InvalidLoginXml, status = 500, contentType = "text/xml")
          case ("GET", "/services/data/v47.0/sobjects/Contact/describe") =>
            respond(ex, DescribeJson)
          case ("GET", p) if p.startsWith("/services/data/v47.0/query") =>
            respond(ex, """{"totalSize":7,"done":true,"records":[]}""")
          case other =>
            respond(ex, s"""{"err":"unexpected $other"}""", status = 404)
        }
      } catch { case e: Throwable => respond(ex, e.toString, 500) }
    })
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  // ---- envelope goldens (login.py:85-153) ----------------------------

  test("security-token envelope carries CallOptions, escaped creds, " +
      "password+token concatenation") {
    val xml = SfLogin.loginEnvelope("foo@bar.com", """p<a>&'"s""",
      securityToken = Some("TOK"), clientId = Some("myapp"))
    assert(xml.contains("<urn:client>RestForce/myapp</urn:client>"))
    assert(xml.contains("<urn:defaultNamespace>sf</urn:defaultNamespace>"))
    assert(xml.contains("<n1:username>foo@bar.com</n1:username>"))
    // html.escape parity: & < > " ' (login.py:79-80)
    assert(xml.contains(
      "<n1:password>p&lt;a&gt;&amp;&#x27;&quot;sTOK</n1:password>"))
    assert(xml.contains("urn:partner.soap.sforce.com"))
    assert(!xml.contains("LoginScopeHeader"))
  }

  test("organizationId envelope uses LoginScopeHeader; plain envelope " +
      "uses neither token nor scope") {
    val org = SfLogin.loginEnvelope("u", "p",
      organizationId = Some("00Di0000000icUB"))
    assert(org.contains(
      "<urn:organizationId>00Di0000000icUB</urn:organizationId>"))
    assert(org.contains("<urn:client>RestForce</urn:client>"))
    assert(org.contains("<urn:password>p</urn:password>"))
    val plain = SfLogin.loginEnvelope("u", "p")
    assert(!plain.contains("LoginScopeHeader"))
    assert(plain.contains("<urn:username>u</urn:username>"))
    intercept[IllegalArgumentException] {
      SfLogin.loginEnvelope("u", "p", securityToken = Some("t"),
        organizationId = Some("o"))
    }
  }

  test("soap endpoint selection: default login pool, sandbox, My Domain " +
      "(login.py:63-66)") {
    assert(SfLogin.soapUrl("login", "47.0") ==
      "https://login.salesforce.com/services/Soap/u/47.0")
    assert(SfLogin.soapUrl("test", "38.0") ==
      "https://test.salesforce.com/services/Soap/u/38.0")
    assert(SfLogin.soapUrl("testdomain.my", "52.0") ==
      "https://testdomain.my.salesforce.com/services/Soap/u/52.0")
  }

  test("instance host derivation strips scheme, path, and -api " +
      "(login.py:209-220)") {
    assert(SfLogin.instanceOf(ServerUrl) == "na15.salesforce.com")
    assert(SfLogin.instanceOf(
      "https://na15-api.salesforce.com/services/Soap/c/29.0") ==
      "na15.salesforce.com")
    assert(SfLogin.instanceOf("http://localhost:8123/x/y") == "localhost:8123")
  }

  // ---- wire tests against the golden fixtures ------------------------

  test("successful login returns (sessionId, instance) from the golden " +
      "response and sends the SOAP headers (test_login.py default-domain)") {
    val r = SfLogin.login("foo@bar.com", "password",
      securityToken = Some("token"),
      soapUrlOverride = Some(s"$base/soap/login"))
    assert(r.sessionId == SessionId)
    assert(r.instance == "na15.salesforce.com")
    assert(r.instanceUrl == "https://na15.salesforce.com")
    assert(lastLoginHeaders("Content-Type").startsWith("text/xml"))
    assert(lastLoginHeaders("SOAPAction") == "login")
    assert(lastLoginBody.contains("<n1:password>passwordtoken</n1:password>"))
  }

  test("INVALID_LOGIN fault raises SfAuthFailed with the fault's " +
      "exceptionCode/exceptionMessage (test_login.py test_failure)") {
    val e = intercept[SfAuthFailed] {
      SfLogin.login("myemail@example.com.sandbox", "password",
        securityToken = Some("token"),
        soapUrlOverride = Some(s"$base/soap/fail"))
    }
    assert(e.code == "INVALID_LOGIN")
    assert(e.message ==
      "Invalid username, password, security token; or user locked out.")
  }

  // ---- config-alone CLI bootstrap (salesforce.py:17-26) ---------------

  private def writeConfig(loginPath: String,
      withInstanceOverride: Boolean): String = {
    val f = Files.createTempFile("pgsf", ".cfg")
    val inst = if (withInstanceOverride) s"instance_url = $base\n" else ""
    Files.writeString(f,
      s"""[salesforce]
         |username = my@account.com.sbox
         |password = mypassword
         |security_token = XXXXXXXXXXXXXXXXXXXXXXXXX
         |domain = test
         |api_version = 47.0
         |login_url = $base$loginPath
         |$inst""".stripMargin)
    f.toString
  }

  test("[salesforce] section parses exactly the reference's keys " +
      "(salesforce.py:7-15) and requires the required ones") {
    val cfg = ConfigFile.load(writeConfig("/soap/login", withInstanceOverride = false))
    val c = cfg.salesforce.get
    assert(c.username == "my@account.com.sbox")
    assert(c.domain.contains("test"))
    assert(c.apiVersion == "47.0")
    val missing = ConfigFile.parse("[salesforce]\nusername = u\n")
    val err = intercept[IllegalArgumentException](missing.salesforce)
    assert(err.getMessage.contains("password"))
    assert(ConfigFile.parse("[postgresql]\ndb = x\n").salesforce.isEmpty)
  }

  test("cli login verb authenticates from config alone") {
    val outBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.run(
      Seq("login", "--config", writeConfig("/soap/login", withInstanceOverride = false)),
      outBuf += _)
    assert(code == 0, outBuf.mkString("\n"))
    assert(outBuf.exists(_.contains("instance=na15.salesforce.com")))
    assert(outBuf.exists(_.contains(s"session_chars=${SessionId.length}")))
  }

  test("cli login verb surfaces the auth fault as a clean error line") {
    val outBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.run(
      Seq("login", "--config", writeConfig("/soap/fail", withInstanceOverride = false)),
      outBuf += _)
    assert(code == 1)
    assert(outBuf.exists(l => l.startsWith("error:") &&
      l.contains("INVALID_LOGIN")))
  }

  test("query verb runs from config alone: SOAP login bootstraps the " +
      "HTTP transport, COUNT() answered over it") {
    val outBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.run(
      Seq("query", "--config", writeConfig("/soap/local", withInstanceOverride = true),
        "--object", "Contact", "--count"),
      outBuf += _)
    assert(code == 0, outBuf.mkString("\n"))
    assert(outBuf.contains("7"))
  }
}
