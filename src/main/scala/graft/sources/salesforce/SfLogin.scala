package graft.sources.salesforce

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.XMLConstants
import java.io.ByteArrayInputStream

/** Authentication with Salesforce failed — the SOAP fault's
  * exceptionCode/exceptionMessage pair (analogue of
  * `SalesforceAuthenticationFailed`, `exceptions.py:88-99`).
  */
final class SfAuthFailed(val code: String, val message: String)
    extends RuntimeException(s"$code: $message")

/** SOAP username/password login — the credential bootstrap every
  * reference run performs before any API call (`salesforce.py:17-26`
  * builds its clients from config credentials; the wire lives in
  * `simple_salesforce/login.py:87-259` and is golden-tested by
  * `tests/test_login.py`). Returns `(sessionId, instance)`: the bearer
  * token the REST/Bulk transports authenticate with and the org's
  * instance host.
  *
  * Wire parity with `SalesforceLogin`:
  *  - endpoint `https://{domain}.salesforce.com/services/Soap/u/{v}`
  *    (`login.py:66`), domain defaulting to `login`, `test` selecting
  *    the sandbox pool, or a full My-Domain host;
  *  - three envelope variants: security-token (password+token
  *    concatenated, `login.py:85-105`), organizationId / IP-filtering
  *    (`LoginScopeHeader`, `:109-131`), and plain username/password
  *    (`:134-153`); the JWT bearer flow (`:155-180`) is out of scope —
  *    the reference's own pipeline never exercises it
  *    (`salesforce.py` passes username/password/security_token only);
  *  - `CallOptions.client` = `RestForce` or `RestForce/{app}`
  *    (`login.py:7,68-74`);
  *  - username/password HTML-escaped into the XML (`login.py:79-80`,
  *    python `html.escape`: `& < > " '`);
  *  - headers `content-type: text/xml`, `charset: UTF-8`,
  *    `SOAPAction: login` (`login.py:188-192`);
  *  - non-200 → raise the fault's `sf:exceptionCode` /
  *    `sf:exceptionMessage` (`login.py:200-207`); 200 → extract
  *    `sessionId` + `serverUrl` and reduce the URL to its host —
  *    scheme stripped, path dropped, `-api` removed (`:209-220`).
  *
  * Element extraction mirrors `getUniqueElementValueFromXmlString`
  * (`util.py:12-31`): first element whose QUALIFIED name matches, so
  * `sf:exceptionCode` is looked up prefix-literally exactly like
  * minidom's `getElementsByTagName`.
  */
object SfLogin {

  final case class LoginResult(sessionId: String, instance: String) {
    /** Base URL the HTTP transports take (`Salesforce.__init__`
      * builds `https://{instance}` the same way, `api.py:174-178`).
      */
    def instanceUrl: String = s"https://$instance"
  }

  /** `login.py:7` — the CallOptions client id prefix. */
  val ClientIdPrefix = "RestForce"

  /** `login.py:63-66`: the SOAP endpoint for a login-pool or
    * My-Domain host.
    */
  def soapUrl(domain: String, apiVersion: String): String =
    s"https://$domain.salesforce.com/services/Soap/u/$apiVersion"

  /** Python `html.escape(s, quote=True)` (`login.py:79-80`). */
  def htmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&#x27;"
      case c => c.toString
    }

  /** The login SOAP envelope (golden shapes from `login.py:85-153`).
    * Exactly one of `securityToken` / `organizationId` may be set;
    * with neither, the plain IP-filtering body is produced.
    */
  def loginEnvelope(username: String, password: String,
      securityToken: Option[String] = None,
      organizationId: Option[String] = None,
      clientId: Option[String] = None): String = {
    require(securityToken.isEmpty || organizationId.isEmpty,
      "security_token and organizationId are mutually exclusive")
    val client = clientId.fold(ClientIdPrefix)(a => s"$ClientIdPrefix/$a")
    val u = htmlEscape(username)
    val p = htmlEscape(password)
    securityToken match {
      case Some(token) =>
        s"""<?xml version="1.0" encoding="utf-8" ?>
           |<env:Envelope
           |        xmlns:xsd="http://www.w3.org/2001/XMLSchema"
           |        xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
           |        xmlns:env="http://schemas.xmlsoap.org/soap/envelope/"
           |        xmlns:urn="urn:partner.soap.sforce.com">
           |    <env:Header>
           |        <urn:CallOptions>
           |            <urn:client>$client</urn:client>
           |            <urn:defaultNamespace>sf</urn:defaultNamespace>
           |        </urn:CallOptions>
           |    </env:Header>
           |    <env:Body>
           |        <n1:login xmlns:n1="urn:partner.soap.sforce.com">
           |            <n1:username>$u</n1:username>
           |            <n1:password>$p$token</n1:password>
           |        </n1:login>
           |    </env:Body>
           |</env:Envelope>""".stripMargin
      case None =>
        val scopeHeader = organizationId.fold("") { org =>
          s"""
             |        <urn:LoginScopeHeader>
             |            <urn:organizationId>$org</urn:organizationId>
             |        </urn:LoginScopeHeader>""".stripMargin
        }
        s"""<?xml version="1.0" encoding="utf-8" ?>
           |<soapenv:Envelope
           |        xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/"
           |        xmlns:urn="urn:partner.soap.sforce.com">
           |    <soapenv:Header>
           |        <urn:CallOptions>
           |            <urn:client>$client</urn:client>
           |            <urn:defaultNamespace>sf</urn:defaultNamespace>
           |        </urn:CallOptions>$scopeHeader
           |    </soapenv:Header>
           |    <soapenv:Body>
           |        <urn:login>
           |            <urn:username>$u</urn:username>
           |            <urn:password>$p</urn:password>
           |        </urn:login>
           |    </soapenv:Body>
           |</soapenv:Envelope>""".stripMargin
    }
  }

  /** `util.py:12-31` — text of the FIRST element with the given
    * qualified tag name, or None. Non-namespace-aware DOM so prefixed
    * lookups (`sf:exceptionCode`) match literally, like minidom.
    */
  def xmlElementValue(xml: Array[Byte], tag: String): Option[String] = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // untrusted server payload: no DTDs/entity expansion
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_SCHEMA, "")
    val doc = f.newDocumentBuilder().parse(new ByteArrayInputStream(xml))
    val nodes = doc.getElementsByTagName(tag)
    if (nodes.getLength == 0) None else Option(nodes.item(0).getTextContent)
  }

  /** `login.py:209-220`: serverUrl → instance host (scheme off, path
    * off, `-api` removed).
    */
  def instanceOf(serverUrl: String): String =
    serverUrl.replace("http://", "").replace("https://", "")
      .split('/')(0).replace("-api", "")

  /** Perform the SOAP login (`SalesforceLogin` + `soap_login`,
    * `login.py:23-220`). `soapUrlOverride` points the wire at a test
    * fixture server (engine seam — the reference patches `requests`
    * for the same purpose in `test_login.py`).
    */
  def login(username: String, password: String,
      securityToken: Option[String] = None,
      organizationId: Option[String] = None,
      apiVersion: String = "52.0",
      domain: String = "login",
      clientId: Option[String] = None,
      soapUrlOverride: Option[String] = None): LoginResult = {
    val body = loginEnvelope(username, password, securityToken,
      organizationId, clientId)
    val url = soapUrlOverride.getOrElse(soapUrl(domain, apiVersion))
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "text/xml")
      .header("charset", "UTF-8")
      .header("SOAPAction", "login")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      .build()
    val resp = HttpClient.newHttpClient()
      .send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() != 200) {
      val code = xmlElementValue(resp.body(), "sf:exceptionCode")
      val msg = xmlElementValue(resp.body(), "sf:exceptionMessage")
      throw new SfAuthFailed(code.getOrElse(resp.statusCode().toString),
        msg.getOrElse(new String(resp.body(), UTF_8).take(500)))
    }
    val sessionId = xmlElementValue(resp.body(), "sessionId")
      .getOrElse(throw new SfAuthFailed("MALFORMED_RESPONSE",
        "login response carries no sessionId"))
    val serverUrl = xmlElementValue(resp.body(), "serverUrl")
      .getOrElse(throw new SfAuthFailed("MALFORMED_RESPONSE",
        "login response carries no serverUrl"))
    LoginResult(sessionId, instanceOf(serverUrl))
  }
}
