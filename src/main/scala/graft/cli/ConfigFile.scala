package graft.cli

/** Config-file ingestion — the engine twin of the reference's
  * `~/.pgsf` (`config.py:1-20`, `etc/pgsf.example`), with Python
  * `configparser` semantics: `[section]` headers, `key = value` or
  * `key: value` pairs, full-line `#`/`;` comments, a `[DEFAULT]`
  * section whose keys every other section inherits, trimmed values,
  * case-insensitive keys. Inline comments are NOT stripped
  * (configparser's default) — so values like JDBC URLs may contain
  * `;`.
  *
  * The reference reads credentials, schema, quote_name and job paths
  * from this file; here the parsed file feeds CLI option DEFAULTS
  * (explicit `--flags` always win) via [[Config.cliDefaults]].
  */
object ConfigFile {

  /** Credential arm parsed from `[salesforce]` — the two login shapes
    * the client library dispatches between (`api.py:143-168`).
    */
  sealed trait SfAuthMethod
  /** username + password + security_token → SOAP login
    * (`api.py:146-156`).
    */
  final case class SfPassword(password: String, securityToken: String)
      extends SfAuthMethod
  /** username + consumer_key + privatekey_file → JWT bearer grant
    * (`api.py:158-168`; key names are the reference's kwargs).
    */
  final case class SfJwt(consumerKey: String, privateKeyFile: String)
      extends SfAuthMethod

  /** Parsed `[salesforce]` section (see [[Config.salesforce]]). */
  final case class SfCredentials(username: String, auth: SfAuthMethod,
      domain: Option[String], apiVersion: String,
      loginUrl: Option[String], instanceUrl: Option[String])

  /** configparser's boolean convention, shared by the config file and
    * the `--quote-name` flag: unrecognized values ERROR (configparser
    * raises ValueError) — a typo like `ture` must not silently flip
    * identifier quoting and aim generated DDL at wrong tables.
    */
  def parseBoolean(v: String): Boolean = v.trim.toLowerCase match {
    case "1" | "yes" | "true" | "on" => true
    case "0" | "no" | "false" | "off" => false
    case other => throw new IllegalArgumentException(
      s"not a boolean: '$other' (expected 1/yes/true/on or 0/no/false/off)")
  }

  final case class Config(sections: Map[String, Map[String, String]]) {
    private val defaults = sections.getOrElse("DEFAULT", Map.empty)

    def get(section: String, key: String): Option[String] =
      sections.getOrElse(section, Map.empty).get(key.toLowerCase)
        .orElse(defaults.get(key.toLowerCase))

    /** configparser `getboolean`: 1/yes/true/on vs 0/no/false/off. */
    def getBoolean(section: String, key: String): Option[Boolean] =
      get(section, key).map(parseBoolean)

    /** Destination JDBC URL: an explicit `url` key wins (engine
      * extension — lets tests and non-PG deployments point anywhere);
      * otherwise assembled from the reference's host/port/db/user/
      * password keys (`etc/pgsf.example` [postgresql]).
      */
    def jdbcUrl: Option[String] =
      get("postgresql", "url").orElse {
        get("postgresql", "db").map { db =>
          val host = get("postgresql", "host").getOrElse("localhost")
          val port = get("postgresql", "port").getOrElse("5432")
          // URL-encode credentials: the PG driver splits the query
          // string on '&'/'=' and URL-decodes values, so a raw
          // password containing those (or '%') would be mangled
          def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
          val params = get("postgresql", "user").map(u => s"user=${enc(u)}").toSeq ++
            get("postgresql", "password").map(p => s"password=${enc(p)}").toSeq
          s"jdbc:postgresql://$host:$port/$db" +
            (if (params.isEmpty) "" else params.mkString("?", "&", ""))
        }
      }

    /** `[salesforce]` credentials. Two credential shapes, dispatched
      * in the client library's own order (`api.py:143-168`): username
      * + password + security_token selects the SOAP arm (checked
      * FIRST, like `api.py:146` — a file carrying both shapes logs in
      * by password); otherwise username + consumer_key +
      * privatekey_file selects the JWT bearer arm (`api.py:158-168`;
      * the key names are the reference's kwargs verbatim). A section
      * with neither complete shape is a clean error naming both.
      * Deliberate divergence: EMPTY values don't select an arm (the
      * existing `domain` non-empty convention) — a templated config
      * whose token variable expanded empty errors cleanly here, where
      * the reference's presence-based dispatch would attempt a SOAP
      * login with an empty token and fail server-side.
      * `domain` only when present and non-empty
      * (`salesforce.py:11-13`), `api_version` required (`:15`).
      * Engine-extension keys for deployments and specs: `login_url`
      * overrides the login endpoint — the SOAP URL for the password
      * arm, the oauth2 token URL for the JWT arm (the reference
      * patches `requests` for the same seam in `test_login.py`);
      * `instance_url` overrides the instance host the login returns
      * (proxies / local fixtures).
      *
      * @return None when the file has no [salesforce] section at all
      */
    def salesforce: Option[SfCredentials] = {
      if (!sections.contains("salesforce")) None
      else {
        def req(key: String): String = get("salesforce", key).getOrElse(
          throw new IllegalArgumentException(
            s"config [salesforce] is missing required key '$key'"))
        def opt(key: String): Option[String] =
          get("salesforce", key).filter(_.nonEmpty)
        val auth = (opt("password"), opt("security_token")) match {
          case (Some(pw), Some(tok)) => SfPassword(pw, tok)
          case _ => (opt("consumer_key"), opt("privatekey_file")) match {
            case (Some(ck), Some(kf)) => SfJwt(ck, kf)
            case _ => throw new IllegalArgumentException(
              "config [salesforce] needs either password + " +
                "security_token (SOAP arm) or consumer_key + " +
                "privatekey_file (JWT bearer arm)")
          }
        }
        Some(SfCredentials(
          username = req("username"),
          auth = auth,
          domain = get("salesforce", "domain").filter(_.nonEmpty),
          apiVersion = req("api_version"),
          loginUrl = get("salesforce", "login_url").filter(_.nonEmpty),
          instanceUrl = get("salesforce", "instance_url").filter(_.nonEmpty)))
      }
    }

    /** CLI option defaults derived from the file; explicit flags
      * override by map-merge order. Keys mirror the CLI surface:
      * `--jdbc`, `--schema`, `--quote-name`, `--dir` (gc's staging
      * root = the reference's job_dir).
      */
    def cliDefaults: Map[String, String] =
      (jdbcUrl.map("jdbc" -> _) ++
        get("postgresql", "schema").map("schema" -> _) ++
        getBoolean("postgresql", "quote_name").map(q => "quote-name" -> q.toString) ++
        get("DEFAULT", "job_dir").map("dir" -> _)).toMap
  }

  def parse(text: String): Config = {
    var section = "DEFAULT"
    val out = scala.collection.mutable.Map.empty[String, Map[String, String]]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
        } else {
          val sepEq = line.indexOf('=')
          val sepCo = line.indexOf(':')
          val sep = (sepEq, sepCo) match {
            case (-1, c) => c
            case (e, -1) => e
            case (e, c) => math.min(e, c)
          }
          require(sep > 0, s"config line is not 'key = value': '$line'")
          val key = line.substring(0, sep).trim.toLowerCase
          val value = line.substring(sep + 1).trim
          out(section) = out.getOrElse(section, Map.empty) + (key -> value)
        }
      }
    }
    Config(out.toMap)
  }

  def load(path: String): Config = {
    val p = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.isReadable(p), s"cannot read config file $path")
    parse(java.nio.file.Files.readString(p))
  }
}
