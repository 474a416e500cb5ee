package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConnectorAuth, Settings}

/** R5: the templated settings contract — dotenv precedence, ERB-style ENV
  * interpolation, the YAML subset, Spark-conf overrides, and the R13 wiring
  * that consumes it. Shapes mirror /root/reference/config/settings.yml. */
class SettingsSpec extends AnyFunSuite {

  private val template =
    """microsoft: # https://aad.portal.azure.com/...
      |  client_id: <%= ENV['MICROSOFT_CLIENT_ID'] %>
      |  client_secret: <%= ENV['MICROSOFT_CLIENT_SECRET'] %>
      |  scope: 'offline_access Files.ReadWrite.All'
      |seamless: # https://example.seamlessdocs.com/account/api_management
      |  api_key: <%= ENV['SEAMLESS_API_KEY'] %>
      |  secret: ${SEAMLESS_SECRET}
      |""".stripMargin

  test("renders ENV placeholders; quoted scalars keep spacing; comments ignored") {
    val s = Settings.load(template, None,
      sysEnv = Map(
        "MICROSOFT_CLIENT_ID" -> "cid-1", "MICROSOFT_CLIENT_SECRET" -> "cs-2",
        "SEAMLESS_API_KEY" -> "ak-3", "SEAMLESS_SECRET" -> "sec-4"))
    assert(s("microsoft", "client_id") === "cid-1")
    assert(s("microsoft", "scope") === "offline_access Files.ReadWrite.All")
    assert(s("seamless", "api_key") === "ak-3")
    assert(s("seamless", "secret") === "sec-4")
  }

  test("dotenv contributes but never overrides the real environment") {
    val dotenv =
      """# local development credentials
        |MICROSOFT_CLIENT_ID=from-dotenv
        |export SEAMLESS_API_KEY="quoted key"
        |""".stripMargin
    val s = Settings.load(template, Some(dotenv),
      sysEnv = Map("MICROSOFT_CLIENT_ID" -> "from-real-env"))
    assert(s("microsoft", "client_id") === "from-real-env")
    assert(s("seamless", "api_key") === "quoted key")
  }

  test("unset variables render empty, like ERB nil-interpolation") {
    val s = Settings.load(template, None, sysEnv = Map.empty)
    assert(s("microsoft", "client_id") === "")
  }

  test("missing keys are fatal on apply, None on get") {
    val s = Settings.load(template, None, sysEnv = Map.empty)
    assert(s.get("microsoft", "tenant_id").isEmpty)
    assert(s.get("absent_section", "x").isEmpty)
    intercept[IllegalArgumentException](s("microsoft", "tenant_id"))
  }

  test("malformed lines and broken indentation are fatal, not skipped") {
    intercept[IllegalArgumentException](Settings.parseYaml("no colon here"))
    intercept[IllegalArgumentException](
      Settings.parseYaml("a:\n  b: 1\n    c: 2\n"))
  }

  test("Spark conf overrides win over the file (cluster secret path)") {
    val spark = SparkSpec.session
    spark.conf.set("spark.graft.settings.microsoft.client_secret", "vaulted")
    try {
      val s = Settings.withSparkOverrides(
        Settings.load(template, None,
          sysEnv = Map("MICROSOFT_CLIENT_SECRET" -> "from-env")), spark)
      assert(s("microsoft", "client_secret") === "vaulted")
      assert(s("microsoft", "scope") === "offline_access Files.ReadWrite.All")
    } finally spark.conf.unset("spark.graft.settings.microsoft.client_secret")
  }

  test("R13 wiring: the token request draws its credentials from settings") {
    val s = Settings.load(template, None, sysEnv = Map(
      "MICROSOFT_CLIENT_ID" -> "id%x", "MICROSOFT_CLIENT_SECRET" -> "s&t"))
    val (url, body) = ConnectorAuth.tokenRequestFrom(
      s, "https://login.example.test/oauth2/v2.0/token")
    assert(url.endsWith("/token"))
    assert(body.contains("client_id=id%25x")) // url-encoded
    assert(body.contains("client_secret=s%26t"))
    assert(body.contains("scope=offline_access+Files.ReadWrite.All"))
  }

  test("loadFile round-trips through real files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-settings")
    val yml = dir.resolve("settings.yml")
    val env = dir.resolve(".env")
    java.nio.file.Files.writeString(yml, template)
    java.nio.file.Files.writeString(env, "SEAMLESS_SECRET=file-secret\n")
    val s = Settings.loadFile(yml.toString, Some(env.toString), sysEnv = Map.empty)
    assert(s("seamless", "secret") === "file-secret")
  }
}
