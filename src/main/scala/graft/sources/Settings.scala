package graft.sources

/** The reference's templated connector configuration (SURVEY §2.1 R5):
  * config/settings.yml is an ERB template over ENV, with dotenv loading a
  * `.env` file first (/root/reference/config/settings.yml:1-7,
  * bin/copy-seamless-to-sharepoint.rb:2,16). Re-expressed engine-side,
  * dependency-free, with the same observable contract:
  *
  *   - an env file contributes variables but NEVER overrides the real
  *     environment (dotenv's documented precedence);
  *   - `<%= ENV['NAME'] %>` placeholders render to the variable's value,
  *     or to the empty string when unset (ERB interpolates nil as "");
  *     `${NAME}` is accepted as the engine-native spelling of the same;
  *   - the rendered document is a nested map: `key:` opens a section,
  *     `key: value` binds a scalar, `#` comments (including trailing ones,
  *     as on the reference's section lines) are ignored, quoted scalars
  *     keep their spacing (the reference quotes its scope string);
  *   - on a cluster, per-job overrides come from `SparkSession` conf keys
  *     `spark.graft.settings.<section>.<key>`, which win over the file —
  *     the `--conf`/secret-manager path a real deployment uses instead of
  *     shipping `.env` files to drivers.
  *
  * Lookups are `Option`-valued; `apply` is fatal-on-missing, mirroring the
  * reference's behavior of failing at connector construction rather than
  * sending half-configured requests.
  */
object Settings {

  /** A resolved settings tree: sections are nested maps, leaves strings. */
  final case class Resolved(root: Map[String, Any]) {
    def get(path: String*): Option[String] = {
      def walk(node: Any, rest: List[String]): Option[String] = (node, rest) match {
        case (s: String, Nil)             => Some(s)
        case (m: Map[_, _], k :: tl)      =>
          m.asInstanceOf[Map[String, Any]].get(k).flatMap(walk(_, tl))
        case _                            => None
      }
      walk(root, path.toList)
    }
    def apply(path: String*): String = get(path: _*).getOrElse(
      throw new IllegalArgumentException(
        s"settings: missing required key '${path.mkString(".")}'"))
    def section(name: String): Map[String, String] = root.get(name) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        .collect { case (k, v: String) => k -> v }
      case _ => Map.empty
    }
  }

  /** dotenv-style file: `KEY=VALUE` lines, optional `export ` prefix,
    * `#` comments and blanks ignored, quotes stripped. */
  def parseDotEnv(text: String): Map[String, String] =
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(l => if (l.startsWith("export ")) l.stripPrefix("export ").trim else l)
      .flatMap { l =>
        val eq = l.indexOf('=')
        if (eq <= 0) None
        else Some(l.substring(0, eq).trim -> unquote(l.substring(eq + 1)))
      }.toMap

  private val ErbRef    = """<%=\s*ENV\[['"]([A-Za-z0-9_]+)['"]\]\s*%>""".r
  private val DollarRef = """\$\{([A-Za-z0-9_]+)\}""".r

  /** Render `<%= ENV['X'] %>` / `${X}` placeholders; unset vars render
    * empty (ERB's nil-interpolation behavior). */
  def render(template: String, env: Map[String, String]): String = {
    val erb = ErbRef.replaceAllIn(template,
      m => java.util.regex.Matcher.quoteReplacement(env.getOrElse(m.group(1), "")))
    DollarRef.replaceAllIn(erb,
      m => java.util.regex.Matcher.quoteReplacement(env.getOrElse(m.group(1), "")))
  }

  /** The YAML subset the settings contract needs: nested maps by
    * indentation, scalar leaves, comments, quoted strings. (Deliberately
    * not a general YAML parser — no lists, anchors, or multi-line scalars;
    * unparseable lines are fatal, not skipped.) */
  def parseYaml(text: String): Map[String, Any] = {
    val items = text.linesIterator.map(stripComment)
      .filter(_.trim.nonEmpty)
      .map(l => (l.takeWhile(_ == ' ').length, l.trim)).toList
    def build(lines: List[(Int, String)], indent: Int): (Map[String, Any], List[(Int, String)]) = {
      var rest = lines
      var m = scala.collection.immutable.ListMap.empty[String, Any]
      while (rest.nonEmpty && rest.head._1 == indent) {
        val l = rest.head._2
        val ci = l.indexOf(':')
        require(ci > 0, s"settings: unparseable line '$l'")
        val key = l.substring(0, ci).trim
        val value = l.substring(ci + 1).trim
        rest = rest.tail
        if (value.isEmpty && rest.headOption.exists(_._1 > indent)) {
          val (child, r2) = build(rest, rest.head._1)
          m += key -> child
          rest = r2
        } else m += key -> unquote(value)
      }
      (m, rest)
    }
    val (root, leftover) = build(items, items.headOption.map(_._1).getOrElse(0))
    require(leftover.isEmpty,
      s"settings: bad indentation at '${leftover.head._2}'")
    root
  }

  /** Full pipeline: dotenv (real env wins) → template render → parse. */
  def load(yamlTemplate: String, dotEnvText: Option[String] = None,
           sysEnv: Map[String, String] = sys.env): Resolved = {
    val env = dotEnvText.map(parseDotEnv).getOrElse(Map.empty) ++ sysEnv
    Resolved(parseYaml(render(yamlTemplate, env)))
  }

  def loadFile(yamlPath: String, dotEnvPath: Option[String] = None,
               sysEnv: Map[String, String] = sys.env): Resolved = {
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    load(read(yamlPath), dotEnvPath.filter(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))).map(read), sysEnv)
  }

  /** Per-job overrides from SparkSession conf:
    * `spark.graft.settings.<section>.<key>` wins over the file value. */
  def withSparkOverrides(resolved: Resolved,
                         spark: org.apache.spark.sql.SparkSession): Resolved = {
    val Prefix = "spark.graft.settings."
    spark.conf.getAll.foldLeft(resolved) { case (acc, (k, v)) =>
      if (!k.startsWith(Prefix)) acc
      else k.stripPrefix(Prefix).split('.') match {
        case Array(section, key) =>
          val sec = acc.root.get(section) match {
            case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
            case _                  => Map.empty[String, Any]
          }
          Resolved(acc.root + (section -> (sec + (key -> v))))
        case _ => acc
      }
    }
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  private def stripComment(line: String): String = {
    var inS = false; var inD = false; var i = 0; var cut = -1
    while (i < line.length && cut < 0) {
      val c = line(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == '#' && !inS && !inD &&
               (i == 0 || line(i - 1).isWhitespace)) cut = i
      i += 1
    }
    if (cut >= 0) line.substring(0, cut) else line
  }
}
