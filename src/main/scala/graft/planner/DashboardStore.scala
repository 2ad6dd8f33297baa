package graft.planner

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Grafana dashboard key-value store with the reference's query-string
  * routing (reference: influx/finder/InfluxDashboardResolver.scala:44-118):
  * the Grafana Influx driver issues get/list/drop as pseudo-queries whose
  * shape encodes the operation — base64 dashboard name inside a
  * `"grafana.dashboard_<b64>"` table for get/drop, a regex for list.
  *
  * Storage is one file per dashboard (name base64url-encoded in the
  * filename, content = the opaque dashboard blob). Dashboards are a
  * driver-side dimension-store concern — a handful of KB, mutated by
  * humans — so a Spark job or distributed table would be the wrong tool;
  * on a cluster this directory lives on shared storage.
  */
class DashboardStore(dir: String) {

  // reference: InfluxDashboardResolver.scala:46-54
  private val GetDashboardPattern = "select.*_(.*)\".*".r
  private val ListDashboardsPattern = "select.*/(.*)/..*".r
  private val DropDashboardPattern = "drop.*_(.*)\".*".r

  new File(dir).mkdirs()

  case class Dashboard(name: String, content: Array[Byte])

  private def fileFor(name: String): File =
    new File(dir, Base64.getUrlEncoder.withoutPadding.encodeToString(
      name.getBytes("UTF-8")) + ".dash")

  private def nameOf(f: File): String =
    new String(Base64.getUrlDecoder.decode(f.getName.stripSuffix(".dash")), "UTF-8")

  def store(name: String, content: Array[Byte]): String = {
    Files.write(Paths.get(fileFor(name).getPath), content)
    name
  }

  def lookup(nameRegex: String): Seq[Dashboard] = {
    val p = java.util.regex.Pattern.compile(nameRegex)
    Option(new File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .filter(_.getName.endsWith(".dash"))
      .map(f => f -> nameOf(f))
      .filter { case (_, n) => p.matcher(n).matches() }
      .sortBy(_._2)
      .map { case (f, n) => Dashboard(n, Files.readAllBytes(f.toPath)) }
  }

  def drop(name: String): Unit = { fileFor(name).delete(); () }

  /** Route a Grafana pseudo-query (reference semantics: get decodes the
    * base64 name; list matches a case-insensitive regex; drop deletes;
    * anything else is unsupported). */
  def operation(expression: String): Seq[Dashboard] = expression match {
    case GetDashboardPattern(b64)  => lookup(java.util.regex.Pattern.quote(decode(b64)))
    case ListDashboardsPattern(re) => lookup(s"(?i)$re")
    case DropDashboardPattern(b64) => drop(decode(b64)); Seq.empty
    case other =>
      throw new UnsupportedOperationException(s"Unsupported grafana expression [$other]")
  }

  /** Store a Grafana dashboard POST payload — a JSON array whose HEAD
    * is the dashboard to save (reference semantics:
    * InfluxService.scala:76-82 `entity(as[Seq[Dashboard]])` →
    * InfluxDashboardResolver.scala:110-118 `store(dashboards.head)`).
    * The storage key is the base64-decoded segment after the last '_'
    * of the head's "name" field; the stored blob is the head object
    * itself, so a later get returns exactly what Grafana posted.
    * Returns the decoded name. */
  def storePosted(body: String): String = {
    val head = firstArrayElement(body)
    val name = topLevelStringField(head, "name")
      .getOrElse(throw new UnsupportedOperationException(
        "dashboard payload has no name field"))
    val decoded = decode(name.split("_").last)
    store(decoded, head.getBytes("UTF-8"))
    decoded
  }

  /** Value of the depth-1 string field `key` of a JSON object, found by
    * structural scan (strings and escapes respected) — so a nested
    * object's same-named key can never win, matching the reference's
    * Jackson binding of the TOP-LEVEL field. Returns the raw string
    * body (escape sequences intact — the name is base64 after the last
    * '_', which contains no escapes). */
  private def topLevelStringField(obj: String, key: String): Option[String] = {
    var i = obj.indexOf('{')
    if (i < 0) return None
    i += 1
    var depth = 1
    var pendingKey: String = null // depth-1 string awaiting its value
    while (i < obj.length && depth > 0) {
      obj(i) match {
        case '"' =>
          val start = i + 1
          var j = start
          var esc = false
          while (j < obj.length && (esc || obj(j) != '"')) {
            esc = !esc && obj(j) == '\\'
            j += 1
          }
          val body = obj.substring(start, j)
          if (depth == 1) {
            if (pendingKey == null) pendingKey = body // a key
            else { // the value of pendingKey
              if (pendingKey == key) return Some(body)
              pendingKey = null
            }
          }
          i = j + 1
        case '{' | '[' =>
          if (depth == 1) pendingKey = null // non-string value
          depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case ',' => if (depth == 1) pendingKey = null; i += 1
        case _ => i += 1
      }
    }
    None
  }

  /** First element of a JSON array, by depth scan (strings and escapes
    * respected) — enough structure for the fixed Grafana payload shape
    * without a JSON dependency. */
  private def firstArrayElement(body: String): String = {
    val s = body.trim
    require(s.startsWith("["), s"expected a JSON array of dashboards")
    var i = 1; var depth = 0; var inStr = false; var esc = false
    val start = s.indexWhere(!_.isWhitespace, 1)
    require(start >= 0 && s(start) == '{', "expected a dashboard object")
    i = start
    while (i < s.length) {
      val c = s(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return s.substring(start, i + 1)
        case _ =>
      }
      i += 1
    }
    throw new UnsupportedOperationException("unterminated dashboard object")
  }

  private def decode(b64: String): String =
    new String(Base64.getDecoder.decode(b64), "UTF-8")
}
