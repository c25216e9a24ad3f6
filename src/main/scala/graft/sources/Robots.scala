package graft.sources

/** Dep-free robots.txt evaluation (RFC 9309) — the crawl pipeline's
  * admission filter: a frontier at scale joins candidate URLs against
  * per-host robots policies before fetch, and a training-data audit
  * wants "was this page even crawlable" as a column. Pure functions.
  *
  * Semantics implemented (and spec-pinned):
  *   - `field: value` lines, field names case-insensitive, `#` comments
  *     stripped, unknown fields ignored, blank lines do NOT end a group
  *     (only a new `user-agent` run after rules does — RFC 9309 §2.2.1);
  *   - consecutive `user-agent` lines share one rule group;
  *   - group selection: the MOST SPECIFIC matching agent wins — longest
  *     product-token match (case-insensitive substring-at-start of the
  *     agent string), `*` only when nothing matches; all groups for the
  *     chosen token merge;
  *   - rule matching: patterns match from the path start, `*` matches
  *     any span, `$` anchors the end; the LONGEST (in octets) matching
  *     pattern wins, ties prefer ALLOW; no matching rule = allowed;
  *     empty `disallow:` value = no rule (classic allow-all idiom);
  *   - missing/unfetchable robots.txt = allow (pass "" in).
  */
object Robots {

  final case class Group(agents: Seq[String], rules: Seq[(Boolean, String)])

  /** Parse into rule groups (order preserved). */
  def parse(txt: String): Seq[Group] = {
    if (txt == null) return Seq.empty
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = scala.collection.mutable.ArrayBuffer[String]()
    var rules = scala.collection.mutable.ArrayBuffer[(Boolean, String)]()
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.ArrayBuffer[String]()
      rules = scala.collection.mutable.ArrayBuffer[(Boolean, String)]()
    }
    txt.split("\r?\n").foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h) }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush() // a new agent run after rules starts a new group
            agents += value.toLowerCase
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            // empty disallow = explicit allow-all idiom -> no rule;
            // empty allow is equally a no-op
            if (value.nonEmpty) rules += ((field == "allow", value))
          case _ => inAgents = false // crawl-delay, sitemap, unknown: not rules
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** Does `pattern` (with `*` spans and optional `$` end anchor) match
    * a prefix of `path`? Greedy backtracking over the `*` split parts. */
  private[sources] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1) // keep empty parts: "a**b", trailing "*"
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part, 0)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last part must match at the END of the path
        return path.length - part.length >= pos && path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** The rules governing `agent` (lowercased product-token matching,
    * `*` fallback), merged across its groups. */
  private def rulesFor(groups: Seq[Group], agent: String): Seq[(Boolean, String)] = {
    val a = agent.toLowerCase
    // most specific = the longest agent token that prefixes our agent
    val tokens = groups.flatMap(_.agents).filter(t => t != "*" && a.startsWith(t))
    val chosen = if (tokens.isEmpty) "*" else tokens.maxBy(_.length)
    groups.filter(_.agents.exists(t =>
      if (chosen == "*") t == "*" else t == chosen)).flatMap(_.rules)
  }

  /** RFC 9309 decision for (agent, path). */
  def allowed(robotsTxt: String, agent: String, path: String): Boolean = {
    val rules = rulesFor(parse(robotsTxt), agent)
    val matching = rules.filter { case (_, pat) => patternMatches(pat, path) }
    if (matching.isEmpty) true
    else {
      // longest pattern wins; ties prefer allow (so: allowed iff any
      // max-length match is an allow rule)
      val maxLen = matching.map(_._2.length).max
      matching.filter(_._2.length == maxLen).exists(_._1)
    }
  }
}
