package graft.kg

/**
 * Deterministic HTML→text extraction (north-rule per-row invariant:
 * byte-identical extracted text per url, /root/repo/BASELINE.json input_hint).
 *
 * A small, fully-specified extractor — NOT a best-effort browser emulation:
 * the contract is determinism and byte-stability across runs/JVMs, pinned by
 * golden tests. Pure function bytes → String; no locale, no wall clock.
 *
 * Rules (applied in order):
 *  1. decode input as UTF-8 (malformed bytes → U+FFFD, the JDK default);
 *  2. drop <script>/<style>/<!-- --> blocks (case-insensitive);
 *  3. block-level tags (p, div, br, h1-h6, li, ul, ol, tr, table, title,
 *     head, body, html, section, article, header, footer) become '\n';
 *     every other tag becomes '';
 *  4. decode entities: &amp; &lt; &gt; &quot; &apos; &nbsp; and numeric
 *     &#NNN; / &#xHH;;
 *  5. collapse [ \t\r\x0B\f]+ → ' ', trim each line, drop empty lines,
 *     join the survivors with '\n'.
 *
 * Implementation: staged character scanners — this stage dominates the
 * fused flagship kernel's wall time, and the scanner form is ~3x cheaper
 * than the regex pipeline it replaced. The original regex pipeline is kept
 * verbatim as [[regexReference]] (the executable spec): TextExtractSpec
 * asserts byte-equality scanner↔regex over the golden corpus, adversarial
 * fixtures (unclosed constructs, tags-inside-tags, entity chains), and
 * randomized HTML-ish inputs, so the two can never drift apart silently.
 */
object TextExtract {

  // ---------------------------------------------------------------------------
  // The executable spec: the original regex pipeline, used ONLY by tests to
  // differential-check the scanner. Do not call from the hot path.
  // ---------------------------------------------------------------------------
  private val scriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val comments = "(?s)<!--.*?-->".r
  private val blockTag =
    "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|title|head|body|html|section|article|header|footer)\\b[^>]*/?>".r
  private val anyTag = "(?s)<[^>]*>".r
  private val numericEntity = "&#(x[0-9a-fA-F]+|[0-9]+);".r

  /** Parse a numeric-entity digit run safely (shared by the scanner and
    * this regex spec so differential parity holds): leading zeros stripped,
    * then a length cap — 6 hex / 7 decimal digits, anything longer exceeds
    * U+10FFFF — guards `Integer.parseInt` against NumberFormatException on
    * adversarial runs like `&#99999999999999;`. Returns -1 for
    * invalid/overlong (callers emit the replacement char). */
  private[kg] def entityCodePoint(body: String, hex: Boolean): Int = {
    var i = 0
    while (i < body.length - 1 && body.charAt(i) == '0') i += 1
    val t = body.substring(i)
    if (t.length > (if (hex) 6 else 7)) -1
    else {
      val cp = Integer.parseInt(t, if (hex) 16 else 10)
      if (Character.isValidCodePoint(cp)) cp else -1
    }
  }

  private def decodeEntitiesRegex(s: String): String = {
    val numeric = numericEntity.replaceAllIn(s, m => {
      val body = m.group(1)
      val hex = body.startsWith("x")
      val cp = entityCodePoint(if (hex) body.substring(1) else body, hex)
      if (cp >= 0)
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      else "�"
    })
    numeric
      .replace("&nbsp;", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <
  }

  private[kg] def regexReference(html: Array[Byte]): String = {
    val raw = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    var s = comments.replaceAllIn(scriptStyle.replaceAllIn(raw, ""), "")
    s = blockTag.replaceAllIn(s, "\n")
    s = anyTag.replaceAllIn(s, "")
    s = decodeEntitiesRegex(s)
    s.split("\n", -1).iterator
      .map(_.replaceAll("[ \\t\\r\\x0B\\f]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  // ---------------------------------------------------------------------------
  // The production scanner.
  // ---------------------------------------------------------------------------

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Case-insensitive match of `lit` (lowercase) at s[i..). */
  @inline private def matchesCI(s: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > s.length) return false
    var k = 0
    while (k < lit.length) {
      val c = s.charAt(i + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Stage 1 of rule 2: `<script…>…</script>` / `<style…>…</style>` spans
    * (regex semantics: opener needs a terminating '>', closer is the NEAREST
    * `</name\s*>`; unmatched constructs pass through untouched). */
  private def stripScriptStyle(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '<') {
        val name =
          if (matchesCI(s, i + 1, "script") && (i + 7 >= n || !isWord(s.charAt(i + 7)))) "script"
          else if (matchesCI(s, i + 1, "style") && (i + 6 >= n || !isWord(s.charAt(i + 6)))) "style"
          else null
        if (name != null) {
          // opener: [^>]* then '>'
          var j = i + 1 + name.length
          while (j < n && s.charAt(j) != '>') j += 1
          if (j < n) {
            // closer: nearest </name\s*>
            var k = j + 1
            var end = -1
            while (end < 0 && k < n) {
              if (s.charAt(k) == '<' && k + 1 < n && s.charAt(k + 1) == '/' &&
                  matchesCI(s, k + 2, name)) {
                // \s in Java regex = [ \t\n\x0B\f\r] (ASCII only)
                var m = k + 2 + name.length
                while (m < n && isRegexWs(s.charAt(m))) m += 1
                if (m < n && s.charAt(m) == '>') end = m
              }
              k += 1
            }
            if (end >= 0) { i = end + 1; consumed = true }
          }
        }
      }
      if (!consumed) { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Stage 2 of rule 2: `<!-- … -->` (nearest closer; unmatched stays). */
  private def stripComments(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<' && i + 3 < n && s.charAt(i + 1) == '!' &&
          s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
        val end = s.indexOf("-->", i + 4)
        if (end >= 0) i = end + 3
        else { out.append('<'); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private val blockNames: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "tr", "table", "title", "head", "body", "html", "section", "article",
    "header", "footer")

  /** Rule 3a: block tags → '\n'. Runs BEFORE general tag removal, exactly
    * like the regex pipeline — a block tag nested inside a malformed outer
    * `<…` still becomes a newline (`<x <p>` keeps "<x " and yields '\n'). */
  private def blockTagsToNewlines(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var consumed = false
      if (s.charAt(i) == '<') {
        var j = i + 1
        if (j < n && s.charAt(j) == '/') j += 1
        val nameStart = j
        while (j < n && isWord(s.charAt(j))) j += 1
        if (j > nameStart && blockNames.contains(s.substring(nameStart, j).toLowerCase)) {
          var k = j
          while (k < n && s.charAt(k) != '>') k += 1
          if (k < n) { out.append('\n'); i = k + 1; consumed = true }
        }
      }
      if (!consumed) { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Rule 3b: every remaining `<…>` → '' (no '>' ⇒ literal text). */
  private def stripTags(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        var j = i + 1
        while (j < n && s.charAt(j) != '>') j += 1
        if (j < n) i = j + 1
        else { out.append(s.charAt(i)); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Rule 4a: numeric entities (own pass: their output can feed the named
    * pass — `&#38;lt;` → `&lt;` → '<', matching the regex pipeline). */
  private def decodeNumericEntities(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var consumed = false
      if (s.charAt(i) == '&' && i + 2 < n && s.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < n && s.charAt(j) == 'x' // regex accepts lowercase x only
        if (hex) j += 1
        val digitStart = j
        while (j < n && (if (hex) isHexDigit(s.charAt(j)) else s.charAt(j) >= '0' && s.charAt(j) <= '9')) j += 1
        if (j > digitStart && j < n && s.charAt(j) == ';') {
          val body = s.substring(digitStart, j)
          val cp = entityCodePoint(body, hex) // overflow-safe (shared helper)
          if (cp >= 0) out.appendCodePoint(cp)
          else out.append('�')
          i = j + 1
          consumed = true
        }
      }
      if (!consumed) { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  @inline private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  @inline private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isCollapsible(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\u000B' || c == '\f'

  /** Rules 4b + 5 fused: named entities, whitespace collapse, per-line trim
    * (String.trim semantics: both edges shed chars <= U+0020), empty-line
    * drop, '\n' join. */
  private def decodeNamedAndJoinLines(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    val line = new java.lang.StringBuilder(128)
    var pendingSpace = false

    def put(c: Char): Unit = {
      if (c == '\n') flush()
      else if (isCollapsible(c)) pendingSpace = true
      else {
        if (pendingSpace) { line.append(' '); pendingSpace = false }
        line.append(c)
      }
    }
    def flush(): Unit = {
      // trim: drop chars <= ' ' at both edges (String.trim semantics)
      var a = 0
      var b = line.length
      while (a < b && line.charAt(a) <= ' ') a += 1
      while (b > a && line.charAt(b - 1) <= ' ') b -= 1
      if (b > a) {
        if (out.length > 0) out.append('\n')
        out.append(line, a, b)
      }
      line.setLength(0)
      pendingSpace = false
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        if (matchesExact(s, i, "&nbsp;")) { put(' '); i += 6 }
        else if (matchesExact(s, i, "&lt;")) { put('<'); i += 4 }
        else if (matchesExact(s, i, "&gt;")) { put('>'); i += 4 }
        else if (matchesExact(s, i, "&quot;")) { put('"'); i += 6 }
        else if (matchesExact(s, i, "&apos;")) { put('\''); i += 6 }
        else if (matchesExact(s, i, "&amp;")) { put('&'); i += 5 }
        else { put(c); i += 1 }
      } else { put(c); i += 1 }
    }
    flush()
    out.toString
  }

  @inline private def matchesExact(s: String, i: Int, lit: String): Boolean =
    i + lit.length <= s.length && s.regionMatches(i, lit, 0, lit.length)

  def extract(html: Array[Byte]): String = {
    val raw = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    decodeNamedAndJoinLines(
      decodeNumericEntities(
        stripTags(
          blockTagsToNewlines(
            stripComments(
              stripScriptStyle(raw))))))
  }
}
