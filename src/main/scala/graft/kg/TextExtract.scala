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
 *  5. collapse [ \t\r]+ → ' ', trim each line, drop empty lines, join the
 *     survivors with '\n'.
 */
object TextExtract {

  private val scriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val comments = "(?s)<!--.*?-->".r
  private val blockTag =
    "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|title|head|body|html|section|article|header|footer)\\b[^>]*/?>".r
  private val anyTag = "(?s)<[^>]*>".r
  private val numericEntity = "&#(x[0-9a-fA-F]+|[0-9]+);".r

  private def decodeEntities(s: String): String = {
    val numeric = numericEntity.replaceAllIn(s, m => {
      val body = m.group(1)
      val cp = if (body.startsWith("x") || body.startsWith("X"))
        Integer.parseInt(body.substring(1), 16) else Integer.parseInt(body)
      if (Character.isValidCodePoint(cp))
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      else "�"
    })
    numeric
      .replace("&nbsp;", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <
  }

  def extract(html: Array[Byte]): String = {
    val raw = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    var s = comments.replaceAllIn(scriptStyle.replaceAllIn(raw, ""), "")
    s = blockTag.replaceAllIn(s, "\n")
    s = anyTag.replaceAllIn(s, "")
    s = decodeEntities(s)
    s.split("\n", -1).iterator
      .map(_.replaceAll("[ \\t\\r\\x0B\\f]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }
}
