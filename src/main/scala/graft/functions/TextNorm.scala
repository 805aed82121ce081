package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text normalization kernel — the fused form of the reference's
  * clean_text chain (scripts/convert-text.py:62-87): HTML-entity unescape,
  * possessive-'s separation, punctuation padding, lowercasing, whitespace
  * collapse — one character scan, zero regex, zero intermediate strings.
  * Replaces a 7-pass regexp_replace chain in the normalize hot path (each
  * regex pass re-reads the full string; at 100 TB that is 7× the scan I/O).
  * Idempotent (property-tested in NormalizeSpec).
  *
  * Entity coverage matches the reference's `html.unescape`
  * (conver_test.py:88) for every numeric character reference
  * (`&#NNNN;` / `&#xHHHH;`, incl. astral code points via surrogate pairs)
  * and the full HTML4 named-entity set (commons-text EntityArrays — ~250
  * names, the table `html.unescape` extends with HTML5-only additions).
  * Unknown entities pass through unchanged, exactly like html.unescape;
  * a trailing `;` is required (the reference's corpus never uses the
  * browser-quirk semicolon-less form). Invalid/control numeric references
  * follow html.unescape's HTML5 tables bit-for-bit: `&#0;`/surrogates/
  * out-of-range → U+FFFD, 0x80–0x9F → windows-1252, the invalid-codepoint
  * set (C0 controls, noncharacters) → deleted.
  *
  * Possessive rule (reference parity, conver_test.py:85
  * `x.replace("'s", " 's")`): apostrophe + LOWERCASE `s`, no word-boundary
  * condition — applied to the unescaped character stream, so `&#39;s`
  * splits too (the reference runs replace before unescape and misses that
  * case; splitting is strictly more consistent and is pinned by golden).
  */
object TextNorm {

  /** Punctuation padded with spaces (apostrophe handled by the 's rule). */
  private val punct: Array[Boolean] = {
    val p = new Array[Boolean](128)
    "!\"#$%&()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => p(c) = true)
    p
  }

  private def isPunct(c: Char): Boolean = c < 128 && punct(c)
  private def isWs(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** name (without & and ;) → replacement string, from the commons-text
    * HTML4 unescape tables (BASIC + ISO-8859-1 + HTML40_EXTENDED + apos). */
  private val namedEntities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](1024)
    def add(tbl: java.util.Map[CharSequence, CharSequence]): Unit = {
      val it = tbl.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey.toString // "&amp;"
        if (k.length > 2 && k.charAt(0) == '&' && k.charAt(k.length - 1) == ';')
          m.put(k.substring(1, k.length - 1), e.getValue.toString)
      }
    }
    import org.apache.commons.text.translate.EntityArrays
    add(EntityArrays.BASIC_UNESCAPE)
    add(EntityArrays.ISO8859_1_UNESCAPE)
    add(EntityArrays.HTML40_EXTENDED_UNESCAPE)
    m.put("apos", "'")
    m
  }

  /** Longest HTML4 entity name is 8 chars ("thetasym"); numeric forms are
    * bounded by 10 (&#x10FFFF;). Scan cap for the closing ';'. */
  private val MaxEntityLen = 12

  /** Numeric references can carry arbitrarily many digits in html.unescape
    * (huge values resolve to U+FFFD, not passthrough) — wider scan cap. */
  private val MaxNumericLen = 34

  /** Numeric-reference remap table, exactly Python's
    * `html._invalid_charrefs` (the HTML5 windows-1252 compatibility table):
    * `&#0;` → U+FFFD, `&#13;` → CR, and 0x80–0x9F → the windows-1252
    * printables (e.g. `&#128;` → €, `&#146;` → ’). */
  private val invalidCharrefs: java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String](64)
    m.put(0x00, "�")
    m.put(0x0D, "\r")
    val win1252 = Array(
      0x20AC, 0x81, 0x201A, 0x192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x2C6, 0x2030, 0x160, 0x2039, 0x152, 0x8D, 0x17D, 0x8F,
      0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x2DC, 0x2122, 0x161, 0x203A, 0x153, 0x9D, 0x17E, 0x178)
    var i = 0
    while (i < 32) { m.put(0x80 + i, new String(Character.toChars(win1252(i)))); i += 1 }
    m
  }

  /** Python's `html._invalid_codepoints`: numeric references resolving here
    * are DELETED (empty replacement). 0x80–0x9F never reach this test — the
    * charref table above catches them first, as in html.unescape. */
  private def isInvalidCodepoint(cp: Int): Boolean =
    (cp >= 0x01 && cp <= 0x08) || cp == 0x0B || (cp >= 0x0E && cp <= 0x1F) ||
      (cp >= 0x7F && cp <= 0x9F) || (cp >= 0xFDD0 && cp <= 0xFDEF) ||
      (cp & 0xFFFE) == 0xFFFE

  /** Resolve the entity starting at s(i)=='&'. Returns the replacement
    * string and (via the 1-elem out param) the source chars consumed, or
    * null if this is not a well-formed known entity. */
  private def resolveEntity(s: String, i: Int, n: Int, consumedOut: Array[Int]): String = {
    var semi = -1
    var j = i + 1
    val numeric = j < n && s.charAt(j) == '#'
    val maxLen = if (numeric) MaxNumericLen else MaxEntityLen
    val cap = math.min(n, i + maxLen + 2)
    while (j < cap && semi < 0) {
      val c = s.charAt(j)
      if (c == ';') semi = j
      else if (c == '&' || isWs(c)) return null // malformed: abort early
      j += 1
    }
    if (semi <= i + 1) return null
    val body = s.substring(i + 1, semi)
    consumedOut(0) = semi - i + 1
    if (body.charAt(0) == '#') {
      // numeric reference: &#NNNN; or &#xHHHH; / &#XHHHH;. Resolution follows
      // html.unescape exactly: windows-1252 remap table first, then
      // surrogates / out-of-range → U+FFFD, then the HTML5 invalid-codepoint
      // set → deleted, else the code point itself.
      if (body.length < 2) return null
      val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
      val digits = if (hex) body.substring(2) else body.substring(1)
      if (digits.isEmpty) return null
      var cp = 0
      var k = 0
      while (k < digits.length) {
        val d = Character.digit(digits.charAt(k), if (hex) 16 else 10)
        if (d < 0) return null // non-digit chars: not a numeric ref at all
        cp = cp * (if (hex) 16 else 10) + d
        if (cp > 0x10FFFF) cp = 0x110000 // saturate: "too big" is all we need
        k += 1
      }
      val remapped = invalidCharrefs.get(cp)
      if (remapped != null) remapped
      else if ((cp >= 0xD800 && cp <= 0xDFFF) || cp > 0x10FFFF) "�"
      else if (isInvalidCodepoint(cp)) ""
      else new String(Character.toChars(cp))
    } else {
      namedEntities.get(body) // null when unknown → caller falls through
    }
  }

  def normalize(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n + 16)
    var pendingSpace = false

    def emit(c: Char): Unit = {
      if (sb.length() > 0 && pendingSpace) sb.append(' ')
      pendingSpace = false
      sb.append(Character.toLowerCase(c))
    }
    def emitPadded(c: Char): Unit = { // punctuation: space before and after
      pendingSpace = sb.length() > 0
      emit(c)
      pendingSpace = true
    }
    // route one unescaped char through the state machine; `nextChar` is the
    // following char of the UNESCAPED stream (possessive lookahead), -1 = none
    def handle(c: Char, nextChar: Int): Boolean = { // returns true iff possessive fired
      if (isWs(c)) { pendingSpace = pendingSpace || sb.length() > 0; false }
      else if (c == '\'' && nextChar == 's') {
        // possessive: 's becomes " 's" (reference conver_test.py:85 —
        // lowercase s only, no boundary, no space appended after)
        pendingSpace = sb.length() > 0
        emit('\''); emit('s')
        true
      } else if (isPunct(c)) { emitPadded(c); false }
      else { emit(c); false }
    }

    val consumedOut = new Array[Int](1)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = 1
      var repl: String = null
      if (c == '&') {
        repl = resolveEntity(s, i, n, consumedOut)
        if (repl != null) consumed = consumedOut(0)
      }
      if (repl == null) {
        val nxt = if (i + 1 < n) s.charAt(i + 1).toInt else -1
        if (handle(c, nxt)) consumed = 2 // consumed the source 's
      } else {
        var k = 0
        val m = repl.length
        while (k < m) {
          val rc = repl.charAt(k)
          val nxt =
            if (k + 1 < m) repl.charAt(k + 1).toInt
            else if (i + consumed < n) s.charAt(i + consumed).toInt
            else -1
          if (handle(rc, nxt)) {
            if (k + 1 < m) k += 1 // possessive s came from the repl itself
            else consumed += 1 // ... or from the source stream
          }
          k += 1
        }
      }
      i += consumed
    }
    sb.toString
  }

  def normalize(s: UTF8String): UTF8String = UTF8String.fromString(normalize(s.toString))
}
