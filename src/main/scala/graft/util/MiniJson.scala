package graft.util

/** Minimal recursive-descent JSON parser (no dependencies).
  *
  * Exists so gate-relevant artifacts ([[graft.Bench]]'s read of
  * `BASELINE_QUERIES.json`) are parsed structurally instead of with
  * entry-scoped regexes: a `}` or a quoted `"idle"` token inside a
  * hand-edited note field can corrupt nothing (VERDICT r16 task #6).
  * Strict where it matters for the ledger (rejects trailing garbage,
  * unterminated strings/objects, malformed numbers — all with a
  * character offset), and deliberately small: no streaming, no
  * serialization, not for data-plane use (Spark owns that).
  */
object MiniJson {

  sealed trait JVal {
    /** Object field lookup; JNull for anything that isn't there. */
    def \(key: String): JVal = this match {
      case JObj(fields) =>
        fields.collectFirst { case (k, v) if k == key => v }.getOrElse(JNull)
      case _ => JNull
    }
    def num: Option[Double] = this match {
      case JNum(d) => Some(d); case _ => None
    }
    def str: Option[String] = this match {
      case JStr(s) => Some(s); case _ => None
    }
    def arr: Option[Vector[JVal]] = this match {
      case JArr(xs) => Some(xs); case _ => None
    }
    def obj: Option[Vector[(String, JVal)]] = this match {
      case JObj(fs) => Some(fs); case _ => None
    }
  }
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JStr(value: String) extends JVal
  final case class JNum(value: Double) extends JVal
  final case class JBool(value: Boolean) extends JVal
  case object JNull extends JVal

  /** Parse one complete JSON document; throws IllegalArgumentException
    * with the offending character offset on malformed input. */
  def parse(text: String): JVal = {
    val p = new Parser(text)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content after top-level value")
    v
  }

  private final class Parser(s: String) {
    private var i = 0

    def atEnd: Boolean = i >= s.length

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"JSON parse error at offset $i: $msg" +
          (if (atEnd) " (end of input)"
           else s" (found '${s.charAt(i)}')"))

    def skipWs(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
             s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def parseValue(): JVal = {
      skipWs()
      if (atEnd) fail("expected a value")
      s.charAt(i) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JStr(parseString())
        case 't' => parseLiteral("true", JBool(true))
        case 'f' => parseLiteral("false", JBool(false))
        case 'n' => parseLiteral("null", JNull)
        case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
        case _ => fail("expected a value")
      }
    }

    private def parseLiteral(lit: String, v: JVal): JVal = {
      if (!s.startsWith(lit, i)) fail(s"expected '$lit'")
      i += lit.length
      v
    }

    private def parseObject(): JObj = {
      expect('{')
      val fields = Vector.newBuilder[(String, JVal)]
      skipWs()
      if (!atEnd && s.charAt(i) == '}') { i += 1; return JObj(fields.result()) }
      while (true) {
        skipWs()
        val key = parseString()
        skipWs(); expect(':')
        fields += key -> parseValue()
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return JObj(fields.result())
          case _   => fail("expected ',' or '}' in object")
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def parseArray(): JArr = {
      expect('[')
      val items = Vector.newBuilder[JVal]
      skipWs()
      if (!atEnd && s.charAt(i) == ']') { i += 1; return JArr(items.result()) }
      while (true) {
        items += parseValue()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return JArr(items.result())
          case _   => fail("expected ',' or ']' in array")
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(i)
        c match {
          case '"' => i += 1; return sb.toString
          case '\\' =>
            i += 1
            if (atEnd) fail("unterminated escape")
            val e = s.charAt(i)
            i += 1
            e match {
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case '/'  => sb.append('/')
              case 'b'  => sb.append('\b')
              case 'f'  => sb.append('\f')
              case 'n'  => sb.append('\n')
              case 'r'  => sb.append('\r')
              case 't'  => sb.append('\t')
              case 'u'  =>
                if (i + 4 > s.length) fail("truncated \\u escape")
                val hex = s.substring(i, i + 4)
                val cp = try Integer.parseInt(hex, 16) catch {
                  case _: NumberFormatException => fail(s"bad \\u escape '$hex'")
                }
                sb.append(cp.toChar)
                i += 4
              case _ => fail(s"bad escape '\\$e'")
            }
          case c if c < ' ' => fail("raw control character in string")
          case c => sb.append(c); i += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def parseNumber(): JNum = {
      val start = i
      if (!atEnd && s.charAt(i) == '-') i += 1
      while (!atEnd && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      if (!atEnd && s.charAt(i) == '.') {
        i += 1
        while (!atEnd && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (!atEnd && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (!atEnd && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (!atEnd && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      val lit = s.substring(start, i)
      val d = try lit.toDouble catch {
        case _: NumberFormatException => fail(s"bad number '$lit'")
      }
      JNum(d)
    }
  }
}
