package graft.util

/** Minimal deterministic JSON rendering for the engine's VARIANT-shaped
  * report documents (the reference returns nested dict/list VARIANTs from
  * every procedure, e.g. `/root/reference/Data_Quality_Table.sql:183-189`).
  * Insertion order of [[JObj]] fields is preserved so documents are
  * byte-stable for golden tests. No parser — Spark's `from_json` /
  * `spark.read.json` covers the read side.
  */
sealed trait JValue { def render: String }

final case class JStr(v: String) extends JValue {
  def render: String = "\"" + v.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

final case class JNum(v: BigDecimal) extends JValue {
  def render: String =
    if (v.isWhole && v.abs < BigDecimal(Long.MaxValue))
      v.toLongExact.toString
    else v.bigDecimal.toPlainString
}

/** Floating-point value: always renders with a decimal point (matching
  * Python's `json.dumps(1.0)` → "1.0"), so score fields keep their float
  * identity through parse round-trips.
  */
final case class JDouble(v: Double) extends JValue {
  def render: String =
    if (v.isNaN || v.isInfinite) "null"
    else {
      val bd = BigDecimal(v)
      if (bd.isWhole) bd.toLongExact.toString + ".0"
      else bd.bigDecimal.toPlainString
    }
}

final case class JBool(v: Boolean) extends JValue {
  def render: String = v.toString
}

case object JNull extends JValue { def render: String = "null" }

final case class JArr(items: Seq[JValue]) extends JValue {
  def render: String = items.map(_.render).mkString("[", ",", "]")
}

final case class JObj(fields: Seq[(String, JValue)]) extends JValue {
  def render: String = fields
    .map { case (k, v) => s"${JStr(k).render}:${v.render}" }
    .mkString("{", ",", "}")
}

object JValue {
  def of(v: Any): JValue = v match {
    case null => JNull
    case None => JNull
    case Some(x) => of(x)
    case j: JValue => j
    case s: String => JStr(s)
    case b: Boolean => JBool(b)
    case i: Int => JNum(BigDecimal(i))
    case l: Long => JNum(BigDecimal(l))
    case d: Double => JDouble(d)
    case b: BigDecimal => JNum(b)
    case m: Map[_, _] =>
      JObj(m.toSeq.map { case (k, x) => k.toString -> of(x) })
    case xs: Seq[_] => JArr(xs.map(of))
    case other => JStr(other.toString)
  }
}
