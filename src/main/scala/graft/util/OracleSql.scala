package graft.util

/** SQL-literal rendering for DuckDB oracles that must round-trip
  * doubles EXACTLY. A plain decimal literal (`0.0183032254486450024`)
  * types as DECIMAL in DuckDB, and array-literal type unification then
  * truncates mixed-precision elements BEFORE any `::DOUBLE[]` cast
  * (measured r11: 12 of 64 centroid elements lost 1–2 ulp, which
  * surfaced as a hash-CLOSE on the k-means lane). E-notation literals
  * always type as DOUBLE and parse correctly rounded, so every oracle
  * that embeds trained doubles must render through here.
  */
object OracleSql {

  /** `x` as a literal DuckDB parses to exactly the same double:
    * E-notation with 17 fractional digits (18 significant — above the
    * 17-digit round-trip bound).
    */
  def dbl(x: Double): String = {
    // NaN/Infinity have no DuckDB numeric-literal spelling — %.17E
    // would render text the oracle fails to PARSE, an opaque error far
    // from the root cause (a trained centroid or plane gone
    // non-finite). Fail here, naming the value.
    require(java.lang.Double.isFinite(x),
      s"cannot render non-finite double $x as a DuckDB literal — " +
        "a trained value upstream went NaN/Infinity")
    String.format(java.util.Locale.ROOT, "%.17E", Double.box(x))
  }

  /** A `::DOUBLE[]`-ready array literal of exact elements. */
  def dblArray(xs: Seq[Double]): String =
    xs.map(dbl).mkString("[", ", ", "]")
}
