package graft

/** Static hygiene over every generated/authored DuckDB oracle: SQL
  * dialect traps that have actually shipped get a standing tripwire.
  *
  * One-arg `trim(x)`: DuckDB's single-argument trim is UNICODE-aware
  * (strips U+3000 et al.), while Spark's `trim` strips ASCII space
  * only — the explicit `trim(x, ' ')` form is the only one that
  * matches Spark. This divergence shipped TWICE in one round (the
  * BPE vocab carve, then again in the freshly generated encode CTE),
  * each time caught only by the unicode gate as a one-symbol
  * mismatch; a static scan catches the next one at spec time. */
class OracleHygieneSpec extends SparkSpecBase {

  /** True iff `sql` contains a trim( call whose argument list has no
    * top-level comma (i.e. the one-arg form). */
  private def hasOneArgTrim(sql: String): Boolean = {
    val lower = sql.toLowerCase
    var from = 0
    while ({ val i = lower.indexOf("trim(", from); from = i; i >= 0 }) {
      // skip identifiers ending in trim (ltrim/rtrim have their own
      // semantics and are not used in the oracles)
      val isWord = from > 0 && (lower(from - 1).isLetterOrDigit ||
        lower(from - 1) == '_')
      if (!isWord) {
        var depth = 1
        var i = from + 5
        var topComma = false
        var inStr = false
        while (depth > 0 && i < sql.length) {
          val c = sql(i)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => topComma = true
            case _ =>
          }
          i += 1
        }
        if (!topComma) return true
      }
      from += 5
    }
    false
  }

  test("the scanner itself distinguishes the forms") {
    assert(hasOneArgTrim("SELECT trim(x) FROM t"))
    assert(hasOneArgTrim("SELECT trim(f(a, b)) FROM t"))
    assert(!hasOneArgTrim("SELECT trim(x, ' ') FROM t"))
    assert(!hasOneArgTrim("SELECT trim(replace(a, b, c), ' ') FROM t"))
    assert(!hasOneArgTrim("SELECT ltrim(x) || trim(y, ' ') FROM t"))
  }

  test("no oracle uses DuckDB's unicode-aware one-arg trim") {
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if hasOneArgTrim(sql) => name
    }
    assert(offenders.isEmpty,
      s"one-arg trim(x) diverges from Spark on non-ASCII whitespace — " +
        s"use trim(x, ' '): ${offenders.toSeq.sorted}")
  }
}
