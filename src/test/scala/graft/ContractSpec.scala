package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself. */
class ContractSpec extends AnyFunSuite with SparkFixture {

  test("every oracle key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL references only registered table names") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // every FROM/JOIN target must be a known table or a subquery/CTE
    // (the negative lookbehind also keeps column names like
    // `valid_from` from tokenizing as a FROM keyword)
    val fromRe = """(?i)(?<!distinct )(?<![a-z0-9_.])(?:from|join)\s+([a-z_][a-z0-9_]*)""".r
    SparkEntry.oracleSql.foreach { case (name, sql0) =>
      // EXTRACT(part FROM expr) is SQL syntax, not a table reference —
      // strip only the `EXTRACT(<part> FROM` keyword pair (r9 wave-39/49
      // oracles use it). The r9 [^)]*-to-close-paren form was not
      // paren-balanced: an EXTRACT(day FROM f(g(x))) oracle would leak a
      // table-like token past the first ')' unscanned (r9 ADVICE).
      val sql = sql0.replaceAll(
        "(?i)extract\\s*\\(\\s*[a-z_]+\\s+from\\b", "extract_x(")
      // CTE names, with or without a column list: `x AS (`, `x(a, b) AS (`
      val ctes = """(?i)([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+as\s*\(""".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val aliases = ctes ++ Set("unnest", "generate_series", "values")
      fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || aliases.contains(t) || sql.contains(s"$t AS") ||
          sql.toLowerCase.contains(s"$t as"),
          s"$name references unknown table '$t'")
      }
    }
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
