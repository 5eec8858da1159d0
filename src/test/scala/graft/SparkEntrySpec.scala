package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract itself — the invariants the round driver's
  * smoke-check and correctness gate depend on but no operator spec owns:
  * the flagship `entry` returns rows, every registered query carries a
  * DuckDB oracle (the gate treats a missing oracle as a weaker rows-only
  * check; this build's standard is an oracle per query), and query names
  * are stable parquet-dump-directory-safe identifiers.
  */
class SparkEntrySpec extends AnyFunSuite with SparkFixture {

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a DuckDB oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q == o, s"rows-only queries (no oracle): ${(q -- o).toSeq.sorted}")
  }

  test("query names are dump-directory-safe and the registry is non-trivial") {
    val names = SparkEntry.queries.keySet
    assert(names.size >= 122, s"registry shrank to ${names.size}")
    val bad = names.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe names: $bad")
  }

  test("oracle SQL references only fixture tables or the {{OUT}} dump") {
    // the gate materializes each oracle over the ten fixture parquet
    // tables plus the {{OUT}} substitution — any other path would make
    // the oracle silently un-runnable in the driver's DuckDB
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val pathRe = """read_parquet\('([^']+)'\)""".r
    // bare identifiers in table position: FROM/JOIN followed by a plain
    // name (a trailing paren marks a table FUNCTION — range(), read_parquet
    // — which the path check above owns)
    val identRe = """(?i)\b(?:FROM|JOIN)\s+([a-zA-Z_]\w*)\b(?!\s*\()""".r
    val cteRe = """(?i)\b([a-zA-Z_]\w*)\s*(?:\([^)]*\))?\s+AS\s*\(""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      pathRe.findAllMatchIn(sql).foreach { m =>
        val p = m.group(1)
        assert(p.startsWith("{{OUT}}/"),
          s"$name oracle reads a non-dump path: $p")
      }
      assert(!sql.contains("/tmp/"), s"$name oracle hardcodes a /tmp path")
      val ctes = cteRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      identRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { id =>
        assert(tables.contains(id) || ctes.contains(id),
          s"$name oracle reads unknown table '$id' (not a fixture or CTE)")
      }
    }
  }
}
