package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every registered DuckDB oracle — the class of bug
  * that broke d33/d37 in round 11 (a second stripMargin ate the first
  * pipe of Pii.plantSql's `||` concat continuation lines, shipping
  * syntactically invalid SQL the suite never executed). The driver runs
  * these strings verbatim; text-level invariants are checkable here
  * without a DuckDB dependency.
  */
class OracleSqlSpec extends AnyFunSuite {

  test("every oracle is non-empty and every gated query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
    }
  }

  test("no oracle line carries margin-pipe residue from a double stripMargin") {
    // residue looks like `| '...'` at line start: a SINGLE pipe (DuckDB's
    // concat operator is `||`, which is fine) after optional indent.
    val residue = """^\s*\|(?!\|)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      sql.linesIterator.zipWithIndex.foreach { case (line, i) =>
        assert(residue.findFirstIn(line).isEmpty,
          s"$name line ${i + 1} starts with a lone margin pipe — " +
            s"double-stripMargin residue: '$line'")
      }
    }
  }

  test("no oracle leaks an unsubstituted template placeholder") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("__PLANT__"),
        s"$name: __PLANT__ placeholder never replaced")
      // a template authored without its `s` prefix ships `${...}` verbatim
      assert(!sql.contains("${"), s"$name: uninterpolated template residue")
    }
  }
}
