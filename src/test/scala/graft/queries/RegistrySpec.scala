package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Meta-invariants over the query registry — the driver contract's shape:
  * unique names, oracle SQL referencing only real testdata tables, and the
  * coverage accounting the round reports rest on. */
class RegistrySpec extends AnyFunSuite with Matchers {

  test("query names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    names.distinct.length shouldBe names.length
    all(names) should fullyMatch regex "q\\d{2,3}_[a-z0-9_]+"
  }

  test("EVERY registered query has a DuckDB oracle — the no-oracle set " +
    "is empty as of round 12") {
    // q28/q29 (the former ML-internals exemptions) carry q30-style
    // bounds oracles since round 12; a new query registered without an
    // oracle is a regression unless its exemption is argued here.
    val noOracle = Registry.queries.keySet -- Registry.oracles.keySet
    noOracle shouldBe Set.empty[String]
    Registry.oracles.size shouldBe Registry.all.length
  }

  test("every registered query is documented in COVERAGE.md") {
    // new String(bytes, UTF_8) replaces malformed sequences instead of
    // throwing like Source.fromFile under a non-UTF-8 default charset
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    // COVERAGE.md cites queries by their qNN id (e.g. "q51"), not the full
    // registry name — require the id with a non-digit boundary after it so
    // "q55" is not satisfied by a mention of "q556" (and "q100" is not
    // satisfied by "q10")
    Registry.all.map(_.name.takeWhile(_ != '_')).foreach { id =>
      withClue(s"COVERAGE.md has no mention of $id: ") {
        s"(?<![0-9a-z])$id(?![0-9])".r.findFirstIn(text).isDefined shouldBe true
      }
    }
  }

  test("oracle SQL references only known testdata tables") {
    val known = graft.io.Tables.names.toSet
    val tableLike = "(?i)\\b(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    Registry.oracles.foreach { case (name, sql) =>
      val cleaned = sql.replaceAll("\\s+", " ")
        // EXTRACT(unit FROM col) is not a relation reference
        .replaceAll("(?i)EXTRACT\\s*\\([^)]*\\)", "")
        // IS [NOT] DISTINCT FROM is a predicate, not a relation reference
        .replaceAll("(?i)IS\\s+(?:NOT\\s+)?DISTINCT\\s+FROM", "<>")
      tableLike.findAllMatchIn(cleaned).map(_.group(1).toLowerCase).foreach { t =>
        withClue(s"$name references '$t': ") {
          // CTE aliases and subselects are fine; read_parquet is q54's
          // shared-centroid artifact; anything else must be a real table
          val cteNames =
            "(?i)([a-z_][a-z0-9_]*)\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
              .findAllMatchIn(cleaned).map(_.group(1).toLowerCase).toSet
          (known.contains(t) || cteNames.contains(t) || t == "lateral" ||
            t == "read_parquet") shouldBe true
        }
      }
    }
  }

  test("SparkEntry exposes the registry verbatim") {
    graft.SparkEntry.queries.keySet shouldBe Registry.queries.keySet
    graft.SparkEntry.oracleSql.keySet shouldBe Registry.oracles.keySet
  }
}
