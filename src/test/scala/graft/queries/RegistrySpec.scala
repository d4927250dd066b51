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
    all(names) should fullyMatch regex "q\\d{2}_[a-z0-9_]+"
  }

  test("54 queries registered, 51 with oracles") {
    Registry.all.length shouldBe 54
    Registry.oracles.size shouldBe 51
    // the three no-oracle queries are exactly the ML/sketch ones
    (Registry.queries.keySet -- Registry.oracles.keySet) shouldBe
      Set("q28_lr_coefficients", "q29_tfidf_bigrams", "q30_approx_distinct")
  }

  test("oracle SQL references only known testdata tables") {
    val known = graft.io.Tables.names.toSet
    val tableLike = "(?i)\\b(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    Registry.oracles.foreach { case (name, sql) =>
      val cleaned = sql.replaceAll("\\s+", " ")
        // EXTRACT(unit FROM col) is not a relation reference
        .replaceAll("(?i)EXTRACT\\s*\\([^)]*\\)", "")
      tableLike.findAllMatchIn(cleaned).map(_.group(1).toLowerCase).foreach { t =>
        withClue(s"$name references '$t': ") {
          // CTE aliases and subselects are fine; read_parquet is q54's
          // shared-centroid artifact; anything else must be a real table
          val cteNames = "(?i)([a-z_][a-z0-9_]*)\\s+AS\\s*\\(".r
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
