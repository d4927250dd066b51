package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Property-style invariants over generated inputs (seeded — the offline
  * cache has no scalatestplus bridge, so plain seeds replace forAll):
  * the salting rewrite must be INVISIBLE in the result for every seed
  * and factor, and the md5-bucket sampler must produce nested,
  * deterministic samples. These complement the fixture-based
  * SkewSaltingSpec/SamplingSpec: fixtures pin known shapes, properties
  * sweep the input space. */
class OperatorPropertySpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Skewed fact (hot key 0 carries ~half the rows; keys 0..29, so keys
    * 20..29 are dim-orphans) against a 20-key dim. */
  private def factDim(seed: Long): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val fact = (0 until 300).map { _ =>
      val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(30).toLong
      (k, rnd.nextInt(1000))
    }.toDF("fk", "fv")
    val dim = (0 until 20).map(k => (k.toLong, s"d$k")).toDF("dk", "dv")
    (fact, dim)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toIndexedSeq.sortBy(_.mkString("|"))

  test("property: salted inner join is row-for-row the plain inner join " +
    "across seeds and factors") {
    for (seed <- 1L to 4L; factor <- Seq(1, 3, 8)) {
      val (fact, dim) = factDim(seed)
      withClue(s"seed=$seed factor=$factor: ") {
        rows(SkewJoin.salted(fact, "fk", dim, "dk", factor)) shouldBe
          rows(fact.join(dim, col("fk") === col("dk")))
      }
    }
  }

  test("property: salted LEFT join is row-for-row the plain left join — " +
    "orphans null-extended exactly once, across seeds and factors") {
    for (seed <- 5L to 8L; factor <- Seq(2, 8)) {
      val (fact, dim) = factDim(seed)
      val salted = SkewJoin.saltedLeft(fact, "fk", dim, "dk", factor)
      val plain = fact.join(dim, col("fk") === col("dk"), "left")
      withClue(s"seed=$seed factor=$factor: ") {
        rows(salted) shouldBe rows(plain)
        // and the orphan count survives the rewrite (keys 20..29)
        salted.filter(col("dk").isNull).count() shouldBe
          plain.filter(col("dk").isNull).count()
      }
    }
  }

  test("property: stratified samples nest in the keep fraction and are deterministic") {
    import spark.implicits._
    val docs = (0 until 2000).map(i => (i.toLong, Seq("en", "de", "fr")(i % 3)))
      .toDF("id", "lang")
    def ids(fr: Map[String, Double], d: Double): Set[Long] =
      Sampling.stratified(docs, "id", "lang", fr, d)
        .select("id").collect().map(_.getLong(0)).toSet
    val small = ids(Map("en" -> 0.2, "de" -> 0.4), 0.1)
    val large = ids(Map("en" -> 0.4, "de" -> 0.8), 0.2)
    val all = ids(Map("en" -> 1.0, "de" -> 1.0), 1.0)
    // nesting: a row kept at fraction f stays kept at every f' >= f
    // (the md5 bucket is a pure function of the id)
    small.subsetOf(large) shouldBe true
    large.subsetOf(all) shouldBe true
    all.size shouldBe 2000
    // determinism: same rule, same sample — repartitioning included
    ids(Map("en" -> 0.2, "de" -> 0.4), 0.1) shouldBe small
    Sampling.stratified(docs.repartition(7), "id", "lang",
        Map("en" -> 0.2, "de" -> 0.4), 0.1)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe small
  }

  test("property: grouped prefix scan ≡ the per-group window across " +
    "seeds, group counts, skew shapes, and partition counts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- 1L to 3L; nGroups <- Seq(1, 4); parts <- Seq(2, 16)) {
      val rnd = new scala.util.Random(seed)
      // adversarial mix: one group takes ~70% of rows; some groups may
      // end up empty; values include zeros and negatives; a null group
      // appears on odd seeds
      val df = (0 until 800).map { k =>
        val g =
          if (seed % 2 == 1 && k % 97 == 0) null
          else if (rnd.nextInt(10) < 7) "g0"
          else "g" + (1 + rnd.nextInt(nGroups))
        (g, k.toLong, rnd.nextInt(21).toLong - 5L)
      }.toDF("lang", "doc_id", "v")
      val got = PrefixSum.groupedExclusiveRunningTotal(
        df, "lang", "doc_id", "v", "e", partitions = parts)
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val exp = df.withColumn("e", coalesce(sum(col("v")).over(w), lit(0L)))
      withClue(s"seed=$seed nGroups=$nGroups parts=$parts: ") {
        rows(got) shouldBe rows(exp)
      }
    }
  }

  test("property: temperatureMix samples only known strata and is a subset of the corpus") {
    import spark.implicits._
    val docs = ((0 until 900).map(i => (i.toLong, Seq("en", "de", "fr")(i % 3))) ++
      (900 until 1000).map(i => (i.toLong, null: String))).toDF("id", "lang")
    val out = Sampling.temperatureMix(docs, "id", "lang", 0.3)
      .select("id", "lang").collect()
    out.foreach(_.getString(1) should not be null) // NULL strata excluded by policy
    val ids = out.map(_.getLong(0)).toSet
    ids.subsetOf((0L until 900L).toSet) shouldBe true
    ids should not be empty
  }
}
