package graft.exec

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.dedup.TextDedup

class MaterializerSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    Seq(
      1L -> base,
      2L -> base,
      3L -> (base + " extra trailing words here"),
      4L -> "completely different text about spark query engines and shuffles today",
      5L -> ("prefix words " + base),
      6L -> "another unrelated document mentioning embeddings and vectors only"
    ).toDF("doc_id", "text")
  }

  private def survivors(mat: Materializer): Set[Long] =
    TextDedup.deduplicate(corpus, "doc_id", "text", 0.5, mat)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  // declared FIRST: ScalaTest runs tests in declaration order, and the
  // Reliable tests below set a checkpoint dir on the shared session that
  // cannot be unset through the public API — running after them, the
  // require() path would never be exercised
  test("Reliable fails fast without a checkpoint dir") {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      an[IllegalArgumentException] should be thrownBy
        Materializer.Reliable(corpus)
    } else succeed // a prior suite set it; Reliable is then legal
  }

  test("Reliable: full fuzzy-dedup pipeline through sparkContext checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      survivors(Materializer.Reliable) shouldBe survivors(Materializer.Local)
      // the cut really went through the reliable dir
      val ckptFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      ckptFiles should be > 0L
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("Parquet: write-read cuts land under a unique run dir and preserve results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat_").toString
    survivors(Materializer.Parquet(dir)) shouldBe survivors(Materializer.Local)
    val runs = new java.io.File(dir).listFiles()
    runs should not be null
    val runDirs = runs.filter(_.getName.startsWith("run_"))
    runDirs.length shouldBe 1
    runDirs.head.listFiles().map(_.getName).count(_.startsWith("cut_")) should be > 0
    // a restarted pipeline (fresh instance) must not clobber prior cuts
    survivors(Materializer.Parquet(dir)) shouldBe survivors(Materializer.Local)
    new java.io.File(dir).listFiles().count(_.getName.startsWith("run_")) shouldBe 2
  }

  test("ivfTopK through a reliable cut matches the local cut") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_ivf_").toString
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      import graft.similarity.VectorSearch
      val emb = graft.io.Tables.table(spark, sf0001, "embeddings")
      val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 53 === 0)
      val cents = VectorSearch.ringCentroids(emb, "vec_id", 101)
      def run(mat: Materializer) =
        VectorSearch.ivfTopK(emb, qs, cents, "vec_id", "embedding", 5, 2, mat)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      run(Materializer.Reliable) shouldBe run(Materializer.Local)
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }
}
