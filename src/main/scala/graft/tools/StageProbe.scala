package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level timing for in-flight perf work (round 11:
  * q118/q110 — see git history; round 12: q78). Times each sub-plan of
  * the query under study with count() actions so the expensive stage is
  * identified, not guessed. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ---- q78 stages (steady state: the corpus-side index pre-built).
    // Uses the REAL q78Split + incrementalCore pieces step by step, so
    // the probe cannot drift from the shipped kernel.
    import graft.dedup.TextDedup
    val (corpus, batch) = graft.queries.Dedup.q78Split(spark, sfDir)
    val idx = "target/stageprobe_q78"
    if (!new java.io.File(s"$idx/hashes").isDirectory)
      time("build index (corpus side)") {
        TextDedup.buildDedupIndex(corpus, "doc_id", "text", idx)
      }
    val corpusHashes = spark.read.parquet(s"$idx/hashes")
    val shC = spark.read.parquet(s"$idx/shingles")
    val bandsC = spark.read.parquet(s"$idx/bands")

    // (1)+(2) exact dedup within batch + hash anti-join vs corpus
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val bxx = time("exact (batch window + anti)") {
      val bx = batch.filter(col("text").isNotNull)
        .withColumn("__rn", row_number().over(wD))
        .filter(col("__rn") === 1).drop("__rn")
        .unionByName(batch.filter(col("text").isNull))
      val r = bx.join(corpusHashes, md5(bx("text")) === col("__ch"), "left_anti")
        .persist()
      r.count(); r
    }
    // (3) batch shingles
    val shB = time("batch shingles") {
      val r = TextDedup.shingleRows(bxx, "doc_id", "text").persist()
      r.count(); r
    }
    // (4) cross-band candidates
    val pairs = time("band join -> candidates") {
      val r = TextDedup.bandedSignatures(shB, 8).as("a")
        .join(bandsC.as("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .persist()
      println(s"[stage]   candidates = ${r.count()}")
      r
    }
    // (5) candidate-restricted shingle slice (the union side)
    val sh = shB.union(shC)
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val shc = time("cand semi-join + distinct") {
      val r = sh.join(candDocs, Seq("doc_id"), "left_semi").distinct().persist()
      println(s"[stage]   restricted shingle rows = ${r.count()}")
      r
    }
    // (6) co-shingle intersect counts + sizes + threshold
    time("pair verify (intersect)") {
      val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val inter = pairs
        .join(shc.as("xa"), col("doc_a") === col("xa.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("xa.s").as("sa"))
        .join(shc.as("xb"),
          col("doc_b") === col("xb.doc_id") && col("sa") === col("xb.s"),
          "left_semi")
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .filter(col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double") >= 0.5)
        .count()
    }
    // reference: the full steady-state call
    time("incrementalDeduplicateIndexed") {
      TextDedup.incrementalDeduplicateIndexed(idx, batch, "doc_id", "text", 0.5)
        .count()
    }

    // ---- q118 stages (steady state over the durable ppjoin index,
    // resolved/built through the REAL q118Index — no builder copy)
    val t118 = 0.4
    val idx118 = time("q118 index resolve/build") {
      graft.queries.Dedup.q118Index(spark, sfDir)
    }
    val pref = spark.read.parquet(s"$idx118/pref")
    val shArr = spark.read.parquet(s"$idx118/sharr")
    val cand118raw = time("q118 candidate join (pre-distinct)") {
      val p = pref.as("a")
        .join(pref.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n") >= ceil(lit(t118) * col("b.n")) &&
            col("b.n") >= ceil(lit(t118) * col("a.n")) &&
            (lit(1) + least(col("a.n") - col("a.rk"),
              col("b.n") - col("b.rk"))) >=
              ceil(lit(t118) * (col("a.n") + col("b.n")) / lit(1 + t118)))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .persist()
      println(s"[stage]   raw collisions = ${p.count()}")
      p
    }
    val cand118 = time("q118 distinct") {
      val p = cand118raw.distinct().persist()
      println(s"[stage]   distinct candidates = ${p.count()}")
      p
    }
    time("q118 verify (IntersectCount)") {
      val n = cand118
        .join(broadcast(shArr.select(col("doc_id").as("doc_a"),
          col("harr").as("ha"), col("nsh").as("na"))), "doc_a")
        .join(broadcast(shArr.select(col("doc_id").as("doc_b"),
          col("harr").as("hb"), col("nsh").as("nb"))), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          org.apache.spark.sql.graft.SetExprs
            .intersectCount(col("ha"), col("hb")).as("ni"),
          col("na"), col("nb"))
        .filter(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double") >= t118)
        .count()
      println(s"[stage]   verified pairs = $n")
    }
    spark.stop()
  }
}
