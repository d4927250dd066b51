package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level timing for in-flight perf work (round 11:
  * q118/q110). Times each sub-plan of the query under study with
  * count() actions so the expensive stage is identified, not guessed. */
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

    // ---- q118 stages (steady state: parquet artifact reads)
    val t = 0.4
    val tmp = "target/stageprobe_ppjoin"
    time("build artifact") {
      val e = graft.dedup.TextDedup.shingleRows(
          graft.io.Tables.table(spark, sfDir, "documents"), "doc_id", "text")
        .distinct().persist()
      val dfq = e.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
      val wN = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      e.join(dfq, "s")
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wN))
        .filter(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
        .select(col("doc_id"), col("s"), col("n"), col("rk"))
        .write.mode("overwrite").parquet(s"$tmp/pref")
      e.groupBy(col("doc_id"))
        .agg(collect_list(col("s")).as("sharr"), count(lit(1)).as("nsh"))
        .write.mode("overwrite").parquet(s"$tmp/sharr")
      e.unpersist(blocking = false)
    }
    val pref = spark.read.parquet(s"$tmp/pref")
    val shArr = spark.read.parquet(s"$tmp/sharr")
    val pairs = time("pairs") {
      val p = pref.as("a")
        .join(pref.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n") >= ceil(lit(t) * col("b.n")) &&
            col("b.n") >= ceil(lit(t) * col("a.n")) &&
            (lit(1) + least(col("a.n") - col("a.rk"),
              col("b.n") - col("b.rk"))) >=
              ceil(lit(t) * (col("a.n") + col("b.n")) / lit(1 + t)))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .persist()
      p.count(); p
    }
    time("verify") {
      pairs
        .join(shArr.select(col("doc_id").as("doc_a"),
          col("sharr").as("sa"), col("nsh").as("na")), "doc_a")
        .join(shArr.select(col("doc_id").as("doc_b"),
          col("sharr").as("sb"), col("nsh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("ni"),
          col("na"), col("nb"))
        .filter(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double") >= t)
        .count()
    }

    // ---- q110 stages
    val li = graft.io.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val prs = time("pr pairs") {
      val p = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") =!= col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .distinct().persist()
      p.count(); p
    }
    val deg = time("pr deg") {
      val d = prs.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("outd")).persist()
      d.count(); d
    }
    val n = deg.count()
    var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"))
    (1 to 5).foreach { k =>
      ranks = time(s"pr sweep $k") {
        graft.queries.Q.localized(
          prs.join(broadcast(ranks.join(deg, "node")),
              col("src") === col("node"))
            .groupBy(col("dst").as("node2"))
            .agg(sum(col("rank") / col("outd")).as("contrib"))
            .select(col("node2").as("node"),
              (lit(0.15 / n) + lit(0.85) * col("contrib")).as("rank")))
      }
    }
    spark.stop()
  }
}
