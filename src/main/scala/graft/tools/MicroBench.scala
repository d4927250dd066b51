package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark behind PERF.md's expression-strategy claims: the same
  * dot-product semantics three ways over identical data —
  * interpreted higher-order functions, a Scala UDF, and the native
  * codegen Expression. Run: runMain graft.tools.MicroBench [nRows] */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toInt else 200000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // same UTC pin as every other entry point (Bench/Verify/ScaleUp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    val base = spark.range(nRows).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => (i * (col("id") % 97 + 1) % 1000).cast("double") / 1000.0).as("a"),
      transform(sequence(lit(1), lit(dim)),
        i => (i * (col("id") % 89 + 7) % 1000).cast("double") / 1000.0).as("b"))
      .persist()
    base.count()

    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val scalaUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val native = org.apache.spark.sql.graft.VectorExprs.dot(col("a"), col("b"))

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      // warm once, then best of 3
      base.select(sum(c)).collect()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        base.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[micro] $label%-18s $t%7.3f s  (${nRows.toLong * dim / t / 1e6}%.0f M elem/s)")
      t
    }
    val h = time("hof_interpreted", hof)
    val u = time("scala_udf", scalaUdf(col("a"), col("b")))
    val n = time("codegen_expr", native)
    println(f"[micro] speedup codegen vs hof: ${h / n}%.1fx, vs udf: ${u / n}%.1fx")
    spark.stop()
  }
}
