package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase timing for the q54 trained-IVF query: codebook train vs
  * parquet roundtrip vs search. Usage: runMain graft.tools.TrainProbe <sfDir> */
object TrainProbe {
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
    (1 to 2).foreach { round =>
      def t[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[train] round $round $label%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        r
      }
      val emb = graft.io.Tables.table(spark, sfDir, "embeddings")
      val sampled = t("sample") { val s = emb.sample(0.2, 42L); s.count(); s }
      val cb = t("train") {
        graft.similarity.VectorSearch.trainCodebook(
          sampled, "vec_id", "embedding", k = 8, maxIter = 5)
      }
      val path = "/root/repo/target/train_probe_centroids"
      t("write") { graft.io.Tables.writeParquet(cb.coalesce(1), path) }
      val cents = t("read") {
        val c = spark.read.parquet(path)
          .select(col("vec_id").as("c_id"),
            col("embedding").as("cv"))
          .withColumn("cn", graft.functions.VectorFns.l2norm(col("cv")))
        c.count(); c
      }
      t("search") {
        graft.similarity.VectorSearch.ivfTopK(
          emb, emb.filter(col("vec_id") % 53 === 0), cents.select(col("c_id").as("vec_id"), col("cv").as("embedding")),
          "vec_id", "embedding", 10, 2).count()
      }
    }
    spark.stop()
  }
}
