package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-growth evidence for q127's deletion-neighborhood blocking
  * (COVERAGE.md growth-audit row) — the testdata part dictionary is
  * tiny, so the claim "bucket occupancy tracks type-level duplication,
  * not corpus size" needs a synthetic dictionary big enough to show a
  * curve. Generates N distinct entity-style names (two vocab tokens +
  * a decimal id — realistic shape: shared prefixes, long common
  * substrings, distinct strings) and plants one ed-1 typo variant per
  * TYPO_EVERY names (delete/substitute/insert at a seeded position),
  * then measures the candidate relation (Σ n(n−1)/2 over variant-key
  * buckets, the q19 census), verified pair count, and wall time.
  *
  * Run: runMain graft.queries.EditDistProbe <nNames> [typoEvery=10]
  * Prints one JSON line.
  */
object EditDistProbe {

  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val typoEvery = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = Seq("alpha", "bravo", "copper", "delta", "ember", "falcon",
      "granite", "harbor", "indigo", "juniper", "kestrel", "lumen")
    // seeded LCG — deterministic, no java.util.Random
    var seed = 0x243F6A8885A308D3L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    def pick[A](xs: Seq[A]): A = xs(math.floorMod(next(), xs.length).toInt)

    def typo(s: String): String = {
      val p = math.floorMod(next(), s.length).toInt
      math.floorMod(next(), 3L) match {
        case 0 => s.substring(0, p) + s.substring(p + 1) // delete
        case 1 => s.substring(0, p) + pick("abcdefghij".toSeq) +
          s.substring(p + 1) // substitute
        case _ => s.substring(0, p) + pick("abcdefghij".toSeq) +
          s.substring(p) // insert
      }
    }

    val base = (0 until n).map(i => s"${pick(vocab)} ${pick(vocab)} $i")
    val planted = base.zipWithIndex.collect {
      case (s, i) if i % typoEvery == 0 => typo(s)
    }
    val names = (base ++ planted).distinct.toDF("name")
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNames = names.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // candidate census over the variant-key buckets (the q19 shape:
    // Σ n(n−1)/2, never materializing the join)
    val keyed = Dedup.editDist1Keys(names)
    val (census, tCensus) = timed(
      keyed.groupBy(col("vk")).count()
        .agg(coalesce(sum(shiftright(col("count") * (col("count") - 1), 1)),
          lit(0L)))
        .head.getLong(0))
    val (pairs, tPairs) = timed(Dedup.editDist1Pairs(names).count())
    names.unpersist(blocking = false)

    // scalastyle:off println
    println(s"""{"n_names":$nNames,"planted":${planted.length}""" +
      f""","q127_cand":$census,"q127_cand_secs":$tCensus%.2f""" +
      f""","q127_pairs":$pairs,"q127_secs":$tPairs%.2f}""")
    // scalastyle:on println
    spark.stop()
  }
}
