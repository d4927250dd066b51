package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-growth evidence harness for the EMBEDDING family — the
  * DedupScaleProbe sibling COVERAGE.md's growth-audit table cites for
  * the IVF / SemDeDup / hyperplane-LSH rows. On N× replicas of a source
  * embeddings table it measures, with the production code paths:
  *
  *  - `ivf`: the bounded codebook's k = derivedK(N), codebook-build and
  *    full nearest-centroid assignment times, the realized cell-size
  *    distribution (max / avg / p99), the implied q100 within-cell pair
  *    count Σ cell·(cell−1)/2 (SemDeDup's quadratic stage, measured
  *    instead of argued), and the registered q36 search end to end.
  *  - `lsh`: bucket-occupancy census of the q65/q67/q79 hyperplane
  *    signature at the registered 8 bits AND at the widened
  *    ~log₂(N) bits the in-code contract prescribes for bigger corpora
  *    — implied candidates Σ n·(n−1)/2, hottest bucket, bucket count.
  *    This replaces the one argument-only growth claim in the audit
  *    with measured curves (the q17/q19/q118/q127 discipline).
  *
  * Replica construction: copy c shifts vec_id by c·SHIFT and ROTATES
  * the embedding components by c positions (norm-preserving, so cosine
  * geometry within a copy is intact while copies decorrelate — rotated
  * gaussian-ish vectors land in different cells/buckets; a raw copy
  * would just multiply every cell N-fold and measure nothing).
  *
  * Run: runMain graft.queries.AnnScaleProbe <srcSfDir> <copies>
  *        [metrics csv: ivf,lsh] [outBase]
  * Prints one JSON line per invocation.
  */
object AnnScaleProbe {

  private val SHIFT = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val copies = args(1).toInt
    val metrics: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSet
      else Set("ivf", "lsh")
    val outBase = if (args.length > 3) args(3) else "target/ann_scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"$outBase/x$copies"
    buildIfAbsent(spark, src, dir, copies)

    val out = new StringBuilder(s"""{"copies":$copies""")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    import graft.functions.VectorFns.{l2norm, toDoubleArray}
    val n = graft.io.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVecs = n.count()
    out ++= s""","n_vecs":$nVecs"""

    if (metrics("ivf")) {
      // codebook build (count + TakeOrderedAndProject) with the
      // production path, then one full assignment pass
      val ((cents, k), tCents) = timed {
        val c = Similarity.boundedCents(n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (c, c.count())
      }
      val (cellStats, tAssign) = timed {
        graft.similarity.VectorSearch.assignCells(n, cents)
          .groupBy(col("c_id")).agg(count(lit(1)).as("sz"))
          .agg(max(col("sz")).as("max_cell"),
            avg(col("sz")).as("avg_cell"),
            expr("percentile_approx(sz, 0.99)").as("p99_cell"),
            sum(col("sz") * (col("sz") - 1) / 2).cast("long")
              .as("implied_pairs"),
            count(lit(1)).as("n_cells"))
          .collect().head
      }
      // the registered q36 search end to end over the replica
      val (q36Rows, tQ36) = timed(
        Similarity.ivfSearch(n, cents, nprobe = 1).count())
      cents.unpersist(blocking = false)
      out ++= s""","ivf_k":$k"""
      out ++= f""","ivf_codebook_secs":$tCents%.2f"""
      out ++= s""","ivf_assign_dots":${nVecs * k}"""
      out ++= f""","ivf_assign_secs":$tAssign%.2f"""
      out ++= s""","ivf_max_cell":${cellStats.getLong(0)}"""
      out ++= f""","ivf_avg_cell":${cellStats.getDouble(1)}%.1f"""
      out ++= s""","ivf_p99_cell":${cellStats.getLong(2)}"""
      out ++= s""","ivf_implied_q100_pairs":${cellStats.getLong(3)}"""
      out ++= s""","ivf_n_cells":${cellStats.getLong(4)}"""
      out ++= s""","q36_rows":$q36Rows"""
      out ++= f""","q36_secs":$tQ36%.2f"""
    }

    if (metrics("ivf2")) {
      // two-level assignment (q133's path) vs flat on the same corpus:
      // time the full pass and measure the grouping approximation
      // directly as the fraction of vectors whose two-level cell
      // differs from the flat argmax cell
      val (flat, tFlat) = timed {
        val a = graft.similarity.VectorSearch
          .assignCells(n, Similarity.boundedCents(n))
          .select(col("vec_id"), col("c_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      val (two, tTwo) = timed {
        val a = n.select(col("vec_id"),
            Similarity.twoLevelAssignCol(n).as("c_id2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      val agree = flat.join(two, Seq("vec_id"))
        .agg(avg(when(col("c_id") === col("c_id2"), 1.0).otherwise(0.0)))
        .collect().head.getDouble(0)
      flat.unpersist(blocking = false)
      two.unpersist(blocking = false)
      out ++= f""","ivf2_flat_secs":$tFlat%.2f"""
      out ++= f""","ivf2_two_secs":$tTwo%.2f"""
      out ++= f""","ivf2_agree":$agree%.4f"""
    }

    if (metrics("pq")) {
      // q134 encode pass (codebook build + full-corpus native encode)
      // and the q135 ADC serve end to end, against the q20 exact scan
      // on the same replica — the compute/memory-traffic trade as a
      // measured curve (COVERAGE.md growth-audit PQ row cites this)
      import org.apache.spark.sql.graft.PqExprs
      val (cb, tCb) = timed(Similarity.pqCodebook(n))
      val bc = spark.sparkContext.broadcast(cb)
      val (nCodes, tEnc) = timed {
        n.select(col("vec_id"),
          posexplode(PqExprs.pqEncode(bc, col("v")))).count()
      }
      val (adcRows, tAdc) = timed(
        Registry.queries("q135_pq_adc_topk")(spark, dir).count())
      val (exactRows, tExact) = timed(
        Registry.queries("q20_ann_cosine")(spark, dir).count())
      val (ivfpqRows, tIvfpq) = timed(
        Registry.queries("q136_ivfpq_topk")(spark, dir).count())
      // the DEPLOYMENT shape: codes materialized once (q134's
      // artifact), the serve scans code words + norms only — never
      // the 512-byte vectors. This is the number the stateless q135
      // (which re-encodes inline) hides behind fixed overhead.
      val codesPath = s"$dir/pq_codes.parquet"
      val (_, tMat) = timed {
        n.select(col("vec_id"), col("nrm"),
            transform(org.apache.spark.sql.graft.PqExprs
              .pqEncode(bc, col("v")), s => s.getField("code"))
              .as("codes"))
          .write.mode("overwrite").parquet(codesPath)
      }
      val (servedRows, tServe) = timed(
        Similarity.pqAdcServe(spark.read.parquet(codesPath),
          Similarity.pqProbes(n), cb).count())
      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists()) 0L else d.listFiles().map(_.length()).sum
      }
      out ++= f""","pq_codebook_secs":$tCb%.2f"""
      out ++= s""","pq_codes":$nCodes"""
      out ++= f""","pq_encode_secs":$tEnc%.2f"""
      out ++= s""","pq_adc_rows":$adcRows"""
      out ++= f""","pq_adc_secs":$tAdc%.2f"""
      out ++= s""","q20_rows":$exactRows"""
      out ++= f""","q20_secs":$tExact%.2f"""
      out ++= s""","ivfpq_rows":$ivfpqRows"""
      out ++= f""","ivfpq_secs":$tIvfpq%.2f"""
      out ++= f""","pq_materialize_secs":$tMat%.2f"""
      out ++= s""","pq_served_rows":$servedRows"""
      out ++= f""","pq_serve_secs":$tServe%.2f"""
      out ++= s""","pq_codes_bytes":${dirBytes(codesPath)}"""
      out ++= s""","pq_vectors_bytes":${dirBytes(s"$dir/embeddings.parquet")}"""
      // round-16: the BIT-PACKED index (the ivfpq_index artifact q135/
      // q136/q151 actually serve from — one BIGINT code word + norm +
      // coarse cell per row) vs the row-form codes table above: bytes
      // on disk and the full-scan packed-ADC serve. This turns the
      // "128×-class memory-traffic cut" from the q134 header into the
      // measured artifact-vs-embeddings byte ratio.
      val (idx, tIdx) = timed {
        val i = Similarity.ivfPqIndex(spark, dir); i.count(); i
      }
      val (packedRows, tPackedServe) = timed(
        Similarity.pqAdcServePacked(idx, Similarity.pqProbes(n), cb)
          .count())
      // sizes via the Hadoop FileSystem, not java.io — the artifact
      // root may be hdfs:// or s3a:// in a cluster deployment (the
      // store's own access path)
      val hConf = spark.sparkContext.hadoopConfiguration
      val idxBytes = idx.inputFiles.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hConf).getFileStatus(p).getLen
      }.sum
      out ++= f""","ivfpq_index_build_secs":$tIdx%.2f"""
      out ++= s""","ivfpq_index_bytes":$idxBytes"""
      out ++= s""","packed_served_rows":$packedRows"""
      out ++= f""","packed_serve_secs":$tPackedServe%.2f"""
    }

    if (metrics("sq8")) {
      // the SQ8 axis (q140/q141's 4× scheme) on the same replicas.
      // Since round 17 the deployment shape IS the registered shape:
      // q140/q141 read the durable sq8_index artifact (real TINYINTs;
      // integer-valued-double rehydration is exact, so the ranking is
      // bitwise the inline construction's). The probe times the
      // artifact build (a first-resolve ensure miss), the registered
      // serve end to end, and an isolated index-read serve; bytes on
      // disk pin the 4×-class claim next to PQ's 15-17×.
      val (sqIdx, tMatSq) = timed {
        val i = Similarity.sq8Index(spark, dir); i.count(); i
      }
      val (sqRows, tQ140) = timed(
        Registry.queries("q140_sq8_topk")(spark, dir).count())
      val (sqServed, tServeSq) = timed {
        import graft.functions.VectorFns.dot
        val rel = sqIdx
        val probes = rel
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
          .limit(32)
          .select(col("vec_id").as("q_id"), col("sv").as("qsv"),
            col("nrm").as("qn"), col("amax").as("qa"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("sq_mu").desc, col("neighbor").asc)
        rel.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("idot", dot(col("sv"), col("qsv")))
          .withColumn("sq_mu",
            floor(col("idot") * col("qa") * col("amax")
              / (lit(16129.0) * (col("qn") * col("nrm")))
              * lit(1000000.0) + lit(0.5)).cast("long"))
          .select(col("q_id"), col("vec_id").as("neighbor"), col("sq_mu"))
          .withColumn("rank", row_number().over(wRank).cast("long"))
          .filter(col("rank") <= 10)
          .count()
      }
      def dirBytesSq(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists()) 0L else d.listFiles().map(_.length()).sum
      }
      // artifact sizes via the Hadoop FS (the store root may be
      // hdfs/s3); the source embeddings stay a local testdata dir
      val sqConf = spark.sparkContext.hadoopConfiguration
      val sqBytes = sqIdx.inputFiles.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(sqConf).getFileStatus(p).getLen
      }.sum
      out ++= s""","sq8_rows":$sqRows"""
      out ++= f""","sq8_registered_secs":$tQ140%.2f"""
      out ++= f""","sq8_index_build_secs":$tMatSq%.2f"""
      out ++= s""","sq8_served_rows":$sqServed"""
      out ++= f""","sq8_serve_secs":$tServeSq%.2f"""
      out ++= s""","sq8_bytes":$sqBytes"""
      out ++= s""","sq8_vectors_bytes":${dirBytesSq(s"$dir/embeddings.parquet")}"""
    }

    if (metrics("rerank")) {
      // the round-17 two-stage serve at scale: resolve the three
      // serving elections (first touch builds the durable ground-truth
      // + curve artifacts — timed separately as the OFFLINE half a
      // deployment pays once per corpus), then time the elected-depth
      // rerank (q153's registration shape) and the fully-composed
      // production serve (q157) end to end. This turns the
      // "probes × R-bounded" re-rank claim into a measured curve
      // alongside the packed-serve rows above.
      val (elections, tElect) = timed {
        (Similarity.electedNprobe(spark, dir),
          Similarity.electedWidth(spark, dir),
          Similarity.electedRerankR(spark, dir))
      }
      val (rerankRows, tRerank) = timed(
        Similarity.ivfPqRerank(spark, dir, elections._3).count())
      val (prodRows, tProd) = timed(
        Registry.queries("q157_ann_production")(spark, dir).count())
      val eConf = spark.sparkContext.hadoopConfiguration
      val eBytes = Similarity.ivfPqIndex(spark, dir, elections._2)
        .inputFiles.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(eConf).getFileStatus(p).getLen
        }.sum
      out ++= s""","elected_nprobe":${elections._1}"""
      out ++= s""","elected_width":${elections._2}"""
      out ++= s""","elected_r":${elections._3}"""
      out ++= f""","elect_build_secs":$tElect%.2f"""
      out ++= s""","rerank_rows":$rerankRows"""
      out ++= f""","rerank_secs":$tRerank%.2f"""
      out ++= s""","prod_rows":$prodRows"""
      out ++= f""","prod_secs":$tProd%.2f"""
      out ++= s""","elected_index_bytes":$eBytes"""
    }

    // cold/warm pair for a registered query: first run pays any
    // fit-on-miss artifact builds, second times the steady state
    def twice(name: String): (Double, Double) = {
      val (_, cold) = timed(Registry.queries(name)(spark, dir).count())
      val (_, warm) = timed(Registry.queries(name)(spark, dir).count())
      (cold, warm)
    }

    if (metrics("serves17")) {
      // the round-17 additions end to end on the same replicas: the
      // TRAINED packed index serve (q158 — includes fit-on-miss for
      // both quantizers on first touch), the STREAMING elected-depth
      // packed serve (q159 — micro-batch machinery + stream-static
      // join), and the RESIDUAL serve (q160 — includes the residual
      // index build on first touch). Second runs time the steady
      // state (artifacts warm).
      val (c158, w158) = twice("q158_ivfpq_trained")
      val (c159, w159) = twice("q159_stream_ivfpq_serve")
      val (c160, w160) = twice("q160_ivfpq_residual")
      out ++= f""","q158_cold_secs":$c158%.2f,"q158_warm_secs":$w158%.2f"""
      out ++= f""","q159_cold_secs":$c159%.2f,"q159_warm_secs":$w159%.2f"""
      out ++= f""","q160_cold_secs":$c160%.2f,"q160_warm_secs":$w160%.2f"""
    }

    if (metrics("serves18")) {
      // the round-18 additions end to end: the TRAINED election arc
      // (q162 nprobe curve + q163 R curve builds ride q164's cold run
      // on first touch — the offline half a deployment pays once per
      // corpus), the trained production serve (q164), the geometry
      // curve (q165 — cold includes both serves' recall measurement),
      // and the geometry-composed q157. Warm runs time steady state.
      val (c164, w164) = twice("q164_trained_production")
      val (c165, w165) = twice("q165_geometry_curve")
      val (c157, w157) = twice("q157_ann_production")
      out ++= s""","trained_elected_nprobe":${
        Similarity.electedTrainedNprobe(spark, dir)}"""
      out ++= s""","trained_elected_r":${
        Similarity.electedTrainedRerankR(spark, dir)}"""
      out ++= s""","elected_geometry":"${
        Similarity.electedGeometry(spark, dir)}""""
      out ++= f""","q164_cold_secs":$c164%.2f,"q164_warm_secs":$w164%.2f"""
      out ++= f""","q165_cold_secs":$c165%.2f,"q165_warm_secs":$w165%.2f"""
      out ++= f""","q157_cold_secs":$c157%.2f,"q157_warm_secs":$w157%.2f"""
    }

    if (metrics("lsh")) {
      // registered width and the contract's widened ~log2(N) width
      val widened = math.min(63,
        math.max(8, math.ceil(math.log(nVecs.toDouble) / math.log(2)).toInt))
      for ((bits, tag) <- Seq((8, "lsh8"), (widened, "lshw"))) {
        val (occ, tOcc) = timed {
          n.select(Similarity.signatureColBits(bits).as("signature"))
            .groupBy(col("signature")).agg(count(lit(1)).as("b"))
            .agg(sum(col("b") * (col("b") - 1) / 2).cast("long").as("cand"),
              max(col("b")).as("hottest"), count(lit(1)).as("buckets"))
            .collect().head
        }
        out ++= s""","${tag}_bits":$bits"""
        out ++= s""","${tag}_cand_implied":${occ.getLong(0)}"""
        out ++= s""","${tag}_hottest":${occ.getLong(1)}"""
        out ++= s""","${tag}_buckets":${occ.getLong(2)}"""
        out ++= f""","${tag}_secs":$tOcc%.2f"""
      }
    }

    n.unpersist(blocking = false)
    out ++= "}"
    println(out.result())
    spark.stop()
  }

  /** Embeddings-only replica at `dir`: `copies` id-shifted,
    * component-rotated copies. Reused if already on disk with the right
    * row count. */
  private def buildIfAbsent(spark: SparkSession, src: String, dir: String,
      copies: Int): Unit = {
    val path = s"$dir/embeddings.parquet"
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val want = base.count() * copies
    val have =
      try spark.read.parquet(path).count()
      catch { case _: Exception => -1L }
    if (have == want) return
    val dim = 64
    val scaled = (0 until copies).map { i =>
      val shifted = base.withColumn("vec_id", col("vec_id") + lit(i * SHIFT))
      val rot = i % dim
      if (rot == 0) shifted
      else shifted.withColumn("embedding",
        expr(s"concat(slice(embedding, ${rot + 1}, ${dim - rot}), " +
          s"slice(embedding, 1, $rot))"))
    }.reduce(_ unionByName _)
    scaled.repartition(32).write.mode("overwrite").parquet(path)
  }
}
