package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables.table

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed metadata. The testdata has no real image bytes, so the payload is
  * the UTF-8 encoding of `text` and the "decode" is a deterministic fake —
  * but the Spark-side shape (binary column + metadata projection, schema,
  * partitioning) is real. The typed mapPartitions decode pipeline (batch
  * iteration, stubbed codec) lives in graft.multimodal.MediaPipeline and is
  * exercised by unit tests.
  */
object Multimodal {

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q26: binary payload + deterministic fake feature extraction.
    // octet_length/md5 on both engines; pure projection, no shuffle.
    Q("q26_multimodal_features",
      oracle = Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               64 + octet_length(encode(text)) % 576 AS width,
               64 + (octet_length(encode(text)) // 7) % 416 AS height,
               md5(text) AS content_fp
        FROM documents
        ORDER BY doc_id"""),
      run = (spark, dir) => {
        val nb = length(encode(col("text"), "UTF-8")).cast("long")
        table(spark, dir, "documents")
          .select(col("doc_id"),
            nb.as("n_bytes"),
            (lit(64L) + nb % 576).as("width"),
            (lit(64L) + floor(nb / 7).cast("long") % 416).as("height"),
            md5(col("text")).as("content_fp"))
          .orderBy(col("doc_id"))
      })
  )
}
