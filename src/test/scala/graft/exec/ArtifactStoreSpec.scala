package graft.exec

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The durable-artifact contract the round-11 verdict asked for: a
  * second process (simulated by clearing the per-process memo, and by
  * swapping the root back in) must REUSE a published artifact instead
  * of rebuilding, builds must publish atomically behind a marker, keys
  * must track source-file identity, and GC must reap only stale
  * store-owned entries. */
class ArtifactStoreSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def withRoot[A](f: String => A): A = {
    val dir = Files.createTempDirectory("graft-store").toFile.getAbsolutePath
    ArtifactStore.setRootForTest(Some(dir))
    try f(dir)
    finally ArtifactStore.setRootForTest(None)
  }

  private def writeOne(path: String, v: Long): Unit = {
    import spark.implicits._
    Seq(v).toDF("v").coalesce(1).write.mode("overwrite").parquet(path)
  }

  test("ensure builds once, then serves the memoized path") {
    withRoot { root =>
      val builds = new AtomicInteger()
      def resolve() = ArtifactStore.ensure(spark, "fam", "k1") { tmp =>
        builds.incrementAndGet(); writeOne(tmp, 42L)
      }
      val p1 = resolve(); val p2 = resolve()
      builds.get() shouldBe 1
      p1 shouldBe p2
      p1 should startWith(root)
      spark.read.parquet(p1).collect().map(_.getLong(0)).toSeq shouldBe Seq(42L)
    }
  }

  test("a fresh process reuses another process's published artifact") {
    withRoot { root =>
      ArtifactStore.ensure(spark, "fam", "k1") { writeOne(_, 7L) }
      // simulate a NEW process on the same root: memo gone, FS intact
      ArtifactStore.setRootForTest(Some(root))
      val p = ArtifactStore.ensure(spark, "fam", "k1") { _ =>
        fail("rebuilt an artifact that is already published")
      }
      spark.read.parquet(p).collect().map(_.getLong(0)).toSeq shouldBe Seq(7L)
    }
  }

  test("an incomplete (markerless) leftover is rebuilt, not trusted") {
    withRoot { root =>
      // a crashed process left parquet but no _GRAFT_OK
      writeOne(s"$root/fam/k1", 1L)
      val p = ArtifactStore.ensure(spark, "fam", "k1") { writeOne(_, 2L) }
      spark.read.parquet(p).collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    }
  }

  test("sourceKey tracks file identity: regenerated data changes the key") {
    withRoot { _ =>
      val data = Files.createTempDirectory("graft-src").toFile.getAbsolutePath
      writeOne(s"$data/documents.parquet", 1L)
      val k1 = ArtifactStore.sourceKey(spark, data, "documents")
      // same path, regenerated content (different size and mtime) must
      // re-key — a fresh process must NOT reuse the stale artifact
      ArtifactStore.setRootForTest(
        Some(Files.createTempDirectory("graft-store2").toFile.getAbsolutePath))
      import spark.implicits._
      Seq(1L, 2L, 3L).toDF("v").coalesce(1)
        .write.mode("overwrite").parquet(s"$data/documents.parquet")
      val k2 = ArtifactStore.sourceKey(spark, data, "documents")
      k2 should not be k1
      k1 should fullyMatch regex "[0-9a-f]{16}"
    }
  }

  test("distinct dirs can never collide on a 32-bit hashCode") {
    // the round-11 ADVICE finding: Integer.toHexString(dir.hashCode)
    // collides ("Aa"/"BB" families); md5-based keys must not
    withRoot { _ =>
      val a = Files.createTempDirectory("graft-Aa").toFile.getAbsolutePath
      val b = Files.createTempDirectory("graft-BB").toFile.getAbsolutePath
      writeOne(s"$a/documents.parquet", 1L)
      writeOne(s"$b/documents.parquet", 1L)
      ArtifactStore.sourceKey(spark, a, "documents") should not be
        ArtifactStore.sourceKey(spark, b, "documents")
    }
  }

  test("gc reaps stale entries, orphan tmp dirs and old markerless junk; " +
    "leaves fresh keyed entries and fresh ensureAt families") {
    withRoot { root =>
      val old = System.currentTimeMillis() - 8L * 3600 * 1000
      // stale published entry: marker mtime 8h back
      ArtifactStore.ensure(spark, "fam", "stale") { writeOne(_, 1L) }
      new java.io.File(s"$root/fam/stale/_GRAFT_OK").setLastModified(old)
      // orphan tmp from a crashed build, also old
      val orphan = new java.io.File(s"$root/fam/.tmp-dead-xyz")
      orphan.mkdirs(); orphan.setLastModified(old)
      // fresh keyed entry
      ArtifactStore.ensure(spark, "fam", "fresh") { writeOne(_, 2L) }
      // fresh ensureAt family (marker at depth 1) must survive...
      ArtifactStore.ensureAt(spark, "q54_centroids", "kA") { writeOne(_, 3L) }
      // ...a STALE ensureAt family must go
      ArtifactStore.ensureAt(spark, "q71_lsh_index", "kB") { writeOne(_, 4L) }
      new java.io.File(s"$root/q71_lsh_index/_GRAFT_OK").setLastModified(old)
      // old markerless junk (crashed marker-last build / pre-rename
      // leftover — no reader ever trusted it) is reaped once old
      val junk = new java.io.File(s"$root/fam/junk")
      junk.mkdirs(); junk.setLastModified(old)
      // new process => lazy gc runs before its first build
      ArtifactStore.setRootForTest(Some(root))
      ArtifactStore.ensure(spark, "fam", "other") { writeOne(_, 5L) }
      new java.io.File(s"$root/fam/stale").exists() shouldBe false
      orphan.exists() shouldBe false
      junk.exists() shouldBe false
      new java.io.File(s"$root/fam/fresh").exists() shouldBe true
      new java.io.File(s"$root/q54_centroids").exists() shouldBe true
      new java.io.File(s"$root/q71_lsh_index").exists() shouldBe false
    }
  }

  // ------------------------------------------------------- ensureAt

  test("ensureAt: builds once at the FIXED path, reuses on the same key " +
    "(even from a fresh process), rebuilds IN PLACE on a key change") {
    withRoot { root =>
      val builds = new AtomicInteger()
      def resolve(key: String, v: Long) =
        ArtifactStore.ensureAt(spark, "q54_centroids", key) { p =>
          builds.incrementAndGet(); writeOne(p, v)
        }
      resolve("kA", 1L) shouldBe true
      resolve("kA", 99L) shouldBe false  // same key: reuse, no rebuild
      builds.get() shouldBe 1
      spark.read.parquet(s"$root/q54_centroids").collect()
        .map(_.getLong(0)).toSeq shouldBe Seq(1L)
      // a fresh process on the same root still reuses (key is IN the
      // marker, not in any per-process memo)
      ArtifactStore.setRootForTest(Some(root))
      resolve("kA", 99L) shouldBe false
      builds.get() shouldBe 1
      // key change (regenerated corpus / bumped params): rebuild in
      // place at the SAME path — the static oracle keeps working
      resolve("kB", 2L) shouldBe true
      builds.get() shouldBe 2
      spark.read.parquet(s"$root/q54_centroids").collect()
        .map(_.getLong(0)).toSeq shouldBe Seq(2L)
      // ...and the OLD key no longer matches afterwards
      resolve("kA", 3L) shouldBe true
      builds.get() shouldBe 3
    }
  }

  test("ensureAt: a markerless leftover at the fixed path is rebuilt, " +
    "not trusted") {
    withRoot { root =>
      writeOne(s"$root/q71_lsh_index", 1L)
      ArtifactStore.ensureAt(spark, "q71_lsh_index", "k") { writeOne(_, 2L) }
      spark.read.parquet(s"$root/q71_lsh_index").collect()
        .map(_.getLong(0)).toSeq shouldBe Seq(2L)
    }
  }

  // --------------------------------------- object-store (rename-unsafe)

  /** Root on the `nonatomic` scheme — NonAtomicFs: rename is
    * copy+delete, setTimes throws. */
  private def withNonAtomicRoot[A](f: (String, String) => A): A = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.nonatomic.impl", classOf[NonAtomicFs].getName)
    val local = Files.createTempDirectory("graft-oss").toFile.getAbsolutePath
    val root = s"nonatomic://$local"
    ArtifactStore.setRootForTest(Some(root))
    try f(root, local)
    finally ArtifactStore.setRootForTest(None)
  }

  test("object-store mode: publish is marker-LAST copy-in-place — the " +
    "builder receives the FINAL path (no .tmp sibling to rename), the " +
    "marker lands after the data, and a fresh process reuses the bytes") {
    withNonAtomicRoot { (root, local) =>
      var builtAt: String = null
      ArtifactStore.ensure(spark, "fam", "k1") { p =>
        builtAt = p
        // marker-last: nothing at the destination is certified yet
        new java.io.File(s"$local/fam/k1/_GRAFT_OK").exists() shouldBe false
        writeOne(p, 7L)
      }
      builtAt should not include "/.tmp-"
      builtAt should endWith("/fam/k1")
      new java.io.File(s"$local/fam/k1/_GRAFT_OK").exists() shouldBe true
      // fresh process: reuse without rebuild
      ArtifactStore.setRootForTest(Some(root))
      val p = ArtifactStore.ensure(spark, "fam", "k1") { _ =>
        fail("rebuilt a published object-store artifact")
      }
      spark.read.parquet(p).collect().map(_.getLong(0)).toSeq shouldBe Seq(7L)
    }
  }

  test("object-store mode: a crashed (markerless) partial build is " +
    "cleared and rebuilt; ensureAt's stale key rebuilds in place too") {
    withNonAtomicRoot { (root, local) =>
      // crash: data landed, marker never written
      writeOne(s"$root/fam/k1", 1L)
      new java.io.File(s"$local/fam/k1").exists() shouldBe true
      val p = ArtifactStore.ensure(spark, "fam", "k1") { writeOne(_, 2L) }
      spark.read.parquet(p).collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
      // fixed-path staleness on the same FS class
      ArtifactStore.ensureAt(spark, "cb", "kA") { writeOne(_, 3L) } shouldBe true
      ArtifactStore.ensureAt(spark, "cb", "kA") { writeOne(_, 9L) } shouldBe false
      ArtifactStore.ensureAt(spark, "cb", "kB") { writeOne(_, 4L) } shouldBe true
      spark.read.parquet(s"$root/cb").collect()
        .map(_.getLong(0)).toSeq shouldBe Seq(4L)
    }
  }

  // ------------------------------------------- concurrent same-key writers

  /** Two writers racing on the same key through the PUBLIC API (the
    * real fleet case — ensureAt has no per-process memo, so two
    * threads here race exactly like two processes). The reader-facing
    * guarantee under test: the published artifact is ONE job's
    * complete output, never a union of two jobs' part files
    * (part names are job-unique, so interleaved commits would
    * otherwise duplicate rows under a valid marker). */
  private def raceTwoWriters(): (Int, Seq[(Long, String)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val builds = new AtomicInteger()
    // force real overlap where both builders CAN run (atomic mode):
    // each waits briefly for the other mid-build; under the lease
    // (object-store mode) only one build runs, so the await times out
    // harmlessly and the single builder proceeds
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def writer(tag: String): Thread = {
      val t = new Thread(() => {
        ArtifactStore.ensureAt(spark, "racefam", "k1") { p =>
          builds.incrementAndGet()
          try barrier.await(2, java.util.concurrent.TimeUnit.SECONDS)
          catch { case _: Exception => () }
          Seq(1L, 2L, 3L).toDF("v").withColumn("w", lit(tag))
            .coalesce(1).write.mode("overwrite").parquet(p)
        }
        ()
      })
      t.start(); t
    }
    val ts = Seq(writer("a"), writer("b"))
    ts.foreach(_.join(120000))
    val rows = spark.read.parquet(ArtifactStore.fixedPath("racefam"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    (builds.get(), rows)
  }

  test("atomic mode: two concurrent same-key ensureAt writers publish " +
    "exactly one complete artifact — the loser's rename is detected " +
    "and discarded, never unioned in") {
    withRoot { _ =>
      val (_, rows) = raceTwoWriters()
      rows.map(_._1).sorted shouldBe Seq(1L, 2L, 3L) // 3 rows, not 6
      rows.map(_._2).distinct should have length 1   // ONE job's files
    }
  }

  test("object-store mode: the publish lease serializes two concurrent " +
    "same-key writers — one builds, the other waits for the marker and " +
    "reuses; no part-file union") {
    withNonAtomicRoot { (_, _) =>
      val (builds, rows) = raceTwoWriters()
      builds shouldBe 1
      rows.map(_._1).sorted shouldBe Seq(1L, 2L, 3L)
      rows.map(_._2).distinct should have length 1
    }
  }

  test("object-store mode: GC liveness falls back to the _GRAFT_TOUCH " +
    "file when setTimes is unsupported — a touched entry survives gc, " +
    "an untouched one is reaped") {
    withNonAtomicRoot { (root, local) =>
      ArtifactStore.ensure(spark, "fam", "k1") { writeOne(_, 1L) }
      // age the marker PAST the reuse-touch path but not past gc yet:
      // a fresh-process reuse must refresh liveness via the touch file
      // (setTimes throws on this FS)
      ArtifactStore.setRootForTest(Some(root))
      ArtifactStore.ensure(spark, "fam", "k1") { _ => fail("rebuild") }
      val touch = new java.io.File(s"$local/fam/k1/_GRAFT_TOUCH")
      touch.exists() shouldBe true
      // marker 8h old but touch fresh => survives a new process's gc
      val old = System.currentTimeMillis() - 8L * 3600 * 1000
      new java.io.File(s"$local/fam/k1/_GRAFT_OK").setLastModified(old)
      ArtifactStore.setRootForTest(Some(root))
      ArtifactStore.ensure(spark, "fam", "other") { writeOne(_, 2L) }
      new java.io.File(s"$local/fam/k1").exists() shouldBe true
      // touch also old => the entry's liveness truly lapsed => reaped
      touch.setLastModified(old)
      ArtifactStore.setRootForTest(Some(root))
      ArtifactStore.ensure(spark, "fam", "third") { writeOne(_, 3L) }
      new java.io.File(s"$local/fam/k1").exists() shouldBe false
    }
  }

  test("contentKey tracks the CURRENT bytes under a mutable fixed path: " +
    "stable across reads, changed by an in-place rewrite, never " +
    "memoized (the derivative-of-ensureAt staleness recipe)") {
    withRoot { _ =>
      val dir = Files.createTempDirectory("graft-ck").toFile.getAbsolutePath
      val p = s"$dir/fixed"
      ArtifactStore.contentKey(spark, p) shouldBe
        ArtifactStore.contentKey(spark, p) // missing path: stable digest
      writeOne(p, 1L)
      val k1 = ArtifactStore.contentKey(spark, p)
      ArtifactStore.contentKey(spark, p) shouldBe k1
      // in-place rewrite (the ensureAt rebuild shape) must change the
      // key on the NEXT call — no per-process memo to go stale
      writeOne(p, 2L)
      ArtifactStore.contentKey(spark, p) should not be k1
      // hidden marker/touch files don't enter the digest: rewriting a
      // marker alone must not re-key a derivative
      val k2 = ArtifactStore.contentKey(spark, p)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p, "_GRAFT_OK"), "k".getBytes("UTF-8"))
      ArtifactStore.contentKey(spark, p) shouldBe k2
    }
  }
}
