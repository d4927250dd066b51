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

  test("gc reaps stale entries and orphan tmp dirs, leaves fresh and foreign ones") {
    withRoot { root =>
      val old = System.currentTimeMillis() - 8L * 3600 * 1000
      // stale published entry: marker mtime 8h back
      ArtifactStore.ensure(spark, "fam", "stale") { writeOne(_, 1L) }
      new java.io.File(s"$root/fam/stale/_GRAFT_OK").setLastModified(old)
      // orphan tmp from a crashed build, also old
      val orphan = new java.io.File(s"$root/fam/.tmp-dead-xyz")
      orphan.mkdirs(); orphan.setLastModified(old)
      // fresh entry and a foreign (markerless, caller-managed) dir
      ArtifactStore.ensure(spark, "fam", "fresh") { writeOne(_, 2L) }
      val foreign = new java.io.File(s"$root/q54_centroids/data")
      foreign.mkdirs(); new java.io.File(s"$root/q54_centroids").setLastModified(old)
      // new process => lazy gc runs before its first build
      ArtifactStore.setRootForTest(Some(root))
      ArtifactStore.ensure(spark, "fam", "other") { writeOne(_, 3L) }
      new java.io.File(s"$root/fam/stale").exists() shouldBe false
      orphan.exists() shouldBe false
      new java.io.File(s"$root/fam/fresh").exists() shouldBe true
      foreign.exists() shouldBe true
    }
  }
}
