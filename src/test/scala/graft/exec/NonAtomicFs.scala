package graft.exec

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test filesystem simulating S3-class object-store semantics on top of
  * the local disk: `rename` is COPY+DELETE (a reader can observe the
  * destination partially copied — the reason ArtifactStore must not use
  * rename as its publish primitive there) and `setTimes` is unsupported
  * (so GC liveness must fall back to the `_GRAFT_TOUCH` file).
  * Registered in ArtifactStoreSpec via `fs.nonatomic.impl`; the
  * `nonatomic` scheme is on ArtifactStore's non-atomic list, so the
  * store must pick marker-LAST copy-in-place publication against it. */
class NonAtomicFs extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean =
    // deliberately non-atomic: bytes land file-by-file, source vanishes
    // only at the end — exactly the window a torn read lives in
    FileUtil.copy(this, src, this, dst, true /* deleteSource */, getConf)

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException(
      "object-store stub: setTimes unsupported")
}
