package graft.util

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A metadata-RPC counting local FileSystem (`countfs:` scheme) — the
  * measurement seam for "this code path is O(1) RPCs, not O(history)"
  * contracts: delegates to the local FS like [[SlowFs]], counting every
  * `getFileStatus` whose path contains [[CountFs.needle]] (`exists()`
  * routes through `getFileStatus`, so marker/token probes land here).
  * Registration: `fs.countfs.impl = graft.util.CountFs` +
  * `fs.countfs.impl.disable.cache = true`. */
class CountFs extends RawLocalFileSystem {

  override def getUri: URI = URI.create("countfs:///")
  override def getScheme: String = "countfs"

  override def getFileStatus(f: Path): FileStatus = {
    CountFs.needle.foreach { n =>
      if (f.toString.contains(n)) CountFs.hits.incrementAndGet()
    }
    super.getFileStatus(f)
  }
}

object CountFs {
  /** Count getFileStatus calls on paths containing this substring. */
  @volatile var needle: Option[String] = None
  val hits = new AtomicLong(0L)
}
