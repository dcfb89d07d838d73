package graft

import graft.core.Fs
import org.apache.hadoop.conf.Configuration

/** Crash-safety contract of Fs.replace (core/Fs.scala): the destination
  * payload must survive every failure point — the old delete-then-rename
  * could lose the table's parquet while the checkpointed catalog still
  * listed it. */
class FsSpec extends SparkSpecBase {

  private val conf = new Configuration()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_fs").toString

  private def write(path: String, body: String): Unit =
    Fs.writeStringAtomic(path, body, conf)

  test("replace swaps payload and leaves no aside copy behind") {
    val dir = tmpDir()
    write(s"$dir/src", "new")
    write(s"$dir/dst", "old")
    Fs.replace(s"$dir/src", s"$dir/dst", conf)
    assert(Fs.readString(s"$dir/dst", conf) === Some("new"))
    assert(!new java.io.File(dir).list().exists(_.startsWith(".dst.old-")),
      "the aside copy must be deleted after a successful swap")
  }

  test("failed replace restores the old destination instead of losing it") {
    val dir = tmpDir()
    write(s"$dir/dst", "old")
    // src does not exist -> the into-place rename fails AFTER the old
    // payload moved aside; the old payload must come back
    intercept[java.io.IOException] {
      Fs.replace(s"$dir/missing_src", s"$dir/dst", conf)
    }
    assert(Fs.readString(s"$dir/dst", conf) === Some("old"),
      "a failed replace must never lose the existing destination")
  }

  test("replace reclaims aside copies leaked by an earlier crash") {
    val dir = tmpDir()
    write(s"$dir/dst", "old")
    write(s"$dir/.dst.old-crash001", "leaked") // crash-after-rename leftover
    write(s"$dir/src", "new")
    Fs.replace(s"$dir/src", s"$dir/dst", conf)
    assert(Fs.readString(s"$dir/dst", conf) === Some("new"))
    assert(!new java.io.File(dir).list().exists(_.startsWith(".dst.old-")),
      "stale aside copies for this destination must be reclaimed")
  }

  test("replace heals a crash-orphaned aside: dst missing, aside is the only copy") {
    // crash window: aside rename done, into-place rename not -> dst is gone
    // and .dst.old-* holds the only old payload. The NEXT replace must
    // restore it before proceeding, so even a replace that then fails
    // (missing src) leaves the old payload back at dst.
    val dir = tmpDir()
    write(s"$dir/.dst.old-deadbeef", "only-copy")
    intercept[java.io.IOException] {
      Fs.replace(s"$dir/missing_src", s"$dir/dst", conf)
    }
    assert(Fs.readString(s"$dir/dst", conf) === Some("only-copy"),
      "the orphaned aside must be renamed back to dst on entry")
  }

  test("replace heals the NEWEST orphaned aside and drops older ones") {
    val dir = tmpDir()
    write(s"$dir/.dst.old-aaaa0001", "older")
    Thread.sleep(1100) // local FS mtime granularity is 1s
    write(s"$dir/.dst.old-bbbb0002", "newer")
    write(s"$dir/src", "new")
    Fs.replace(s"$dir/src", s"$dir/dst", conf)
    assert(Fs.readString(s"$dir/dst", conf) === Some("new"))
    assert(!new java.io.File(dir).list().exists(_.startsWith(".dst.old-")),
      "all asides reclaimed after a successful replace")
  }
}
