package graft.store

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The fork-free local filesystem: sessions must resolve `file://` to
  * [[NioLocalFileSystem]], and its chmod must land the exact permission
  * bits the shell-exec path would — create, mkdirs, and explicit
  * setPermission all flow through the NIO override.
  */
class NioLocalFileSystemSpec extends AnyFunSuite with SharedSpark {

  private def posixOf(p: String): java.util.Set[PosixFilePermission] =
    Files.getPosixFilePermissions(Paths.get(p))

  test("session file:// resolves to NioLocalFileSystem (getLocal cast intact)") {
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(new java.net.URI("file:///"), conf)
    assert(fs.isInstanceOf[NioLocalFileSystem],
      s"expected NioLocalFileSystem, got ${fs.getClass.getName}")
    // FileSystem.getLocal casts to LocalFileSystem — the subtype must fit
    assert(FileSystem.getLocal(conf).isInstanceOf[NioLocalFileSystem])
  }

  test("FileContext file:// resolves to NioLocalFs (checkpoint write path)") {
    val conf = spark.sessionState.newHadoopConf()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new java.net.URI("file:///"), conf)
    assert(fc.getDefaultFileSystem.isInstanceOf[NioLocalFs],
      s"expected NioLocalFs, got ${fc.getDefaultFileSystem.getClass.getName}")
    // and it must be writable end to end (create + rename, the checkpoint
    // manager's commit shape)
    val dir = tmpDir("graft-niofc")
    val tmp = new Path(dir, "x.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
    out.write(Array[Byte](7)); out.close()
    fc.rename(tmp, new Path(dir, "x"))
    assert(Files.exists(Paths.get(s"$dir/x")))
  }

  test("setPermission applies exact bits via NIO (no shell)") {
    val dir = tmpDir("graft-niofs")
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(new java.net.URI("file:///"), conf)
    val f = new Path(dir, "x.bin")
    val out = fs.create(f, true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    fs.setPermission(f, new FsPermission("640"))
    val got = posixOf(s"$dir/x.bin")
    assert(got.contains(PosixFilePermission.OWNER_READ))
    assert(got.contains(PosixFilePermission.OWNER_WRITE))
    assert(got.contains(PosixFilePermission.GROUP_READ))
    assert(!got.contains(PosixFilePermission.GROUP_WRITE))
    assert(!got.contains(PosixFilePermission.OTHERS_READ))
    assert(!got.contains(PosixFilePermission.OWNER_EXECUTE))
    fs.setPermission(f, new FsPermission("755"))
    val rwx = posixOf(s"$dir/x.bin")
    assert(rwx.contains(PosixFilePermission.OWNER_EXECUTE))
    assert(rwx.contains(PosixFilePermission.OTHERS_READ))
    assert(rwx.contains(PosixFilePermission.OTHERS_EXECUTE))
    assert(!rwx.contains(PosixFilePermission.GROUP_WRITE))
  }

  test("mkdirs with explicit permission flows through the override") {
    val dir = tmpDir("graft-niofs-mk")
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(new java.net.URI("file:///"), conf)
    val d = new Path(dir, "a/b")
    assert(fs.mkdirs(d, new FsPermission("750")))
    val got = posixOf(s"$dir/a/b")
    assert(got.contains(PosixFilePermission.OWNER_EXECUTE))
    assert(got.contains(PosixFilePermission.GROUP_EXECUTE))
    assert(!got.contains(PosixFilePermission.OTHERS_READ))
  }

  test("getFileLinkStatus matches stock semantics without forking") {
    val dir = tmpDir("graft-niofs-ln")
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(new java.net.URI("file:///"), conf)
    val plain = new Path(dir, "plain.txt")
    val out = fs.create(plain, true); out.write(Array[Byte](9)); out.close()
    // non-link: the dereferenced status, no symlink flag
    val st = fs.getFileLinkStatus(plain)
    assert(!st.isSymlink && st.getLen === 1L)
    // link: target carried, not a directory
    Files.createSymbolicLink(Paths.get(s"$dir/ln.txt"), Paths.get(s"$dir/plain.txt"))
    val ln = fs.getFileLinkStatus(new Path(dir, "ln.txt"))
    assert(ln.isSymlink)
    assert(ln.getSymlink.toString.endsWith("plain.txt"))
    assert(ln.getLen === 1L)
    // dangling link: placeholder status with the target, zero length
    Files.createSymbolicLink(Paths.get(s"$dir/dangle"), Paths.get(s"$dir/nope"))
    val dg = fs.getFileLinkStatus(new Path(dir, "dangle"))
    assert(dg.isSymlink && dg.getLen === 0L)
    // missing path: FileNotFoundException, as stock
    intercept[java.io.FileNotFoundException] {
      fs.getFileLinkStatus(new Path(dir, "absent"))
    }
  }

  test("parquet round-trip through the session fs") {
    val dir = tmpDir("graft-niofs-pq")
    spark.range(100).selectExpr("id", "id * 2 AS v")
      .write.mode("overwrite").parquet(s"$dir/t")
    assert(spark.read.parquet(s"$dir/t").count() === 100L)
  }
}
