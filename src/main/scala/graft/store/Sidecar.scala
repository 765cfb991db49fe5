package graft.store

import java.io.ByteArrayOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Robust reader for tiny sidecar metadata files (table properties,
  * layout markers). A single InputStream.read() may short-read on
  * object-store streams — always drain to EOF.
  */
object Sidecar {
  def read(path: Path, conf: Configuration): Option[String] = {
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try {
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toString("UTF-8").trim)
      } finally in.close()
    }
  }
}
