package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Durably write a small metadata file BEFORE it gets atomically
  * renamed/linked into place: a crash can journal the rename ahead of
  * the file's data blocks (create+rename-to-new-name sits outside the
  * ext4 rename-overwrite fsync heuristic), publishing a zero-length
  * commit artifact. Used for every rename-published commit artifact —
  * today that is [[VersionedStore]]'s version manifests, the single
  * commit point of versioned AND tiered stores alike.
  *
  * On the local scheme, Hadoop's ChecksumFileSystem output stream is
  * not Syncable, so `hsync()` silently degrades to a flush — the bytes
  * reach only the page cache. The file scheme therefore writes through
  * an honest `FileChannel.force(true)` (the same scheme dispatch as
  * `VersionedStore.publishExclusive`); real Syncable stores (HDFS) get
  * `hsync`. The channel write loops: a single `write(buf)` may write a
  * prefix by API contract, and a truncated commit artifact is exactly
  * the torn state this helper exists to prevent.
  */
object DurableWrite {
  def write(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit =
    if ("file" == Option(fs.getUri.getScheme).getOrElse("file")) {
      // drop any stale ChecksumFileSystem sidecar: this write bypasses
      // the checksum layer, and a leftover `.name.crc` (e.g. from a
      // crashed fs.create-era attempt at the same path) would follow a
      // later rename and fail every checksummed read of the artifact
      val crc = new java.io.File(
        new java.io.File(path.toUri.getPath).getParentFile,
        "." + path.getName + ".crc")
      if (crc.exists()) crc.delete()
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(path.toUri.getPath),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        val buf = java.nio.ByteBuffer.wrap(bytes)
        while (buf.hasRemaining) ch.write(buf)
        ch.force(true)
      } finally ch.close()
    } else {
      val out = fs.create(path, true)
      try { out.write(bytes); out.hsync() } finally out.close()
    }
}
