package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** Atomic text-file publication for table-format metadata (version
  * hints, LATEST pointers, commit JSON): a plain truncate-and-write is
  * visible half-written to a concurrent reader — a streaming source's
  * offset poll runs on its own thread and once read an empty
  * version-hint mid-rewrite. Write a sibling temp file first, then
  * publish atomically:
  *  - `replace = true`: ATOMIC_MOVE over the target (rename(2));
  *  - `replace = false`: HARD-LINK the temp file to the target —
  *    link(2) fails with EEXIST when the name is taken, so the commit
  *    guard genuinely fires. (ATOMIC_MOVE must NOT be used here: on
  *    Linux rename(2) silently REPLACES an existing target, so a
  *    move-based "no-replace" publish would clobber a concurrent
  *    writer's commit instead of failing loudly.)
  */
object AtomicFiles {

  /** Scheme-aware publication for table roots that may be qualified
    * URIs (file:/…, hdfs://…): local filesystems route through the
    * strict link(2) no-replace guard below; remote filesystems write
    * a sibling temp file and publish via the FS's own rename —
    * no-replace there is an exists-check plus HDFS's
    * no-overwrite-on-rename contract (single-writer scope, like every
    * maintenance writer using this). java.nio would treat
    * "file:/a/b" as a RELATIVE path named "file:" and silently write
    * outside the table. */
  def write(fs: org.apache.hadoop.fs.FileSystem,
            path: org.apache.hadoop.fs.Path, text: String,
            replace: Boolean): Unit = {
    val qualified = fs.makeQualified(path)
    if (qualified.toUri.getScheme == "file")
      write(java.nio.file.Paths.get(qualified.toUri.getPath), text,
        replace)
    else {
      val tmp = new org.apache.hadoop.fs.Path(qualified.getParent,
        s".${qualified.getName}.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!replace && fs.exists(qualified)) {
        fs.delete(tmp, false)
        throw new java.nio.file.FileAlreadyExistsException(
          qualified.toString)
      }
      if (replace) {
        // replace must be ONE rename with overwrite semantics — a
        // delete-then-rename leaves a window (and a crash state) in
        // which the published pointer (version-hint.text, LATEST)
        // does not exist at all. FileContext.rename(OVERWRITE) is the
        // public API carrying HDFS's atomic-overwrite rename; only an
        // FS with no AbstractFileSystem binding falls back to the
        // windowed path.
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            qualified.toUri, fs.getConf)
          fc.rename(tmp, qualified,
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          return
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            if (fs.exists(qualified)) fs.delete(qualified, false)
        }
      }
      if (!fs.rename(tmp, qualified)) {
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"AtomicFiles: could not publish $qualified")
      }
    }
  }

  def write(path: Path, text: String, replace: Boolean = true): Unit = {
    val tmp = path.resolveSibling(
      s".${path.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, text)
    if (replace) {
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
    } else {
      try Files.createLink(path, tmp)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); throw e
      }
      Files.deleteIfExists(tmp): Unit
    }
  }
}
