package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** Atomic text-file publication for table-format metadata (version
  * hints, LATEST pointers, commit JSON): a plain truncate-and-write is
  * visible half-written to a concurrent reader — a streaming source's
  * offset poll runs on its own thread and once read an empty
  * version-hint mid-rewrite. Write a sibling temp file, then
  * ATOMIC_MOVE it into place; `replace = false` additionally turns a
  * concurrent writer landing the same name into a loud
  * FileAlreadyExistsException (the single-writer commit guard). */
object AtomicFiles {
  def write(path: Path, text: String, replace: Boolean = true): Unit = {
    val tmp = path.resolveSibling(
      s".${path.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, text)
    try {
      if (replace)
        Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); throw e
    }
  }
}
