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
