package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AtomicFiles

/** AtomicFiles contract — in particular that the no-replace publish
  * REALLY fails on an existing target (on Linux a rename(2)-based
  * "no-replace" move silently replaces; the hard-link publish is what
  * makes the sinks' single-writer guard fire). */
class AtomicFilesSpec extends AnyFunSuite {

  private def fresh(): java.nio.file.Path = {
    val d = Paths.get(s"/tmp/graft_atomicspec/${java.util.UUID.randomUUID()}")
    Files.createDirectories(d)
    d
  }

  test("replace=true overwrites atomically; content lands whole") {
    val d = fresh()
    val p = d.resolve("hint")
    AtomicFiles.write(p, "1")
    AtomicFiles.write(p, "2")
    assert(Files.readString(p) == "2")
  }

  test("replace=false publishes new files and REFUSES existing ones") {
    val d = fresh()
    val p = d.resolve("00000000000000000001.json")
    AtomicFiles.write(p, "first", replace = false)
    assert(Files.readString(p) == "first")
    intercept[java.nio.file.FileAlreadyExistsException] {
      AtomicFiles.write(p, "second", replace = false)
    }
    // the loser's content must NOT clobber the winner's commit
    assert(Files.readString(p) == "first")
    // and the loser's temp file is cleaned up
    assert(Files.list(d).toArray.length == 1)
  }
}
