package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** GraftLake contract: layout detection per format marker, the
  * no-match and ambiguous refusals, and the time-travel argument
  * gates. The dispatch happy path against real data is q417's DuckDB
  * oracle (all four authored tables through one entry point). */
class GraftLakeSpec extends AnyFunSuite {
  import TestSession._

  private def rm(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rm))
    p.delete(): Unit
  }

  private def fresh(name: String, dirs: String*): String = {
    val root = s"/tmp/graft_lakespec/$name"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root))
    dirs.foreach(d => Files.createDirectories(Paths.get(root, d)))
    root
  }

  test("each format's marker detects it") {
    assert(GraftLake.detect(spark,
      fresh("d", "_delta_log")) == GraftLake.Delta)
    val ice = fresh("i", "metadata")
    Files.writeString(
      Paths.get(ice, "metadata", "version-hint.text"), "1")
    assert(GraftLake.detect(spark, ice) == GraftLake.Iceberg)
    assert(GraftLake.detect(spark,
      fresh("h", ".hoodie")) == GraftLake.Hudi)
    assert(GraftLake.detect(spark,
      fresh("p", "snapshot", "schema")) == GraftLake.Paimon)
  }

  test("a bare metadata/ directory is NOT Iceberg (needs the hint or " +
    "a vN.metadata.json)") {
    val root = fresh("baremeta", "metadata")
    val e = intercept[IllegalStateException] {
      GraftLake.detect(spark, root)
    }
    assert(e.getMessage.contains("matches no lakehouse layout"))
  }

  test("no marker and multiple markers refuse loudly") {
    val e1 = intercept[IllegalStateException] {
      GraftLake.detect(spark, fresh("none"))
    }
    assert(e1.getMessage.contains("matches no lakehouse layout"))
    val e2 = intercept[IllegalStateException] {
      GraftLake.detect(spark, fresh("multi", "_delta_log", ".hoodie"))
    }
    assert(e2.getMessage.contains("MULTIPLE"))
    assert(e2.getMessage.contains("delta") &&
      e2.getMessage.contains("hudi"))
    intercept[IllegalStateException] {
      GraftLake.detect(spark, "/tmp/graft_lakespec/nope")
    }
  }

  test("time-travel arguments a format cannot express refuse loudly") {
    val hudi = fresh("hver", ".hoodie")
    val e = intercept[IllegalArgumentException] {
      GraftLake.read(spark, hudi, version = Some(1L))
    }
    assert(e.getMessage.contains("HudiCowLite"))
    // Paimon timestamp travel DISPATCHES (timeMillis-based) — the
    // empty fixture fails inside PaimonLite, proving the routing
    val paimon = fresh("pts", "snapshot", "schema")
    val e2 = intercept[IllegalStateException] {
      GraftLake.read(spark, paimon, timestampMs = Some(1L))
    }
    assert(e2.getMessage.contains("no snapshot"))
  }
}
