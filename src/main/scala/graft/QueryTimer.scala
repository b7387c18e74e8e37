package graft

import org.apache.spark.sql.SparkSession

/** Dev-only ad-hoc timer: Bench's exact methodology (warmup query,
  * cleaner quiesce, two timed passes, keep the min) over an ARBITRARY
  * comma-separated query list — for measuring queries outside the
  * headline roster (e.g. the prefix riders) without touching the
  * driver-compared bench roster. Not part of the library surface.
  *
  * Usage: runMain graft.QueryTimer <sfDir> <q1,q2,...>
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-querytimer")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same JVM/codegen warmup as Bench
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    def quiesce(): Unit = {
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
    }
    val results = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        def once(): Double = {
          quiesce()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        name -> math.min(once(), once())
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"querytimer","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
