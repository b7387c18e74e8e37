package graft

import graft.functions.{BigramsGenerator, CharClassCounts, CosineSimilarity, JaccardSortedLongs, KmvDistinctSketch, LshBucketExpr, MinHashBandsExpr, MinHashSignatureExpr, SimHash64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's custom expressions — the
  * same `SparkSessionExtensions` hook the reference uses to inject its
  * columnar rules (AuronSparkSessionExtension.scala:42-45). Enables
  *   SELECT simhash64(split(text, ' ')), kmv_distinct(...), and
  *   LATERAL VIEW bigrams(...)
  * from plain SQL. Use via
  *   SparkSession.builder().withExtensions(new GraftExtensions) or
  *   spark.sql.extensions=graft.GraftExtensions, or imperatively with
  *   GraftExtensions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftExtensions.tableFunctions.foreach { case (name, info, builder) =>
      e.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
    // opt-in ANN rewrite (spark.graft.ann.lshRewrite.enabled)
    e.injectOptimizerRule(_ => graft.plans.GraftLshRewrite)
    // whole-operator path: as-of join logical node -> physical exec
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("kmv_distinct",
      new ExpressionInfo(classOf[KmvDistinctSketch].getName, "kmv_distinct"),
      (es: Seq[Expression]) =>
        KmvDistinctSketch(es.head).toAggregateExpression()),
    ("misra_gries",
      new ExpressionInfo(
        classOf[graft.functions.MisraGriesSketch].getName, "misra_gries"),
      (es: Seq[Expression]) =>
        graft.functions.MisraGriesSketch(es.head,
          litInt(es, 1, "misra_gries")).toAggregateExpression()),
    ("bigrams",
      new ExpressionInfo(classOf[BigramsGenerator].getName, "bigrams"),
      (es: Seq[Expression]) => BigramsGenerator(es.head)),
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (es: Seq[Expression]) => {
        require(es.length == 2,
          s"cosine_similarity requires exactly 2 arguments, got ${es.length}")
        CosineSimilarity(es.head, es(1))
      }),
    // the dedup/ANN primitive kernels, so a SQL-only user can compose
    // the same pipelines the DataFrame modules build (q75/q78 shapes)
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName,
        "minhash_signature"),
      (es: Seq[Expression]) =>
        MinHashSignatureExpr(es.head, litInt(es, 1, "minhash_signature"))),
    ("minhash_bands",
      new ExpressionInfo(classOf[MinHashBandsExpr].getName,
        "minhash_bands"),
      (es: Seq[Expression]) => MinHashBandsExpr(es.head,
        litInt(es, 1, "minhash_bands"), litInt(es, 2, "minhash_bands"))),
    ("lsh_bucket",
      new ExpressionInfo(classOf[LshBucketExpr].getName, "lsh_bucket"),
      (es: Seq[Expression]) => LshBucketExpr(es.head,
        litInt(es, 1, "lsh_bucket"), litInt(es, 2, "lsh_bucket"))),
    ("jaccard_sorted_longs",
      new ExpressionInfo(classOf[JaccardSortedLongs].getName,
        "jaccard_sorted_longs"),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"jaccard_sorted_longs requires exactly " +
          s"2 arguments, got ${es.length}")
        JaccardSortedLongs(es.head, es(1))
      }),
    ("char_class_counts",
      new ExpressionInfo(classOf[CharClassCounts].getName,
        "char_class_counts"),
      (es: Seq[Expression]) => CharClassCounts(es.head)))

  /** Kernel knobs (signature width, banding, hyperplane count/seed) are
    * part of the generated code — they must be literal ints in SQL. */
  private def litInt(es: Seq[Expression], i: Int, fn: String): Int = {
    require(es.length > i, s"$fn: missing argument ${i + 1}")
    es(i) match {
      case e if e.foldable && e.dataType ==
          org.apache.spark.sql.types.IntegerType =>
        // a foldable NULL (CAST(NULL AS INT)) would unbox to 0 — reject
        // it the same way as a non-literal rather than silently using
        // width/seed 0 (0 itself stays legal: it is a valid seed)
        e.eval() match {
          case n: java.lang.Integer => n.intValue()
          case _ => throw new IllegalArgumentException(
            s"$fn: argument ${i + 1} must be a non-NULL INT literal, got $e")
        }
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an INT literal, got $other")
    }
  }

  /** SQL TABLE-function surface: `SELECT * FROM graft_lake('/path')`
    * reads any of the four lakehouse formats via [[graft.sources
    * .GraftLake]]'s layout detection, straight from SQL — the plan IS
    * the native read (the builder returns GraftLake.read's analyzed
    * plan, so pushdown/pruning/codegen are untouched). A second
    * argument travels: an INT/LONG literal is a Delta version /
    * Iceberg snapshot id / Paimon snapshot id; a STRING literal is a
    * named ref (Iceberg branch/tag, Paimon tag). */
  val tableFunctions: Seq[(String, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical
        .LogicalPlan)] = Seq(
    ("graft_lake",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake"),
      (es: Seq[Expression]) => {
        def litStr(e: Expression, what: String): String = e match {
          case l if l.foldable &&
            l.dataType == org.apache.spark.sql.types.StringType =>
            l.eval() match {
              case s: org.apache.spark.unsafe.types.UTF8String =>
                s.toString
              case _ => throw new IllegalArgumentException(
                s"graft_lake: $what must be a non-NULL STRING literal")
            }
          case other => throw new IllegalArgumentException(
            s"graft_lake: $what must be a STRING literal, got $other")
        }
        require(es.nonEmpty && es.size <= 2,
          s"graft_lake(path[, version|ref]) takes 1-2 arguments, " +
            s"got ${es.size}")
        val path = litStr(es.head, "the table path")
        val spark = SparkSession.active
        val df = if (es.size == 1) {
          graft.sources.GraftLake.read(spark, path)
        } else es(1) match {
          case l if l.foldable && (l.dataType ==
            org.apache.spark.sql.types.LongType || l.dataType ==
            org.apache.spark.sql.types.IntegerType) =>
            graft.sources.GraftLake.read(spark, path,
              version = Some(l.eval() match {
                case n: java.lang.Number => n.longValue()
                case _ => throw new IllegalArgumentException(
                  "graft_lake: the version must be a non-NULL " +
                    "INT/LONG literal")
              }))
          case l if l.foldable && l.dataType ==
            org.apache.spark.sql.types.StringType =>
            graft.sources.GraftLake.read(spark, path,
              ref = Some(litStr(l, "the ref")))
          case other => throw new IllegalArgumentException(
            "graft_lake: the second argument must be an INT/LONG " +
              s"version or a STRING ref literal, got $other")
        }
        df.queryExecution.analyzed
      }),
    // `SELECT * FROM graft_lake_changes('/path', from, to)` — the
    // row-level change surface ([[graft.sources.GraftLake
    // .readChanges]]: Delta CDF / Iceberg net diff / Paimon changelog,
    // one vocabulary) from SQL. Version arguments are plan-time
    // INT/LONG literals, so the entry point stays bounded-metadata.
    ("graft_lake_changes",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake_changes"),
      (es: Seq[Expression]) => {
        val fn = "graft_lake_changes"
        require(es.size == 3,
          s"$fn(path, fromVersion, toVersion) takes 3 arguments, " +
            s"got ${es.size}")
        def litStr(e: Expression, what: String): String = e match {
          case l if l.foldable &&
            l.dataType == org.apache.spark.sql.types.StringType =>
            l.eval() match {
              case s: org.apache.spark.unsafe.types.UTF8String =>
                s.toString
              case _ => throw new IllegalArgumentException(
                s"$fn: $what must be a non-NULL STRING literal")
            }
          case other => throw new IllegalArgumentException(
            s"$fn: $what must be a STRING literal, got $other")
        }
        def litLong(e: Expression, what: String): Long = e match {
          case l if l.foldable && (l.dataType ==
            org.apache.spark.sql.types.LongType || l.dataType ==
            org.apache.spark.sql.types.IntegerType) =>
            l.eval() match {
              case n: java.lang.Number => n.longValue()
              case _ => throw new IllegalArgumentException(
                s"$fn: $what must be a non-NULL INT/LONG literal")
            }
          case other => throw new IllegalArgumentException(
            s"$fn: $what must be an INT/LONG literal, got $other")
        }
        graft.sources.GraftLake.readChanges(SparkSession.active,
          litStr(es.head, "the table path"),
          litLong(es(1), "fromVersion"), litLong(es(2), "toVersion"))
          .queryExecution.analyzed
      }),
    // CALL-style MAINTENANCE from pure SQL — the write twins of
    // graft_lake/graft_lake_changes, each running its dispatcher
    // ([[graft.sources.GraftLake]] compact/expire/reclaim, format
    // detected from the layout, wrong-axis refusals preserved) and
    // returning the op's result as rows:
    //   SELECT * FROM graft_lake_compact('/path'[, numFiles])
    //     → one row (version STRING — the format's own axis);
    //   SELECT * FROM graft_lake_expire('/path'[, keepLast
    //     [, dropChangelogs]]) → one row per expired snapshot id;
    //   SELECT * FROM graft_lake_reclaim('/path')
    //     → one row per deleted file path.
    // The op runs when the query is ANALYZED (CALL semantics — the
    // statement IS the action), with literal-only arguments so the
    // entry point stays bounded.
    ("graft_lake_compact",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake_compact"),
      (es: Seq[Expression]) => {
        val fn = "graft_lake_compact"
        require(es.size == 1 || es.size == 2,
          s"$fn(path[, numFiles]) takes 1-2 arguments, got ${es.size}")
        val spark = SparkSession.active
        val n = if (es.size < 2) 1
          else maintLitLong(fn, es(1), "numFiles").toInt
        val v = graft.sources.GraftLake.compact(spark,
          maintLitStr(fn, es.head, "the table path"), n)
        import spark.implicits._
        Seq(v).toDF("version").queryExecution.analyzed
      }),
    ("graft_lake_expire",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake_expire"),
      (es: Seq[Expression]) => {
        val fn = "graft_lake_expire"
        require(es.size >= 1 && es.size <= 3,
          s"$fn(path[, keepLast[, dropChangelogs]]) takes 1-3 " +
            s"arguments, got ${es.size}")
        val spark = SparkSession.active
        val keep = if (es.size < 2) 1
          else maintLitLong(fn, es(1), "keepLast").toInt
        val drop = es.size >= 3 && maintLitBool(fn, es(2),
          "dropChangelogs")
        val ids = graft.sources.GraftLake.expire(spark,
          maintLitStr(fn, es.head, "the table path"), keep, drop)
        import spark.implicits._
        ids.toDF("expired_snapshot_id").queryExecution.analyzed
      }),
    ("graft_lake_reclaim",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake_reclaim"),
      (es: Seq[Expression]) => {
        val fn = "graft_lake_reclaim"
        require(es.size == 1,
          s"$fn(path) takes 1 argument, got ${es.size}")
        val spark = SparkSession.active
        val deleted = graft.sources.GraftLake.reclaim(spark,
          maintLitStr(fn, es.head, "the table path"))
        import spark.implicits._
        deleted.toDF("deleted_path").queryExecution.analyzed
      }),
    // row-level DML from pure SQL — the delete twin of the
    // maintenance TVFs: the predicate arrives as a SQL string
    // (literal-only arguments keep the entry point bounded), parses
    // through the session's own expression parser, and runs the
    // format-dispatched delete; returns the new version marker.
    //   SELECT * FROM graft_lake_delete('/path', 'id % 2 = 1')
    ("graft_lake_delete",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake_delete"),
      (es: Seq[Expression]) => {
        val fn = "graft_lake_delete"
        require(es.size == 2,
          s"$fn(path, predicateSql) takes 2 arguments, got ${es.size}")
        val spark = SparkSession.active
        val v = graft.sources.GraftLake.delete(spark,
          maintLitStr(fn, es.head, "the table path"),
          org.apache.spark.sql.functions.expr(
            maintLitStr(fn, es(1), "the predicate SQL")))
        import spark.implicits._
        Seq(v).toDF("version").queryExecution.analyzed
      }),
    //   SELECT * FROM graft_lake_update('/p', 'id = 3', 'v', 'v + 1')
    // — the update twin: one SET column per call (the literal-only
    // TVF surface can't carry a map; chain calls for multi-column
    // SETs), both predicate and SET expression parsed through the
    // session parser.
    ("graft_lake_update",
      new ExpressionInfo(graft.sources.GraftLake.getClass.getName,
        "graft_lake_update"),
      (es: Seq[Expression]) => {
        val fn = "graft_lake_update"
        require(es.size == 4,
          s"$fn(path, predicateSql, setColumn, setExprSql) takes 4 " +
            s"arguments, got ${es.size}")
        val spark = SparkSession.active
        val v = graft.sources.GraftLake.update(spark,
          maintLitStr(fn, es.head, "the table path"),
          org.apache.spark.sql.functions.expr(
            maintLitStr(fn, es(1), "the predicate SQL")),
          Map(maintLitStr(fn, es(2), "the SET column") ->
            org.apache.spark.sql.functions.expr(
              maintLitStr(fn, es(3), "the SET expression SQL"))))
        import spark.implicits._
        Seq(v).toDF("version").queryExecution.analyzed
      }))

  private def maintLitStr(fn: String, e: Expression,
                          what: String): String = e match {
    case l if l.foldable &&
      l.dataType == org.apache.spark.sql.types.StringType =>
      l.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case _ => throw new IllegalArgumentException(
          s"$fn: $what must be a non-NULL STRING literal")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a STRING literal, got $other")
  }

  private def maintLitLong(fn: String, e: Expression,
                           what: String): Long = e match {
    case l if l.foldable && (l.dataType ==
      org.apache.spark.sql.types.LongType || l.dataType ==
      org.apache.spark.sql.types.IntegerType) =>
      l.eval() match {
        case n: java.lang.Number => n.longValue()
        case _ => throw new IllegalArgumentException(
          s"$fn: $what must be a non-NULL INT/LONG literal")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an INT/LONG literal, got $other")
  }

  private def maintLitBool(fn: String, e: Expression,
                           what: String): Boolean = e match {
    case l if l.foldable &&
      l.dataType == org.apache.spark.sql.types.BooleanType =>
      l.eval() match {
        case b: java.lang.Boolean => b.booleanValue()
        case _ => throw new IllegalArgumentException(
          s"$fn: $what must be a non-NULL BOOLEAN literal")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a BOOLEAN literal, got $other")
  }

  /** Imperative registration on an existing session (used by the query
    * modules so the driver-created sessions get the SQL functions too).
    * `getOrCreate()` ignores withExtensions once a session exists, so
    * this is the reliable path for driver-owned sessions. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    tableFunctions.foreach { case (name, _, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(
        graft.plans.GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GraftStrategies
  }
}
