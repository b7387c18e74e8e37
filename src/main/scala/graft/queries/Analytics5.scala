package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifth analytics module: statistical-inference operators — the
  * deterministic bootstrap (resampling without randomness), a Benford
  * first-digit audit (the fraud/data-entry anomaly screen), and
  * Kaplan–Meier survival with right-censoring (time-to-event analytics).
  *
  * Determinism conventions as everywhere else: resample weights and
  * digit censuses are exact integers from salted md5 bytes, weighted
  * sums ride DECIMAL, and the one genuinely multiplicative estimator
  * (KM's survival product) runs as exp(Σ ln(·)) over an ORDERED window
  * so both engines accumulate in the same sequence.
  */
object Analytics5 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic Poisson bootstrap CI for the mean order price —
    // the estimator a pipeline publishes WITH its error bars. Each of
    // B=20 resamples assigns every row an integer weight from a salted
    // md5 byte, mapped to {0,1,2,3} with Poisson(1)-approximating mass
    // (.368/.368/.184/.08) — the production-standard streaming
    // bootstrap, made reproducible: no RNG, so both engines draw the
    // IDENTICAL resamples. Per-resample means are exact-decimal
    // weighted sums; the CI is percentile_disc over the 20 means. The
    // explode is a bounded ×B blowup of ONE column, partial-aggregated
    // map-side.
    "q342_bootstrap_ci" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
      val resampled = o
        .select(col("k"), col("x"),
          explode(sequence(lit(1), lit(20))).as("r"))
        .withColumn("b",
          conv(substring(md5(concat(lit("boot"), col("r"),
            lit("_"), col("k").cast(StringType))), 1, 2), 16, 10)
            .cast(LongType))
        .withColumn("w",
          when(col("b") < 94, 0L).when(col("b") < 188, 1L)
            .when(col("b") < 235, 2L).otherwise(3L))
      val means = resampled.groupBy(col("r"))
        .agg((sum(col("x") * col("w")).cast(DoubleType) /
          sum(col("w"))).as("mean_r"))
      val base = o.agg(count(lit(1)).as("n"),
        (sum(col("x")).cast(DoubleType) / count(lit(1))).as("mean"))
      means.agg(
          expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY mean_r)")
            .as("ci_lo"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY mean_r)")
            .as("ci_hi"))
        .crossJoin(broadcast(base))
        .select(col("n"), round(col("mean"), 2).as("mean"),
          round(col("ci_lo"), 2).as("ci_lo"),
          round(col("ci_hi"), 2).as("ci_hi"))
    },

    // Benford first-digit audit — the data-entry / fabrication screen
    // auditors run on money columns: observed leading-digit counts vs
    // the Benford expectation n·log10(1+1/d), with per-digit χ²
    // contributions. (TPC-ish uniform prices FAIL Benford loudly —
    // which is the point: the audit flags distributions that don't
    // arise from natural multiplicative processes.) Digit extraction
    // is string-based (no float log edge cases); counts exact.
    "q343_benford_audit" -> { (s, dir) =>
      val digits = Tables.df(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast(LongType)
          .cast(StringType), 1, 1).cast(IntegerType).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
      val tot = digits.agg(sum(col("n_obs")).as("n"))
      digits.crossJoin(broadcast(tot))
        .withColumn("exp_n",
          col("n") * log(10.0, lit(1.0) + lit(1.0) / col("d")))
        .select(col("d"), col("n_obs"), round(col("exp_n"), 2)
            .as("exp_n"),
          round(pow(col("n_obs") - col("exp_n"), 2) / col("exp_n"), 4)
            .as("chi2_part"))
        .orderBy(col("d"))
    },

    // Kaplan–Meier survival with RIGHT-CENSORING — time-to-event
    // analytics (here: days from first signup to first purchase;
    // users who never purchase are censored at end-of-data, NOT
    // dropped — dropping them is the classic bias KM exists to fix).
    // The survival product Π(1 − dₜ/nₜ) runs as exp of an ordered
    // window sum of logs, so both engines accumulate in the same
    // sequence; risk sets come from cumulative censuses over the
    // O(distinct days) table, and the curve is reported for the
    // first 30 days.
    "q344_kaplan_meier" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.df(s, dir, "events")
      val horizon = ev.agg(max(col("ts")).as("maxts"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(col("ts") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      val per = su.join(pu, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("tp").isNotNull,
            datediff(col("tp").cast(DateType), col("t0").cast(DateType)))
            .otherwise(datediff(col("maxts").cast(DateType),
              col("t0").cast(DateType))).cast(LongType).as("t"),
          col("tp").isNotNull.as("event"))
      val days = per.groupBy(col("t"))
        .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("leaving"))
      val nTot = per.agg(count(lit(1)).as("n_users"))
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      days.crossJoin(broadcast(nTot))
        .withColumn("left_before",
          coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
        .withColumn("n_risk", col("n_users") - col("left_before"))
        // d == n_risk (everyone remaining has the event) makes the KM
        // factor 0 — an absorbing state, handled as an explicit flag
        // instead of ln(0) (Spark nulls it, DuckDB errors).
        .withColumn("lt", when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast(DoubleType) / col("n_risk"))))
        .withColumn("zf", max(when(col("d") === col("n_risk"), 1L)
          .otherwise(0L)).over(wCum))
        .withColumn("surv", when(col("zf") === 1, lit(0.0))
          .otherwise(exp(sum(col("lt")).over(wCum))))
        .filter(col("d") > 0 && col("t") <= 30)
        .select(col("t"), col("n_risk"), col("d"),
          round(col("surv"), 6).as("survival"))
        .orderBy(col("t"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q342_bootstrap_ci" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x
        |  FROM orders),
        |re AS (
        |  SELECT r, x,
        |    CASE WHEN b < 94 THEN 0 WHEN b < 188 THEN 1
        |      WHEN b < 235 THEN 2 ELSE 3 END AS w
        |  FROM (
        |    SELECT x, r,
        |      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
        |      (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS b
        |    FROM (
        |      SELECT x, r, md5('boot' || CAST(r AS VARCHAR) || '_'
        |        || CAST(k AS VARCHAR)) AS h
        |      FROM o, unnest(generate_series(1, 20)) AS t(r)))),
        |means AS (
        |  SELECT r, CAST(sum(x * w) AS DOUBLE) / sum(w) AS mean_r
        |  FROM re GROUP BY 1),
        |base AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) / count(*) AS mean FROM o)
        |SELECT n, round(mean, 2) AS mean,
        |  round(quantile_disc(mean_r, 0.05), 2) AS ci_lo,
        |  round(quantile_disc(mean_r, 0.95), 2) AS ci_hi
        |FROM means, base GROUP BY n, mean""".stripMargin,
    "q343_benford_audit" ->
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS d,
        |    count(*) AS n_obs
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT sum(n_obs) AS n FROM digits)
        |SELECT d, n_obs,
        |  round(n * log10(1.0 + 1.0 / d), 2) AS exp_n,
        |  round(pow(n_obs - n * log10(1.0 + 1.0 / d), 2)
        |    / (n * log10(1.0 + 1.0 / d)), 4) AS chi2_part
        |FROM digits, tot ORDER BY d""".stripMargin,
    "q344_kaplan_meier" ->
      """WITH horizon AS (SELECT max(ts) AS maxts FROM events),
        |su AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(ts) AS tp FROM events e
        |  JOIN su ON e.user_id = su.user_id
        |  WHERE event_type = 'purchase' AND ts > t0 GROUP BY 1),
        |per AS (
        |  SELECT su.user_id,
        |    CASE WHEN tp IS NOT NULL
        |      THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
        |      ELSE date_diff('day', CAST(t0 AS DATE),
        |        CAST(maxts AS DATE)) END AS t,
        |    (tp IS NOT NULL) AS event
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id, horizon),
        |days AS (
        |  SELECT t, sum(CASE WHEN event THEN 1 ELSE 0 END) AS d,
        |    count(*) AS leaving
        |  FROM per GROUP BY 1),
        |n AS (SELECT count(*) AS n_users FROM per),
        |risk AS (
        |  SELECT t, d,
        |    n_users - coalesce(sum(leaving) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM days, n),
        |curve AS (
        |  SELECT t, d, n_risk,
        |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) = 1 THEN 0.0
        |      ELSE exp(sum(CASE WHEN d < n_risk
        |          THEN ln(1.0 - d::DOUBLE / n_risk) END)
        |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW)) END AS surv
        |  FROM risk)
        |SELECT t, n_risk, d, round(surv, 6) AS survival
        |FROM curve WHERE d > 0 AND t <= 30
        |ORDER BY t""".stripMargin
  )
}
