package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classic warehouse maintenance + product-analytics compositions — the
  * operations a reference user runs daily on top of the operator set:
  * MERGE-style upsert, SCD Type-2 history build, and funnel analysis.
  *
  * Scale design (100 TB):
  *  - q146: upsert = one full outer join on the key (both sides shuffle
  *    once) + per-key latest-wins resolution — no row-level mutation
  *    needed, the output IS the new table (the rewrite lakehouse
  *    formats do under MERGE INTO when a file has any hit).
  *  - q147: SCD2 intervals come from one window pass per user ordered
  *    by time (lead() closes each row's validity) — a single shuffle
  *    on the entity key, no self-join.
  *  - q148: funnel stage times are conditional MINs in ONE grouped
  *    aggregation over one scan — the naive N-self-joins formulation
  *    (one per stage) would shuffle the events table once per stage.
  */
object Warehouse extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MERGE INTO semantics (upsert) without row-level ops: current =
    // one deterministic per-user state (their EARLIEST event), staged
    // updates = each user's LATEST event; matched keys take the update,
    // unmatched keep current, update-only keys insert. Latest-wins
    // resolution + full outer join = the whole MERGE matrix.
    "q146_merge_upsert" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val wFirst = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wLast = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val current = ev.withColumn("rn", row_number().over(wFirst))
        .filter(col("rn") === 1 && col("user_id") % 3 =!= 0) // some keys absent
        .select(col("user_id").as("c_user"), col("event_id").as("c_event"),
          col("event_type").as("c_type"))
      val updates = ev.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1 && col("user_id") % 3 =!= 1) // some keys absent
        .select(col("user_id").as("u_user"), col("event_id").as("u_event"),
          col("event_type").as("u_type"))
      current.join(updates, col("c_user") === col("u_user"), "full_outer")
        .select(coalesce(col("c_user"), col("u_user")).as("user_id"),
          coalesce(col("u_event"), col("c_event")).as("event_id"),
          coalesce(col("u_type"), col("c_type")).as("event_type"),
          when(col("c_user").isNull, "insert")
            .when(col("u_user").isNull, "keep")
            .otherwise("update").as("action"))
        .orderBy(col("user_id"))
    },

    // SCD Type 2: each signup/purchase event opens a per-user state
    // version; lead() over the user's timeline closes it. Emits the
    // full validity-interval history (valid_to NULL = current row) —
    // the dimension-history table every warehouse maintains.
    "q147_scd2_history" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.df(s, dir, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("event_id"),
          col("event_type").as("state"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("version", row_number().over(w).cast(LongType))
        .withColumn("valid_from", col("ts_us"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("version"), col("state"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("version"))
    },

    // SCD2 point-in-time lookup — THE temporal-warehouse join: every
    // event resolves the dimension state that was valid AT ITS
    // TIMESTAMP (valid_from <= ts < valid_to, open-ended current row),
    // events before the first state land in 'none'. The interval
    // predicate rides INSIDE the user_id equi hash join (per-user
    // history is small, so the containment check is a bounded local
    // scan — never a BNLJ). Census by resolved state.
    "q282_scd2_lookup" -> { (s, dir) =>
      val w = Window.partitionBy(col("h_user"))
        .orderBy(col("valid_from"), col("h_eid"))
      val hist = Tables.df(s, dir, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id").as("h_user"),
          col("event_id").as("h_eid"),
          col("event_type").as("state"),
          unix_micros(col("ts")).as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      val ev = Tables.df(s, dir, "events")
        .select(col("user_id").as("e_user"), col("event_id"),
          unix_micros(col("ts")).as("e_ts"))
      ev.join(hist,
          col("e_user") === col("h_user") &&
            col("e_ts") >= col("valid_from") &&
            (col("valid_to").isNull || col("e_ts") < col("valid_to")),
          "left")
        .groupBy(coalesce(col("state"), lit("none"))
          .as("state_at_event"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("e_user")).as("n_users"))
        .orderBy(col("state_at_event"))
    },

    // SCD2 invariant validator — the dimension-health check a warehouse
    // runs after every q147-style rebuild: exactly ONE current row per
    // key, and validity intervals CONTIGUOUS (next valid_from == this
    // valid_to; no gaps, no overlaps). One summary row; the per-key
    // censuses partial-aggregate map-side so the validator costs one
    // pass over the history at any scale.
    "q251_scd2_validator" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val hist = Tables.df(s, dir, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("version", row_number().over(w).cast(LongType))
        .withColumn("valid_from", col("ts_us"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
      val perKey = hist.groupBy(col("user_id"))
        .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"),
          count(lit(1)).as("nr"))
        .agg(count(lit(1)).as("n_keys"), sum(col("nr")).as("n_rows"),
          sum(when(col("n_cur") =!= 1, 1).otherwise(0))
            .as("n_bad_current"))
      val contig = hist
        .withColumn("prev_to",
          lag(col("valid_to"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("version"))))
        .filter(col("prev_to").isNotNull)
        .agg(coalesce(sum(when(col("prev_to") =!= col("valid_from"), 1)
          .otherwise(0)), lit(0L)).as("n_contig_viol"))
      perKey.crossJoin(contig)
        .select(col("n_keys"), col("n_rows"), col("n_bad_current"),
          col("n_contig_viol"),
          (col("n_bad_current") === 0 && col("n_contig_viol") === 0)
            .as("all_pass"))
    },

    // Funnel analysis: per user, the first time each stage of
    // view → click → purchase was reached IN ORDER (a later stage
    // counts only after the previous one), then the corpus-level funnel
    // drop-off. Conditional MINs in one aggregation — not one
    // self-join per stage.
    "q148_funnel" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts_us")))
          .as("t_view"))
        .join(ev.select(col("user_id"), col("event_type"), col("ts_us")),
          "user_id")
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(when(col("event_type") === "click" &&
          col("ts_us") >= col("t_view"), col("ts_us"))).as("t_click"))
        .join(ev.select(col("user_id"), col("event_type"), col("ts_us")),
          "user_id")
        .groupBy(col("user_id"), col("t_view"), col("t_click"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts_us") >= col("t_click"), col("ts_us"))).as("t_purchase"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_click").isNotNull, 1L).otherwise(0L)).as("n_click"),
        sum(when(col("t_purchase").isNotNull, 1L).otherwise(0L))
          .as("n_purchase"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q146_merge_upsert" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |cur AS (
        |  SELECT user_id AS c_user, event_id AS c_event,
        |    event_type AS c_type FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS rn FROM ev)
        |  WHERE rn = 1 AND c_user % 3 != 0),
        |upd AS (
        |  SELECT user_id AS u_user, event_id AS u_event,
        |    event_type AS u_type FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev)
        |  WHERE rn = 1 AND u_user % 3 != 1)
        |SELECT coalesce(c_user, u_user) AS user_id,
        |  coalesce(u_event, c_event) AS event_id,
        |  coalesce(u_type, c_type) AS event_type,
        |  CASE WHEN c_user IS NULL THEN 'insert'
        |       WHEN u_user IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM cur FULL OUTER JOIN upd ON c_user = u_user
        |ORDER BY user_id""".stripMargin,
    "q282_scd2_lookup" ->
      """WITH hist AS (
        |  SELECT user_id AS h_user, event_type AS state,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |      (PARTITION BY user_id
        |       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |      AS valid_to
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |ev AS (
        |  SELECT user_id AS e_user, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS e_ts FROM events)
        |SELECT coalesce(state, 'none') AS state_at_event,
        |  count(*) AS n_events,
        |  CAST(count(DISTINCT e_user) AS BIGINT) AS n_users
        |FROM ev LEFT JOIN hist ON e_user = h_user
        |  AND e_ts >= valid_from
        |  AND (valid_to IS NULL OR e_ts < valid_to)
        |GROUP BY 1 ORDER BY state_at_event""".stripMargin,
    "q251_scd2_validator" ->
      """WITH hist AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS valid_to,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |      AS is_current,
        |    row_number() OVER w AS version
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)),
        |per_key AS (
        |  SELECT count(*) AS n_keys,
        |    CAST(sum(nr) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN n_cur != 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bad_current
        |  FROM (SELECT user_id,
        |          sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS n_cur,
        |          count(*) AS nr
        |        FROM hist GROUP BY user_id)),
        |contig AS (
        |  SELECT CAST(coalesce(sum(CASE WHEN prev_to != valid_from
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_contig_viol
        |  FROM (SELECT valid_from,
        |          lag(valid_to) OVER (PARTITION BY user_id
        |            ORDER BY version) AS prev_to
        |        FROM hist)
        |  WHERE prev_to IS NOT NULL)
        |SELECT n_keys, n_rows, n_bad_current, n_contig_viol,
        |  n_bad_current = 0 AND n_contig_viol = 0 AS all_pass
        |FROM per_key, contig""".stripMargin,
    "q147_scd2_history" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type AS state,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from,
        |  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS valid_to,
        |  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |    AS is_current
        |FROM events WHERE event_type IN ('signup', 'purchase')
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q148_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |v AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'view' THEN ts_us END)
        |          AS t_view FROM ev GROUP BY user_id),
        |c AS (SELECT e.user_id, v.t_view,
        |        min(CASE WHEN e.event_type = 'click'
        |          AND e.ts_us >= v.t_view THEN e.ts_us END) AS t_click
        |      FROM v JOIN ev e USING (user_id)
        |      GROUP BY e.user_id, v.t_view),
        |p AS (SELECT e.user_id, c.t_view, c.t_click,
        |        min(CASE WHEN e.event_type = 'purchase'
        |          AND e.ts_us >= c.t_click THEN e.ts_us END) AS t_purchase
        |      FROM c JOIN ev e USING (user_id)
        |      GROUP BY e.user_id, c.t_view, c.t_click)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase
        |FROM p""".stripMargin
  )
}
