package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier B′ — batch event analytics over the `events` table: the
  * product-analytics trio (outlier detection, cohort retention, funnel
  * conversion) every event warehouse runs daily. The streaming twins
  * of this table live in StreamingOps; these are the batch/backfill
  * shapes.
  *
  * Scale stance: nothing here windows over the corpus. q_anomaly's
  * stats table is one row per event type (broadcast back over the
  * scoring scan); q_retention is two user-keyed hash aggregates and
  * one user-keyed equi-join (AQE handles a hot user); q_event_funnel
  * folds to one row per user, then one global row, before the 3-row
  * unpivot. All determinism-sensitive moments run in DECIMAL sums
  * (the q_profile stance) so partial-aggregation order cannot perturb
  * the fold.
  */
object EventOps {

  private def r6(x: Column): Column = round(x * lit(1000000.0)) / lit(1000000.0)

  val all: Seq[Query] = Seq(
    // Per-group z-score outlier detection: |value − μ| > 3σ within the
    // event type. μ/σ fold from DECIMAL(38,6) sums (order-independent,
    // engine-identical); the z expression is then the same IEEE ops in
    // the same order on both engines, so the strict >3 cut and the
    // 6-dp rounding agree exactly. Two scans: a tiny per-type stats
    // aggregate (≤|types| rows, broadcast), then a narrow scoring
    // filter — no corpus-wide window, no driver collect.
    Query(
      "q_anomaly",
      Some("""WITH s AS (
                SELECT event_type, CAST(count(*) AS DOUBLE) n,
                       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) s1,
                       CAST(sum(CAST(value*value AS DECIMAL(38,6)))
                         AS DOUBLE) s2
                FROM events GROUP BY 1)
              SELECT event_id, event_type, value,
                     round((value - s1/n)
                           / sqrt((s2 - s1*s1/n)/(n-1))
                           * 1000000.0)/1000000.0 AS z
              FROM events JOIN s USING (event_type)
              WHERE abs((value - s1/n) / sqrt((s2 - s1*s1/n)/(n-1))) > 3.0
              ORDER BY event_id"""),
      (s, d) => {
        val dec = DecimalType(38, 6)
        val ev = Tables.events(s, d)
        val stats = ev.groupBy("event_type")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("value").cast(dec)).cast("double").as("s1"),
            sum((col("value") * col("value")).cast(dec)).cast("double")
              .as("s2"))
        val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
        val z = (col("value") - s1 / n) /
          sqrt((s2 - s1 * s1 / n) / (n - lit(1)))
        ev.join(broadcast(stats), "event_type")
          .filter(abs(z) > 3.0)
          .select(col("event_id"), col("event_type"), col("value"),
            r6(z).as("z"))
          .orderBy("event_id")
      }),
    // Cohort retention: users grouped by first-seen day, counted on
    // each later active day (the day-offset triangle behind every
    // retention curve). First-seen and distinct-active-days are both
    // user-keyed hash aggregates; the join back is a user-keyed
    // equi-join; the final aggregate is days × offsets rows — tiny at
    // any corpus size. Day boundaries are UTC on both engines
    // (Tables.events pins the UTC session).
    Query(
      "q_retention",
      Some("""WITH f AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                FROM events GROUP BY 1),
              a AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events)
              SELECT cohort_day, CAST(day - cohort_day AS BIGINT)
                       AS day_offset,
                     count(*) AS users
              FROM a JOIN f USING (user_id)
              GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""),
      (s, d) => {
        val ev = Tables.events(s, d)
        val first = ev.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("cohort_day"))
        val active = ev
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        active.join(first, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).cast("bigint")
              .as("day_offset"))
          .agg(count(lit(1)).as("users"))
          .orderBy("cohort_day", "day_offset")
      }),
    // Ordered funnel conversion: of the users who viewed, how many
    // later clicked, and of those how many later purchased (strict
    // timestamp ordering between stage minima — the standard
    // first-touch funnel). One conditional-min aggregate per user,
    // then a single global fold unpivoted to the 3 stage rows via
    // stack — the global aggregate sees one row per user,
    // map-side-combined, never the raw events.
    Query(
      "q_event_funnel",
      Some("""WITH m AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
                       min(CASE WHEN event_type = 'purchase' THEN ts END)
                         AS t3
                FROM events GROUP BY 1)
              SELECT CAST(1 AS INT) AS stage_idx, 'view' AS stage,
                     count(*) AS users
              FROM m WHERE t1 IS NOT NULL
              UNION ALL
              SELECT CAST(2 AS INT), 'view_click', count(*)
              FROM m WHERE t1 IS NOT NULL AND t2 > t1
              UNION ALL
              SELECT CAST(3 AS INT), 'view_click_purchase', count(*)
              FROM m WHERE t1 IS NOT NULL AND t2 > t1 AND t3 > t2
              ORDER BY stage_idx"""),
      (s, d) => {
        val m = Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t1"),
            min(when(col("event_type") === "click", col("ts"))).as("t2"),
            min(when(col("event_type") === "purchase", col("ts"))).as("t3"))
        val s1 = col("t1").isNotNull
        val s2 = s1 && col("t2") > col("t1")
        val s3 = s2 && col("t3") > col("t2")
        m.agg(
            sum(when(s1, 1L).otherwise(0L)).as("c1"),
            sum(when(s2, 1L).otherwise(0L)).as("c2"),
            sum(when(s3, 1L).otherwise(0L)).as("c3"))
          .select(expr(
            "stack(3, 1, 'view', c1, 2, 'view_click', c2, " +
              "3, 'view_click_purchase', c3) AS (stage_idx, stage, users)"))
          .select(col("stage_idx").cast("int").as("stage_idx"),
            col("stage"), col("users"))
          .orderBy("stage_idx")
      })
  )
}
