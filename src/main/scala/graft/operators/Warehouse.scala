package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Warehouse-load operators: snapshot diff (CDC) and SCD Type-2 dimension
  * maintenance — the incremental-load machinery the reference's daily DAG
  * implies but implements as truncate-and-reload
  * (dags/projectde_dag.py:135-155 drops and re-inserts the retail table
  * every run). At warehouse scale a reload is a full rewrite of the
  * dimension; the diff/SCD2 pair turns the daily run into work
  * proportional to the CHANGED rows while keeping full history.
  *
  * Snapshot simulation: the driver fixture ships one `customer` table, so
  * the two load days are derived deterministically from it —
  *
  *  - t0 (loaded [[LoadDay0]]): every customer except `custkey % 13 == 5`
  *    (those onboard later);
  *  - t1 (loaded [[LoadDay1]]): every customer except `custkey % 11 == 4`
  *    (those churn), with two planted attribute drifts: `% 10 == 3` gets
  *    a balance credit of 100.00 and `% 10 == 7` migrates market segment.
  *
  * Both engines regenerate the snapshots from the same arithmetic, so the
  * diff/SCD2 logic — not the simulation — is what the oracle checks.
  *
  * Determinism: change detection compares an md5 row fingerprint over the
  * non-key attributes with money held in exact cents (`round(bal*100)` as
  * long — the a2_group_sum convention), so the comparison is bit-identical
  * cross-engine and never trusts double equality.
  *
  * Scale shape: snapshot derivation is map-side expression work; the only
  * shuffle is ONE full-outer equi-join of the two snapshots on the
  * business key (AQE sizes the sides — neither is broadcast by hint, a
  * 100 TB dimension exceeds any broadcast budget). Output is O(|keys|)
  * for the SCD2 table and O(|changed|) for the diff; at a real warehouse
  * the t0 side is the current SCD2 table filtered to `is_current`, which
  * is exactly the shape [[whScd2]] emits, so the operator composes with
  * itself day over day.
  */
object Warehouse {

  private[operators] val LoadDay0 = "2024-01-01"
  private[operators] val LoadDay1 = "2024-02-01"

  /** t0/t1 snapshot pair with per-row fingerprints, shared by both ops. */
  private[operators] def snapshots(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
        col("c_mktsegment"))
    // concat (not concat_ws): a NULL attribute must NULL the fingerprint
    // in BOTH engines (DuckDB's || is NULL-propagating; concat_ws would
    // silently skip the part and collide distinct rows — the r12-advice
    // composite-key lesson applied here from the start)
    def fp(df: DataFrame): DataFrame = df.withColumn("fp",
      md5(concat(col("c_name"), lit("|"),
        col("c_nationkey").cast("string"), lit("|"),
        col("bal_cents").cast("string"), lit("|"), col("c_mktsegment"))))
    val t0 = fp(base.filter(col("c_custkey") % 13 =!= 5))
    val t1 = fp(base.filter(col("c_custkey") % 11 =!= 4)
      .withColumn("bal_cents",
        when(col("c_custkey") % 10 === 3, col("bal_cents") + 10000L)
          .otherwise(col("bal_cents")))
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 10 === 7, lit("MIGRATED"))
          .otherwise(col("c_mktsegment"))))
    (t0, t1)
  }

  /** WH1 — CDC snapshot diff: classify every business key across two
    * consecutive dimension snapshots as added / removed / changed (rows
    * whose fingerprints match are unchanged and are NOT emitted — the
    * delta stream a downstream incremental loader consumes is the point
    * of CDC, and it is orders smaller than either snapshot).
    */
  def whSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val (t0, t1) = snapshots(spark, dir)
    t0.select(col("c_custkey"), col("fp").as("old_fp"))
      .join(t1.select(col("c_custkey"), col("fp").as("new_fp")),
        Seq("c_custkey"), "full_outer")
      .withColumn("change_type",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(col("c_custkey"), col("change_type"), col("old_fp"),
        col("new_fp"))
  }

  /** WH2 — SCD Type-2 dimension build: merge the t1 snapshot into the
    * t0-loaded dimension, closing changed/removed versions at
    * [[LoadDay1]] and opening new versions for changed/added keys. Every
    * key's history is reconstructable: `valid_from <= d < valid_to`
    * (open versions have NULL valid_to and `is_current = true`).
    *
    * Versions are deterministic (1 = t0 row, 2 = t1 row of a changed
    * key; an added key's first version is 1 at [[LoadDay1]]), so the
    * output is a pure function of the two snapshots.
    */
  def whScd2(spark: SparkSession, dir: String): DataFrame = {
    val (t0, t1) = snapshots(spark, dir)
    val joined = t0.select(col("c_custkey"), col("fp").as("old_fp"),
        col("c_name").as("n0"), col("c_nationkey").as("k0"),
        col("bal_cents").as("b0"), col("c_mktsegment").as("m0"))
      .join(t1.select(col("c_custkey"), col("fp").as("new_fp"),
        col("c_name").as("n1"), col("c_nationkey").as("k1"),
        col("bal_cents").as("b1"), col("c_mktsegment").as("m1")),
        Seq("c_custkey"), "full_outer")
      .localCheckpoint() // two version branches read it; one join, not two
    val d0 = to_date(lit(LoadDay0))
    val d1 = to_date(lit(LoadDay1))
    // version-1 rows: every key present at t0 (closed when changed or
    // removed at t1), plus keys added at t1 (their v1 opens at d1)
    val v1 = joined.filter(col("old_fp").isNotNull)
      .select(col("c_custkey"), lit(1).as("version"),
        col("n0").as("c_name"), col("k0").as("c_nationkey"),
        col("b0").as("bal_cents"), col("m0").as("c_mktsegment"),
        d0.as("valid_from"),
        when(col("new_fp").isNull || col("new_fp") =!= col("old_fp"), d1)
          .as("valid_to"))
    val v1New = joined.filter(col("old_fp").isNull)
      .select(col("c_custkey"), lit(1).as("version"),
        col("n1").as("c_name"), col("k1").as("c_nationkey"),
        col("b1").as("bal_cents"), col("m1").as("c_mktsegment"),
        d1.as("valid_from"), lit(null).cast("date").as("valid_to"))
    // version-2 rows: changed keys re-open with the t1 attributes
    val v2 = joined.filter(col("old_fp").isNotNull && col("new_fp").isNotNull
        && col("old_fp") =!= col("new_fp"))
      .select(col("c_custkey"), lit(2).as("version"),
        col("n1").as("c_name"), col("k1").as("c_nationkey"),
        col("b1").as("bal_cents"), col("m1").as("c_mktsegment"),
        d1.as("valid_from"), lit(null).cast("date").as("valid_to"))
    v1.unionAll(v1New).unionAll(v2)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** WH3 — snapshot profile drift: per-column statistical profile (row
    * count, nulls, exact distinct count) of BOTH snapshots side by side
    * with the deltas — the structural-drift monitor a nightly load runs
    * before trusting an upstream extract (a column whose distinct count
    * halves overnight is a silently-broken join upstream, caught here
    * before [[whScd2]] writes history). Complements `dq_drift` (PSI on
    * VALUE distributions) with schema-level profile drift.
    *
    * Scale shape: ONE pass per snapshot — every per-column metric is an
    * aggregate of the same scan (the dqProfile skeleton: Expand +
    * partial aggregation, never one job per column), output is
    * |columns| rows joined on the column name. At 100 TB the exact
    * distincts swap to approx_count_distinct (the dq_uniqueness
    * convention, documented there).
    */
  def whProfileDrift(spark: SparkSession, dir: String): DataFrame = {
    val (t0, t1) = snapshots(spark, dir)
    val cols = Seq("c_name", "c_nationkey", "bal_cents", "c_mktsegment")
    def profile(df: DataFrame, tag: String): DataFrame = {
      val aggs = count(lit(1)).as(s"n_$tag") +: cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
          countDistinct(col(c)).as(s"dist_$c"))
      }
      val stack = cols.map(c => s"'$c', nulls_$c, dist_$c").mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"n_$tag",
          s"stack(${cols.length}, $stack) AS " +
            s"(col_name, nulls_$tag, ndv_$tag)")
    }
    profile(t0, "t0").join(profile(t1, "t1"), "col_name")
      .select(col("col_name"), col("n_t0"), col("n_t1"),
        col("nulls_t0"), col("nulls_t1"), col("ndv_t0"), col("ndv_t1"),
        (col("ndv_t1") - col("ndv_t0")).as("ndv_delta"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wh_snapshot_diff" -> (whSnapshotDiff _),
    "wh_scd2" -> (whScd2 _),
    "wh_profile_drift" -> (whProfileDrift _),
  )

  /** Snapshot CTEs shared by both oracles — the same arithmetic the
    * engine's simulation applies, ending in t0/t1 with fingerprints. */
  private val snapshotsCte = """
    base AS (SELECT c_custkey, c_name, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
               c_mktsegment
             FROM customer),
    t0 AS (SELECT *, md5(c_name || '|' || CAST(c_nationkey AS VARCHAR)
             || '|' || CAST(bal_cents AS VARCHAR) || '|' || c_mktsegment)
             AS fp
           FROM base WHERE c_custkey % 13 <> 5),
    t1m AS (SELECT c_custkey, c_name, c_nationkey,
              CASE WHEN c_custkey % 10 = 3 THEN bal_cents + 10000
                   ELSE bal_cents END AS bal_cents,
              CASE WHEN c_custkey % 10 = 7 THEN 'MIGRATED'
                   ELSE c_mktsegment END AS c_mktsegment
            FROM base WHERE c_custkey % 11 <> 4),
    t1 AS (SELECT *, md5(c_name || '|' || CAST(c_nationkey AS VARCHAR)
             || '|' || CAST(bal_cents AS VARCHAR) || '|' || c_mktsegment)
             AS fp
           FROM t1m)"""

  val oracle: Map[String, String] = Map(
    "wh_snapshot_diff" -> s"""
      WITH $snapshotsCte
      SELECT coalesce(t0.c_custkey, t1.c_custkey) AS c_custkey,
        CASE WHEN t0.fp IS NULL THEN 'added'
             WHEN t1.fp IS NULL THEN 'removed'
             WHEN t0.fp <> t1.fp THEN 'changed' END AS change_type,
        t0.fp AS old_fp, t1.fp AS new_fp
      FROM t0 FULL OUTER JOIN t1 ON t0.c_custkey = t1.c_custkey
      WHERE t0.fp IS NULL OR t1.fp IS NULL OR t0.fp <> t1.fp""",
    "wh_profile_drift" -> s"""
      WITH $snapshotsCte,
      p0 AS (SELECT count(*) AS n,
               CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u1, count(DISTINCT c_name) AS d1,
               CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u2, count(DISTINCT c_nationkey) AS d2,
               CAST(sum(CASE WHEN bal_cents IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u3, count(DISTINCT bal_cents) AS d3,
               CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u4, count(DISTINCT c_mktsegment) AS d4
             FROM t0),
      p1 AS (SELECT count(*) AS n,
               CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u1, count(DISTINCT c_name) AS d1,
               CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u2, count(DISTINCT c_nationkey) AS d2,
               CAST(sum(CASE WHEN bal_cents IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u3, count(DISTINCT bal_cents) AS d3,
               CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS u4, count(DISTINCT c_mktsegment) AS d4
             FROM t1),
      l0 AS (SELECT 'c_name' AS col_name, n AS n_t0, u1 AS nulls_t0,
               d1 AS ndv_t0 FROM p0
             UNION ALL SELECT 'c_nationkey', n, u2, d2 FROM p0
             UNION ALL SELECT 'bal_cents', n, u3, d3 FROM p0
             UNION ALL SELECT 'c_mktsegment', n, u4, d4 FROM p0),
      l1 AS (SELECT 'c_name' AS col_name, n AS n_t1, u1 AS nulls_t1,
               d1 AS ndv_t1 FROM p1
             UNION ALL SELECT 'c_nationkey', n, u2, d2 FROM p1
             UNION ALL SELECT 'bal_cents', n, u3, d3 FROM p1
             UNION ALL SELECT 'c_mktsegment', n, u4, d4 FROM p1)
      SELECT l0.col_name, n_t0, n_t1, nulls_t0, nulls_t1, ndv_t0, ndv_t1,
        ndv_t1 - ndv_t0 AS ndv_delta
      FROM l0 JOIN l1 ON l0.col_name = l1.col_name""",
    "wh_scd2" -> s"""
      WITH $snapshotsCte,
      j AS (SELECT coalesce(t0.c_custkey, t1.c_custkey) AS c_custkey,
              t0.fp AS old_fp, t1.fp AS new_fp,
              t0.c_name AS n0, t0.c_nationkey AS k0,
              t0.bal_cents AS b0, t0.c_mktsegment AS m0,
              t1.c_name AS n1, t1.c_nationkey AS k1,
              t1.bal_cents AS b1, t1.c_mktsegment AS m1
            FROM t0 FULL OUTER JOIN t1 ON t0.c_custkey = t1.c_custkey),
      scd AS (
        SELECT c_custkey, 1 AS version, n0 AS c_name, k0 AS c_nationkey,
          b0 AS bal_cents, m0 AS c_mktsegment,
          DATE '${LoadDay0}' AS valid_from,
          CASE WHEN new_fp IS NULL OR new_fp <> old_fp
               THEN DATE '${LoadDay1}' END AS valid_to
        FROM j WHERE old_fp IS NOT NULL
        UNION ALL
        SELECT c_custkey, 1, n1, k1, b1, m1,
          DATE '${LoadDay1}', CAST(NULL AS DATE)
        FROM j WHERE old_fp IS NULL
        UNION ALL
        SELECT c_custkey, 2, n1, k1, b1, m1,
          DATE '${LoadDay1}', CAST(NULL AS DATE)
        FROM j WHERE old_fp IS NOT NULL AND new_fp IS NOT NULL
          AND old_fp <> new_fp)
      SELECT *, valid_to IS NULL AS is_current FROM scd""",
  )
}
