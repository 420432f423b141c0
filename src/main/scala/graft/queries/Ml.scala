package graft.queries

import org.apache.spark.sql.SparkSession

import graft.{QueryDef, QueryGroup, Tables}

/** presto-ml relational surface: learn_regressor/regress,
  * learn_classifier/classify, evaluate_classifier_predictions
  * (MLFunctions.java, Learn*Aggregation.java — implementations in
  * functions/MlFunctions.scala; the learn step here is a mergeable
  * distributed aggregate, unlike the reference's buffer-all-rows libsvm
  * train).
  *
  * Oracle strategy: the models themselves are closed-form — OLS normal
  * equations and per-class centroids — so DuckDB can recompute the SAME
  * model from SQL (regr_slope/regr_intercept for 1 feature, Cramer's
  * rule for 2, AVG per class for centroids) and the comparison checks
  * real predicted values, not just invariants.
  */
object Ml extends QueryGroup {

  private def sql(q: String)(s: SparkSession, dir: String) = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  /** DuckDB rebuild of EvalPredsBuffer.summary over a (truth, pred)
    * varchar relation `pSql`. Shared by every evaluate oracle so the
    * exact format string lives in ONE place next to its Scala twin.
    * Rounding note: DuckDB's printf('%.2f') rounds half-to-even while
    * Java's %.2f rounds HALF_UP — gate queries must avoid ratios that
    * land exactly on a 2-decimal binary midpoint (the pinned testdata
    * scales don't produce any; a new query with tp/(tp+fp) like 1/800
    * would need a different label rule). */
  private def evalSummarySql(pSql: String): String =
    s"""WITH p AS ($pSql),
       |tot AS (
       |  SELECT sum(CASE WHEN truth = pred THEN 1 ELSE 0 END) AS correct,
       |         count(*) AS total
       |  FROM p),
       |lblagg AS (
       |  SELECT label, sum(tp) AS tp, sum(fp) AS fp, sum(fn) AS fn
       |  FROM (
       |    SELECT truth AS label,
       |      CASE WHEN truth = pred THEN 1 ELSE 0 END AS tp,
       |      0 AS fp,
       |      CASE WHEN truth <> pred THEN 1 ELSE 0 END AS fn
       |    FROM p
       |    UNION ALL
       |    SELECT pred, 0,
       |      CASE WHEN truth <> pred THEN 1 ELSE 0 END, 0
       |    FROM p)
       |  GROUP BY label),
       |cls AS (
       |  SELECT string_agg(
       |    'Class ''' || label || '''' || chr(10) ||
       |    'Precision: ' || tp || '/' || (tp+fp) || ' (' ||
       |      printf('%.2f', 100.0*tp/(tp+fp)) || '%)' || chr(10) ||
       |    'Recall: ' || tp || '/' || (tp+fn) || ' (' ||
       |      printf('%.2f', 100.0*tp/(tp+fn)) || '%)' || chr(10),
       |    '' ORDER BY label) AS body
       |  FROM lblagg)
       |SELECT 'Accuracy: ' || correct || '/' || total || ' (' ||
       |  printf('%.2f', 100.0*correct/total) || '%)' || chr(10) || body AS summary
       |FROM tot, cls""".stripMargin

  /** DuckDB rebuild of the nearest-centroid scorer: per-row argmin of
    * squared distance to per-label centroids, ties to the smaller
    * label — the classify expression's documented tie-break. `labSql`
    * must yield (c_custkey, lbl, x0, x1). */
  private def centroidArgminSql(labSql: String, idCol: String = "c_custkey"): String =
    s"""WITH lab AS ($labSql),
       |cent AS (SELECT lbl, avg(x0) AS m0, avg(x1) AS m1 FROM lab GROUP BY lbl),
       |scored AS (
       |  SELECT l.$idCol, l.lbl AS t_lbl, c.lbl AS p_lbl,
       |    row_number() OVER (PARTITION BY l.$idCol
       |      ORDER BY (l.x0-c.m0)*(l.x0-c.m0) + (l.x1-c.m1)*(l.x1-c.m1), c.lbl) AS rn
       |  FROM lab l CROSS JOIN cent c)
       |SELECT * FROM scored WHERE rn = 1""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // OLS with one feature: DuckDB's regr_slope/regr_intercept IS the
    // closed-form the normal equations solve, so predictions match.
    "ml_regressor" -> QueryDef(
      sql("""WITH model AS (
            |  SELECT learn_regressor(CAST(c_acctbal AS DOUBLE),
            |                         features(CAST(c_nationkey AS DOUBLE))) AS m
            |  FROM customer)
            |SELECT c_custkey,
            |  round(regress(features(CAST(c_nationkey AS DOUBLE)), m), 2) AS pred
            |FROM customer, model
            |WHERE c_custkey <= 200
            |ORDER BY c_custkey""".stripMargin),
      Some("""WITH s AS (
             |  SELECT regr_slope(CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS DOUBLE)) AS w,
             |         regr_intercept(CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS DOUBLE)) AS b
             |  FROM customer)
             |SELECT c_custkey, round(w * c_nationkey + b, 2) AS pred
             |FROM customer, s
             |WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    // Two features + intercept: the oracle solves the 3x3 normal
    // equations by Cramer's rule over raw sums — same linear system the
    // aggregate's Gaussian elimination solves.
    "ml_regressor_multi" -> QueryDef(
      sql("""WITH model AS (
            |  SELECT learn_regressor(CAST(c_acctbal AS DOUBLE),
            |    features(CAST(c_nationkey AS DOUBLE),
            |             CAST(c_custkey % 100 AS DOUBLE))) AS m
            |  FROM customer)
            |SELECT c_custkey,
            |  round(regress(features(CAST(c_nationkey AS DOUBLE),
            |                         CAST(c_custkey % 100 AS DOUBLE)), m), 2) AS pred
            |FROM customer, model
            |WHERE c_custkey <= 200
            |ORDER BY c_custkey""".stripMargin),
      Some("""WITH t AS (
             |  SELECT CAST(c_acctbal AS DOUBLE) AS y,
             |         CAST(c_nationkey AS DOUBLE) AS x1,
             |         CAST(c_custkey % 100 AS DOUBLE) AS x2
             |  FROM customer),
             |s AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |    sum(x1) AS s1, sum(x2) AS s2,
             |    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
             |    sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y
             |  FROM t),
             |w AS (
             |  SELECT
             |    (n*(s11*s22-s12*s12) - s1*(s1*s22-s12*s2) + s2*(s1*s12-s11*s2)) AS det,
             |    (sy*(s11*s22-s12*s12) - s1*(s1y*s22-s12*s2y) + s2*(s1y*s12-s11*s2y)) AS det0,
             |    (n*(s1y*s22-s12*s2y) - sy*(s1*s22-s12*s2) + s2*(s1*s2y-s1y*s2)) AS det1,
             |    (n*(s11*s2y-s1y*s12) - s1*(s1*s2y-s1y*s2) + sy*(s1*s12-s11*s2)) AS det2
             |  FROM s)
             |SELECT c_custkey,
             |  round(det0/det + (det1/det)*c_nationkey + (det2/det)*(c_custkey % 100), 2) AS pred
             |FROM customer, w
             |WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    // Nearest-centroid classifier, varchar labels; the oracle recomputes
    // the per-class centroids with AVG and takes the argmin distance
    // (ties by label — the expression's documented tie-break).
    "ml_classifier" -> QueryDef(
      sql("""WITH lab AS (
            |  SELECT c_custkey,
            |    CASE WHEN c_acctbal >= 4500 THEN 'high' ELSE 'low' END AS lbl,
            |    features(CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS DOUBLE)) AS f
            |  FROM customer),
            |model AS (SELECT learn_classifier(lbl, f) AS m FROM lab)
            |SELECT c_custkey, classify_varchar(f, m) AS pred
            |FROM lab, model
            |WHERE c_custkey <= 300
            |ORDER BY c_custkey""".stripMargin),
      Some(s"""SELECT c_custkey, p_lbl AS pred
              |FROM (${centroidArgminSql(
        """SELECT c_custkey,
          |    CASE WHEN c_acctbal >= 4500 THEN 'high' ELSE 'low' END AS lbl,
          |    CAST(c_acctbal AS DOUBLE) AS x0, CAST(c_nationkey AS DOUBLE) AS x1
          |  FROM customer""".stripMargin)}) s
              |WHERE c_custkey <= 300
              |ORDER BY c_custkey""".stripMargin)),

    // Full loop in one statement: train → score → confusion summary.
    // The oracle chains the two proven fragments (centroid argmin,
    // exact summary string) over the same deterministic label rule.
    "ml_train_score_evaluate" -> QueryDef(
      sql("""WITH lab AS (
            |  SELECT c_custkey,
            |    CASE WHEN c_acctbal >= 4500 THEN 1 ELSE 0 END AS lbl,
            |    features(CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS DOUBLE)) AS f
            |  FROM customer),
            |model AS (SELECT learn_classifier(lbl, f) AS m FROM lab)
            |SELECT evaluate_classifier_predictions(lbl, classify(f, m)) AS summary
            |FROM lab, model""".stripMargin),
      Some(evalSummarySql(
        s"""SELECT CAST(t_lbl AS VARCHAR) AS truth, CAST(p_lbl AS VARCHAR) AS pred
           |  FROM (${centroidArgminSql(
          """SELECT c_custkey,
            |    CASE WHEN c_acctbal >= 4500 THEN 1 ELSE 0 END AS lbl,
            |    CAST(c_acctbal AS DOUBLE) AS x0, CAST(c_nationkey AS DOUBLE) AS x1
            |  FROM customer""".stripMargin)}) s""".stripMargin))),

    // The reference's default `classify` overload returns bigint; labels
    // train from a numeric rule and predictions come back as longs.
    "ml_classifier_bigint" -> QueryDef(
      sql("""WITH lab AS (
            |  SELECT c_custkey,
            |    CASE WHEN c_acctbal >= 4500 THEN 1 ELSE 0 END AS lbl,
            |    features(CAST(c_acctbal AS DOUBLE)) AS f
            |  FROM customer),
            |model AS (SELECT learn_classifier(lbl, f) AS m FROM lab)
            |SELECT c_custkey, classify(f, m) AS pred
            |FROM lab, model
            |WHERE c_custkey <= 300
            |ORDER BY c_custkey""".stripMargin),
      // x1 pinned to 0: the shared two-feature argmin reduces to the
      // one-feature distance when the second coordinate is constant
      Some(s"""SELECT c_custkey, CAST(p_lbl AS BIGINT) AS pred
              |FROM (${centroidArgminSql(
        """SELECT c_custkey,
          |    CASE WHEN c_acctbal >= 4500 THEN 1 ELSE 0 END AS lbl,
          |    CAST(c_acctbal AS DOUBLE) AS x0, CAST(0 AS DOUBLE) AS x1
          |  FROM customer""".stripMargin)}) s
              |WHERE c_custkey <= 300
              |ORDER BY c_custkey""".stripMargin)),

    // End-to-end corpus quality classifier: compute text statistics,
    // train a centroid classifier on a length-derived quality label,
    // apply it back to every document — the classify stage is one
    // broadcast of the model blob over a single corpus scan, so the
    // whole pipeline is train (one distributed aggregate) + score (one
    // map pass): the shape a 100 TB quality-filter pass needs. The
    // oracle recomputes the identical features and centroids in SQL.
    "ml_quality_classifier" -> QueryDef(
      sql("""WITH feat AS (
            |  SELECT doc_id,
            |    CASE WHEN n_chars >= 300 THEN 'keep' ELSE 'drop' END AS lbl,
            |    features(
            |      CAST(size(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' ')) AS DOUBLE),
            |      CAST(length(text) AS DOUBLE)) AS f
            |  FROM documents),
            |model AS (SELECT learn_classifier(lbl, f) AS m FROM feat)
            |SELECT doc_id, classify_varchar(f, m) AS pred
            |FROM feat, model
            |ORDER BY doc_id""".stripMargin),
      Some(s"""SELECT doc_id, p_lbl AS pred
              |FROM (${centroidArgminSql(
        """SELECT doc_id,
          |    CASE WHEN n_chars >= 300 THEN 'keep' ELSE 'drop' END AS lbl,
          |    CAST(len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS DOUBLE) AS x0,
          |    CAST(length(text) AS DOUBLE) AS x1
          |  FROM documents""".stripMargin, idCol = "doc_id")}) s
              |ORDER BY doc_id""".stripMargin)),

    // Bigint labels through the reference's default `classify` overload:
    // train on a numeric rule, predict, and aggregate the confusion
    // summary — the oracle rebuilds the exact summary string.
    "ml_evaluate" -> QueryDef(
      sql("""SELECT evaluate_classifier_predictions(
            |  c_custkey % 3, (c_custkey * 2) % 3) AS summary
            |FROM customer""".stripMargin),
      Some(evalSummarySql(
        """SELECT CAST(c_custkey % 3 AS VARCHAR) AS truth,
          |         CAST((c_custkey * 2) % 3 AS VARCHAR) AS pred
          |  FROM customer""".stripMargin)))
  )
}
