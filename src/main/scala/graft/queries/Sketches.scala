package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch / approximate-aggregate tier — SURVEY.md §2.4 sketch rows +
  * §7.3 custom-Catalyst list.
  *
  * - approx_distinct → `approx_count_distinct` (HLL++).
  * - approx_set / merge / cardinality (mergeable HLL round-trip) →
  *   Spark's DataSketches-backed `hll_sketch_agg` / `hll_union_agg` /
  *   `hll_sketch_estimate` — binary sketches, exactly Presto's
  *   HyperLogLogType surface.
  * - checksum → `bit_xor(xxhash64(...))`: order-independent, mergeable.
  * - max_n / min_n → graft's BoundedTopNAgg (TypedImperativeAggregate,
  *   O(n) state per group).
  * - approx_percentile → `percentile_approx`.
  * - numeric_histogram → fixed-width bucket groupBy rewrite.
  *
  * Estimates are engine-specific, so oracle checks assert exact
  * *properties* (merge-consistency, error bounds, order-independence)
  * that evaluate to literal booleans DuckDB can also produce; exact
  * operators (max_n, histogram) get value-matched oracles.
  */
object Sketches extends QueryGroup {
  private def r4(c: Column): Column = round(c, 4)

  override def defs: Map[String, QueryDef] = Map(
    // approx_count_distinct error-bound property per group + globally.
    "sketch_approx_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey").as("approx"),
            countDistinct($"l_partkey").as("exact"))
          .select($"l_returnflag",
            // error bucket (units of 5% relative error): 0 = within the
            // sketch bound; any drift shows its magnitude, not a boolean
            floor(abs($"approx" - $"exact") * 20.0 / $"exact").cast("int").as("err20"),
            $"exact")
          .orderBy($"l_returnflag")
      },
      // `exact` is a real value check — the error bucket cannot pass
      // vacuously against a wrong cardinality.
      Some("""SELECT l_returnflag, CAST(0 AS INT) AS err20,
             |  count(DISTINCT l_partkey) AS exact
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Mergeable HLL: the approx_set/merge/cardinality round-trip —
    // per-group sketches union-merged into a global estimate. (The
    // merged estimate need not be bit-identical to a single-pass
    // sketch — DataSketches HLL mode transitions differ — so both
    // paths are checked against the exact count instead.)
    "sketch_hll_mergeable" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val perGroup = li.groupBy($"l_returnflag")
          .agg(hll_sketch_agg($"l_partkey").as("sketch"))
        val merged = perGroup.agg(
          hll_sketch_estimate(hll_union_agg($"sketch")).as("est_merged"))
        val global = li.agg(
          hll_sketch_estimate(hll_sketch_agg($"l_partkey")).as("est_global"),
          countDistinct($"l_partkey").as("exact"))
        merged.crossJoin(global)
          // two error buckets in one digit-coded int: ones = merged
          // path, tens = global path; 0 means both within 5%
          .select((floor(abs($"est_merged" - $"exact") * 20.0 / $"exact") +
            floor(abs($"est_global" - $"exact") * 20.0 / $"exact") * 10)
            .cast("int").as("err_bits"),
            $"exact")
      },
      Some("""SELECT CAST(0 AS INT) AS err_bits,
             |  count(DISTINCT l_partkey) AS exact FROM lineitem""".stripMargin)),

    // checksum (ChecksumAggregationFunction): order-independent xor of
    // row hashes; must be invariant under reordering and sensitive to
    // content changes.
    "sketch_checksum" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        def checksumOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
          df.agg(bit_xor(xxhash64($"l_orderkey", $"l_linenumber", $"l_quantity"))
            .as("cs"))
        val a = checksumOf(li).withColumnRenamed("cs", "cs_natural")
        val b = checksumOf(li.orderBy($"l_extendedprice".desc))
          .withColumnRenamed("cs", "cs_reordered")
        val c = checksumOf(li.filter($"l_linenumber" =!= 1))
          .withColumnRenamed("cs", "cs_subset")
        val n = li.agg(count(lit(1)).as("n_rows"))
        a.crossJoin(b).crossJoin(c).crossJoin(n)
          // digit-coded defects: ones = reorder changed the checksum
          // (must not), tens = subset kept it (must not); expected 0
          .select((when($"cs_natural" === $"cs_reordered", 0).otherwise(1) +
            when($"cs_natural" === $"cs_subset", 10).otherwise(0)).as("chk_bad_bits"),
            $"n_rows")
      },
      Some("""SELECT 0 AS chk_bad_bits,
             |  count(*) AS n_rows FROM lineitem""".stripMargin)),

    // max_n / min_n custom TypedImperativeAggregate — exact oracle.
    "sketch_max_n" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_returnflag,
                |  array_join(transform(max_n(l_extendedprice, 3),
                |    x -> format_string('%.4f', round(x, 4))), ',') AS top3,
                |  array_join(transform(min_n(l_extendedprice, 3),
                |    x -> format_string('%.4f', round(x, 4))), ',') AS bottom3
                |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  coalesce(array_to_string(list_transform(
             |    (list(l_extendedprice ORDER BY l_extendedprice DESC))[1:3],
             |    x -> printf('%.4f', round(x, 4))), ','), '') AS top3,
             |  coalesce(array_to_string(list_transform(
             |    (list(l_extendedprice ORDER BY l_extendedprice ASC))[1:3],
             |    x -> printf('%.4f', round(x, 4))), ','), '') AS bottom3
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // qdigest round-trip (QuantileDigestAggregationFunction.java +
    // QuantileDigestFunctions.java): per-group mergeable sketches,
    // merged to a global digest, value_at_quantile checked against the
    // exact percentile within the sketch's rank-error bound (KLL k=200
    // → ±1.7% rank; the window here is ±6%/±10%, >3σ). n_groups and
    // n_orders are real DuckDB-checkable values.
    "sketch_qdigest_merge" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH g AS (
                |  SELECT o_orderstatus, qdigest_agg(o_totalprice) AS sk,
                |    percentile(o_totalprice, 0.4) AS g_lo,
                |    percentile(o_totalprice, 0.6) AS g_hi
                |  FROM orders GROUP BY o_orderstatus),
                |m AS (SELECT merge_qdigest(sk) AS msk, count(*) AS n_groups,
                |        bool_and(value_at_quantile(sk, 0.5D) BETWEEN g_lo AND g_hi)
                |          AS group_medians_ok
                |      FROM g),
                |e AS (SELECT percentile(o_totalprice, 0.44) AS lo,
                |        percentile(o_totalprice, 0.56) AS hi, count(*) AS n_orders
                |      FROM orders)
                |SELECT m.n_groups, e.n_orders,
                |  IF(value_at_quantile(m.msk, 0.5D) BETWEEN e.lo AND e.hi, 0, 1)
                |    + 10 * IF(m.group_medians_ok, 0, 1) AS med_bad_bits
                |FROM m CROSS JOIN e""".stripMargin)
      },
      Some("""SELECT count(DISTINCT o_orderstatus) AS n_groups,
             |  count(*) AS n_orders, 0 AS med_bad_bits
             |FROM orders""".stripMargin)),

    // min_by/max_by N-variants (minmaxby/ MaxByNAggregationFunction +
    // TypedKeyValueHeap): values for the n extreme keys, bounded-heap
    // per group. Registered as min_by_n/max_by_n (Spark's builtin
    // 2-arg min_by name can't be arity-overloaded). Exact oracle via
    // ordered-list slicing; both sides tie-break on the value.
    "sketch_min_max_by_n" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderstatus,
                |  array_join(transform(max_by_n(o_orderkey, o_totalprice, 3),
                |    x -> cast(x AS STRING)), ',') AS top3_orders,
                |  array_join(transform(min_by_n(o_orderkey, o_totalprice, 3),
                |    x -> cast(x AS STRING)), ',') AS bottom3_orders
                |FROM orders GROUP BY o_orderstatus
                |ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |  coalesce(array_to_string(
             |    (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3], ','), '')
             |    AS top3_orders,
             |  coalesce(array_to_string(
             |    (list(o_orderkey ORDER BY o_totalprice ASC, o_orderkey))[1:3], ','), '')
             |    AS bottom3_orders
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // approx_most_frequent (ApproximateMostFrequentFunction.java):
    // heavy hitters per group. o_orderpriority has 5 distinct values
    // and the sketch capacity is 64, so the Misra-Gries counts are
    // EXACT and the oracle can value-match the full map.
    "sketch_approx_most_frequent" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderstatus,
                |  array_join(transform(array_sort(map_entries(
                |    approx_most_frequent(3, o_orderpriority, 64))),
                |    e -> concat(e.key, ':', cast(e.value AS STRING))), ',') AS top3
                |FROM orders GROUP BY o_orderstatus
                |ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""WITH c AS (
             |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY count(*) DESC, o_orderpriority) AS rk
             |  FROM orders GROUP BY 1, 2)
             |SELECT o_orderstatus,
             |  string_agg(o_orderpriority || ':' || n, ',' ORDER BY o_orderpriority)
             |    AS top3
             |FROM c WHERE rk <= 3 GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // approx_set / merge_hll / hll_cardinality under the Presto
    // spellings — per-group sketches merged to a global estimate,
    // value-anchored by the exact distinct count.
    "sketch_approx_set_names" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH g AS (
                |  SELECT o_orderstatus, approx_set(o_custkey) AS sk
                |  FROM orders GROUP BY o_orderstatus),
                |m AS (SELECT hll_cardinality(merge_hll(sk)) AS est FROM g),
                |e AS (SELECT count(DISTINCT o_custkey) AS exact FROM orders)
                |SELECT CAST(floor(abs(m.est - e.exact) * 20.0D / e.exact) AS INT)
                |    AS err20,
                |  e.exact
                |FROM m CROSS JOIN e""".stripMargin)
      },
      Some("""SELECT CAST(0 AS INT) AS err20, count(DISTINCT o_custkey) AS exact
             |FROM orders""".stripMargin)),

    // approx_percentile error-bound property (qdigest analog).
    "sketch_approx_percentile" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_linestatus")
          .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("approx_med"),
            expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
          .select($"l_linestatus",
            // error in units of the sketch bound (1% + 1.0 abs slack):
            // 0 = within; drift shows its magnitude
            floor(abs($"approx_med" - $"exact_med") / ($"exact_med" * 0.01 + 1.0))
              .cast("int").as("err_units"),
            round($"exact_med", 4).as("exact_med"))
          .orderBy($"l_linestatus")
      },
      // exact_med anchors the group's true median (r4): the error
      // bucket cannot pass vacuously against a wrong distribution
      Some("""SELECT l_linestatus, CAST(0 AS INT) AS err_units,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_med
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // approx_percentile(x, ARRAY[p...]) vector form (Presto returns all
    // requested quantiles from one sketch pass). Error-bound booleans
    // per element, anchored by the exact interpolated median value.
    "sketch_approx_percentile_array" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_linestatus,
                |  aggregate(zip_with(
                |      percentile_approx(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000),
                |      percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D)),
                |      (a, e) -> IF(abs(a - e) <= e * 0.01 + 1.0D, 0, 1)),
                |    0, (acc, x) -> acc + x) AS n_outside_1pct,
                |  round(percentile(l_extendedprice, 0.5D), 4) AS exact_med
                |FROM lineitem GROUP BY l_linestatus
                |ORDER BY l_linestatus""".stripMargin)
      },
      Some("""SELECT l_linestatus, 0 AS n_outside_1pct,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_med
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // numeric_histogram (DoubleHistogramAggregation) as fixed-width
    // buckets — fully distributed, exact oracle.
    "sketch_numeric_histogram" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select((floor($"l_quantity" / 5.0) * 5.0).as("bucket_lo"))
          .groupBy($"bucket_lo")
          .agg(count(lit(1)).as("freq"))
          .orderBy($"bucket_lo")
      },
      Some("""SELECT floor(l_quantity / 5.0) * 5.0 AS bucket_lo, count(*) AS freq
             |FROM lineitem GROUP BY 1 ORDER BY bucket_lo""".stripMargin)),

    // SET_DIGEST surface (SetDigestFunctions.java; VERDICT r2 missing
    // #7): make_set_digest / merge_set_digest aggregates and the
    // cardinality / jaccard_index / intersection_cardinality /
    // hash_counts scalars over graft's bottom-k (KMV) digest. The
    // bounded set (custkey < 1000, ≤999 < k=8192) and the nationkey
    // hash map stay EXACT at every sf; the open-ended sets exceed k
    // beyond sf0.01, so their checks are KMV error-bound booleans
    // anchored by the exact distinct count both engines compute
    // independently. Bounds at >4σ of each estimator: cardinality
    // std ≈ 1/√k ≈ 1.1% → 5%; jaccard abs std ≈ √(J(1−J)/k) ≈ 0.002
    // → 0.02; intersection = jac_est × union_est inherits the ~6%
    // relative jaccard error at small J → 25%.
    "sketch_set_digest" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH base AS (
                |  SELECT
                |    make_set_digest(CASE WHEN c_custkey < 1000 THEN c_custkey END) AS da,
                |    make_set_digest(CASE WHEN c_custkey >= 500 THEN c_custkey END) AS db,
                |    make_set_digest(c_nationkey) AS dn,
                |    count(DISTINCT c_custkey) AS n_cust,
                |    count(DISTINCT CASE WHEN c_custkey < 1000 AND c_custkey >= 500
                |      THEN c_custkey END) AS n_inter,
                |    count(DISTINCT c_nationkey) AS n_nations,
                |    count(c_nationkey) AS n_rows
                |  FROM customer),
                |seg AS (SELECT c_mktsegment, make_set_digest(c_custkey) AS dig
                |        FROM customer GROUP BY c_mktsegment),
                |m AS (SELECT merge_set_digest(dig) AS dm FROM seg)
                |SELECT set_digest_cardinality(base.da) AS card_a,
                |  IF(abs(jaccard_index(base.da, base.db)
                |      - base.n_inter / cast(base.n_cust AS DOUBLE)) <= 0.02, 0, 1)
                |  + 10 * IF(abs(intersection_cardinality(base.da, base.db)
                |      - base.n_inter) <= 0.25 * base.n_inter, 0, 1)
                |  + 100 * IF(abs(set_digest_cardinality(m.dm) - base.n_cust)
                |      <= 0.05 * base.n_cust, 0, 1) AS digest_bad_bits,
                |  base.n_cust,
                |  size(hash_counts(base.dn)) AS hash_size,
                |  aggregate(map_values(hash_counts(base.dn)), 0, (a, x) -> a + x)
                |    AS hash_total
                |FROM base CROSS JOIN m""".stripMargin)
      },
      Some("""SELECT
             |  (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_custkey < 1000)
             |    AS card_a,
             |  0 AS digest_bad_bits,
             |  (SELECT count(DISTINCT c_custkey) FROM customer) AS n_cust,
             |  CAST((SELECT count(DISTINCT c_nationkey) FROM customer) AS INT)
             |    AS hash_size,
             |  CAST((SELECT count(c_nationkey) FROM customer) AS INT) AS hash_total""".stripMargin)),

    // Polymorphic merge() over all three sketch families in one query:
    // per-segment set digests, qdigests (KLL), and HLL sketches are
    // re-aggregated by the header-dispatching merge — each within its
    // family's error bound (the set digest exceeds k=8192 beyond the
    // sf0.01 gate, so its check is the same 5% KMV bound as HLL's),
    // anchored by the exact distinct count both engines recompute.
    "sketch_merge_generic" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH seg AS (
                |  SELECT c_mktsegment,
                |    make_set_digest(c_custkey) AS sd,
                |    qdigest_agg(c_acctbal) AS qd,
                |    hll_sketch_agg(c_custkey) AS hd
                |  FROM customer GROUP BY c_mktsegment)
                |SELECT
                |  IF(abs(set_digest_cardinality(merge(sd))
                |     - (SELECT count(DISTINCT c_custkey) FROM customer))
                |   <= 0.05 * (SELECT count(DISTINCT c_custkey) FROM customer), 0, 1)
                |  + 10 * IF(abs(hll_sketch_estimate(merge(hd))
                |     - (SELECT count(DISTINCT c_custkey) FROM customer))
                |   <= 0.05 * (SELECT count(DISTINCT c_custkey) FROM customer), 0, 1)
                |  + 100 * IF(quantile_at_value(merge(qd),
                |     (SELECT percentile(c_acctbal, 0.5D) FROM customer))
                |   BETWEEN 0.4 AND 0.6, 0, 1) AS merge_bad_bits,
                |  (SELECT count(DISTINCT c_custkey) FROM customer) AS n_cust
                |FROM seg""".stripMargin)
      },
      Some("""SELECT 0 AS merge_bad_bits,
             |  (SELECT count(DISTINCT c_custkey) FROM customer) AS n_cust""".stripMargin)),

    // Weighted approx_percentile (ApproximateLongPercentileAggregations
    // .weightedInput: qdigest.add(value, weight)). Mapped to Spark's
    // exact frequency-weighted percentile — the oracle expands each row
    // weight-fold and takes the interpolated quantile, which is the
    // definition both engines share.
    "sketch_weighted_percentile" -> QueryDef(
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_linestatus,
                |  round(approx_percentile_weighted(l_extendedprice, l_linenumber, 0.5D), 4)
                |    AS wmed,
                |  round(approx_percentile_weighted(l_extendedprice, l_linenumber, 0.9D), 4)
                |    AS w90
                |FROM lineitem GROUP BY l_linestatus
                |ORDER BY l_linestatus""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT l_linestatus, l_extendedprice
             |  FROM lineitem, unnest(range(l_linenumber)))
             |SELECT l_linestatus,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS wmed,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS w90
             |FROM e GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))
  )
}
