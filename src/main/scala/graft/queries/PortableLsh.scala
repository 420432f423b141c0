package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible MinHash family for the oracle-checked LSH
  * dedup scale path (`dedup_minhash_lsh_full`).
  *
  * The r3 scale path hashed with xxhash64, which DuckDB cannot compute,
  * so its oracle could only check count/boolean invariants (VERDICT r3
  * "What's wrong" #1). This family is built from primitives BOTH
  * engines evaluate bit-identically — `md5` (RFC 1321, lowercase hex in
  * Spark and DuckDB alike) and 64-bit integer arithmetic — so DuckDB
  * re-derives the exact same (id, band-bucket) edge list and the full
  * (id, cluster) assignment becomes value-checkable end to end:
  *
  *   x(word)    = first 8 md5 hex chars as int, mod p     (31-bit base hash)
  *   h_i(word)  = (alpha_i * x + beta_i) mod p            (Carter-Wegman, p = 2^31-1)
  *   minhash_i  = min over words of h_i                   (i = 0..63)
  *   bucket     = band ':' minhash[4b] '-' ... '-' minhash[4b+3]   (16 bands)
  *
  * alpha_i * x < 2^62 — no overflow in either engine's BIGINT. The
  * per-permutation constants are SplitMix64-derived (Steele et al.,
  * same generator as [[graft.functions.HyperplaneLsh]]) and are
  * interpolated as literals into the DuckDB oracle by [[duckMinhashSql]]
  * — one source of truth, no drift.
  *
  * Reference semantics: dedup is not a presto-ads operator; this is the
  * training-pipeline completion (SURVEY §2.12). Cost per doc is one md5
  * per distinct word plus 64 fused multiply-mods per word — all
  * codegen'd `functions._`, no UDFs.
  */
object PortableLsh {
  val P: Long = graft.functions.CwMinhash.P // 2^31 - 1, prime
  val NumPerms = graft.functions.CwMinhash.NumPerms
  val NumBands = 16
  val RowsPerBand = 4

  /** Candidate-edge verification threshold (of [[NumPerms]]=64
    * signature rows; r19, VERDICT r18 wrong #1): a band-bucket
    * collision is accepted as a near-dup edge only when at least this
    * many of the pair's 64 minhashes AGREE — agreement/64 is the
    * standard unbiased Jaccard estimate (each permutation's minima
    * collide with probability exactly j), so 48 estimates j ≥ 0.75.
    * Measured on the gate corpus (r19 prototype over the shipped
    * md5/Carter-Wegman family): 48 keeps EVERY candidate pair with
    * true j ≥ 0.9 (their minimum agreement is 50) while keeping ZERO
    * pairs with true j < 0.5 — the 32% sub-0.5 band-collision rate
    * dedup_lsh_recall measured at the 4-row banding drops to nothing,
    * and the cluster count rises from 1 connected component to 123
    * at sf0.01 / 1150 at sf0.1. Verification reads only the already-
    * computed signatures — no text re-read, O(64) per candidate. */
  val VerifyAgree = 48

  /** alpha in [1, p-1], beta in [0, p-1] — fixed, engine-shared
    * (SplitMix64-derived in [[graft.functions.CwMinhash]], the single
    * source of truth shared with the codegen signature expression;
    * these aliases keep the oracle interpolation here). */
  val alphas: Array[Long] = graft.functions.CwMinhash.alphas
  val betas: Array[Long] = graft.functions.CwMinhash.betas

  /** Spark side: distinct-word base hashes for a text column —
    * array<long> of x(word) values (md5 hex prefix → int, mod p). */
  def wordBaseHashes(text: Column): Column = {
    val words = array_distinct(split(regexp_replace(trim(lower(text)), "\\s+", " "), " "))
    transform(words, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % P)
  }

  /** Spark side: the 16 band-bucket strings for an x-array column, all
    * minhashes computed in ONE projection (mirrors the r2/r3 lesson:
    * explode only the 16 bucket strings, never the wide array). */
  def bucketArray(x: Column): Column = bucketArrayBanded(x, RowsPerBand)

  /** [[bucketArray]] at an explicit rows-per-band (band count =
    * NumPerms / rowsPerBand). More rows per band = stricter candidate
    * threshold (collision prob ≈ j^rows per band): dedup recall wants
    * the default 4; split hygiene (pipeline_leakage_split) wants 16 —
    * at 4 this corpus's LSH graph is one connected component, which
    * would put every document in one split. Both trade-offs are
    * MEASURED against the exact Jaccard pair set since r18
    * (dedup_lsh_recall / dedup_lsh_recall_strict: 4 rows captures
    * 100% at j≥0.9 with 32% low-band collisions; 16 rows captures 77%
    * with ZERO collisions below j=0.5). */
  def bucketArrayBanded(x: Column, rowsPerBand: Int): Column = {
    require(NumPerms % rowsPerBand == 0)
    // NOTE (optimization r19): this inline form embeds the signature
    // expression once per element_at reference (the optimizer does not
    // CSE across the bucket strings), re-evaluating it up to 64× per
    // row. Hot paths must two-step project instead:
    //   .select(minhashArray($"x").as("m"))
    //   .select(bucketArrayFromSigs($"m", rowsPerBand))
    // (the wordBaseHashes materialize-before-reference rule, one level
    // up). All gate call sites do; this stays for spec-level parity
    // checks.
    bucketArrayFromSigs(minhashArray(x), rowsPerBand)
  }

  /** The full 64-row minhash SIGNATURE for an x-array column — the
    * verification currency of the star-verified dedup path: buckets
    * derive from it by slicing ([[bucketArrayFromSigs]]) and candidate
    * edges are accepted by counting agreeing rows.
    *
    * Optimization r19 (guide §1.2 step 2): computed by the codegen'd
    * [[graft.functions.CwMinhashSigs]] expression — one pass over the
    * base-hash buffer, no per-permutation array allocation — replacing
    * 64 interpreted `array_min(transform(...))` higher-order folds.
    * Values are bit-identical (exact integer arithmetic, min is
    * order-insensitive); the DuckDB oracle derivation is unchanged. */
  def minhashArray(x: Column): Column = call_function("minhash_sigs", x)

  /** Band-bucket strings derived from an already-computed signature
    * column `m` (array<long>, length 64) — identical strings to
    * [[bucketArrayBanded]] but O(NumPerms) element_at reads instead of
    * recomputing 64 array_min folds. */
  def bucketArrayFromSigs(m: Column, rowsPerBand: Int): Column = {
    require(NumPerms % rowsPerBand == 0)
    val buckets = (0 until NumPerms / rowsPerBand).map { b =>
      concat_ws(":", lit(b), concat_ws("-",
        (0 until rowsPerBand).map(r => element_at(m, b * rowsPerBand + r + 1)): _*))
    }
    array(buckets: _*)
  }

  /** DuckDB fragment: the shared xs/consts/mhrow/mh minhash prefix
    * over a CTE `base(doc_id, text)` — everything up to (not
    * including) the banding-specific `edges` CTE. Factored (r17;
    * ADVICE r16 #2) so both edge builders APPEND their own edges CTE
    * instead of one slicing the other's finished SQL at a formatting
    * marker, which survived reformat-detection but not a rename of
    * the upstream CTEs it silently depended on.
    *
    * The per-permutation constants are joined in from a 64-row
    * `consts` CTE — inlining the literal arrays inside the nested
    * lambda re-materializes them per word × permutation and is ~200×
    * slower in DuckDB 1.0. The per-permutation minimum is computed
    * ROW-based (unnest the shingle hashes, then a grouped min) rather
    * than `list_min(list_transform(...))`: the list form materializes
    * a |tokens|-length list per doc × permutation — tens of GB at 50k
    * docs, and DuckDB list intermediates don't spill (sf1 gate OOM) —
    * while the grouped min is a spilling hash aggregate at any
    * scale. */
  private def duckMinhashPrefix: String = {
    val alphaList = alphas.mkString("[", ", ", "]")
    val betaList = betas.mkString("[", ", ", "]")
    s"""xs AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_transform(
       |      list_distinct(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')),
       |      t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % $P) AS x
       |  FROM base),
       |consts AS (
       |  SELECT CAST(r.range AS INT) AS i,
       |    list_extract(CAST($alphaList AS BIGINT[]), CAST(r.range + 1 AS INT)) AS a,
       |    list_extract(CAST($betaList AS BIGINT[]), CAST(r.range + 1 AS INT)) AS b
       |  FROM range(0, $NumPerms) r),
       |xr AS (SELECT doc_id, unnest(x) AS v FROM xs),
       |mhrow AS (
       |  SELECT doc_id, c.i, min((c.a * v + c.b) % $P) AS mi
       |  FROM xr, consts c GROUP BY doc_id, c.i),
       |mh AS MATERIALIZED (SELECT doc_id, list(mi ORDER BY i) AS m FROM mhrow GROUP BY doc_id)""".stripMargin
  }

  def duckMinhashEdges: String = duckMinhashEdgesBanded(RowsPerBand)

  /** The (id, bucket) edge CTE chain at an explicit rows-per-band,
    * mirroring [[bucketArrayBanded]] (identical "b:m1-m2-…" bucket
    * strings). */
  def duckMinhashEdgesBanded(rowsPerBand: Int,
      cteName: String = "edges"): String = {
    require(NumPerms % rowsPerBand == 0)
    val nb = NumPerms / rowsPerBand
    duckMinhashPrefix +
      s""",
         |$cteName AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |    unnest(list_transform(range(0, $nb), b ->
         |      b::VARCHAR || ':' || array_to_string(
         |        m[CAST(b * $rowsPerBand + 1 AS INT) :
         |          CAST((b + 1) * $rowsPerBand AS INT)], '-'))) AS bucket
         |  FROM mh)""".stripMargin
  }

  /** DuckDB fragment: the VERIFIED star edge chain over a CTE
    * `base(doc_id, text)` — the oracle twin of the engine's
    * star-verified dedup path (r19). Ends in an `edges(id, bucket)`
    * CTE ready for [[duckClosureCtes]]: band-bucket candidates at
    * `rowsPerBand` are reduced to STAR edges (each member paired with
    * its bucket's min-id hub — O(memberships) candidates, never the
    * quadratic within-bucket pair set), each star edge is verified by
    * counting agreeing signature rows against [[VerifyAgree]], and
    * every doc contributes a self-edge so singletons survive as their
    * own cluster. */
  def duckVerifiedEdgesBanded(rowsPerBand: Int): String =
    duckMinhashEdgesBanded(rowsPerBand, "cedges") +
      s""",
         |hubs AS (SELECT bucket, min(id) AS hub FROM cedges GROUP BY bucket),
         |starc AS (SELECT DISTINCT h.hub, e.id
         |          FROM cedges e JOIN hubs h USING (bucket)
         |          WHERE e.id <> h.hub),
         |ver AS (
         |  SELECT s.id, s.hub
         |  FROM starc s
         |  JOIN mh ma ON ma.doc_id = s.hub
         |  JOIN mh mb ON mb.doc_id = s.id
         |  WHERE len(list_filter(range(1, ${NumPerms + 1}),
         |          i -> ma.m[i] = mb.m[i])) >= $VerifyAgree),
         |edges AS MATERIALIZED (
         |  SELECT id, CAST(hub AS VARCHAR) AS bucket FROM ver
         |  UNION ALL
         |  SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS bucket FROM base)""".stripMargin

  /** DuckDB fragment: exact connected components over a CTE
    * `edges(id, bucket)` — the independent recomputation of
    * [[Clustering.propagateToFixpoint]]'s fixpoint. The label graph is
    * first CONTRACTED by four unrolled neighbor-min rounds (f1..f4 —
    * plain joins, label-count-sized) and only the residual edges enter
    * the recursive reachability: the raw all-pairs recursion
    * materializes |component labels|^2 rows and OOMs DuckDB on
    * sf1-scale merged components, while after contraction the residue
    * is near-empty and the recursion still restores full exactness
    * whatever the contraction left unfinished. Must follow
    * `WITH RECURSIVE`; final SELECT yields (id, cluster).
    *
    * Shape matters even in the oracle: a naive reflexive-transitive
    * closure materializes component-size² rows (this corpus has a
    * ~3k-member near-dup component at sf0.1 → tens of millions of
    * closure rows, >25 min). Instead, THREE min-label propagation
    * rounds run as plain GROUP BYs — the same contraction the engine
    * iterates — and the recursive closure only finishes the job on
    * the CONTRACTED label graph (a few hundred nodes), which is exact
    * for any component diameter. */
  def duckClosureSelect: String =
    s"""$duckClosureCtes
      |SELECT id, cluster FROM assign ORDER BY id""".stripMargin

  /** The closure chain ending in an `assign(id, cluster)` CTE, for
    * oracles that post-process the assignment (pipeline_leakage_split)
    * instead of emitting it directly. */
  def duckClosureCtes: String =
    """bm0 AS (SELECT bucket, min(id) AS m FROM edges GROUP BY bucket),
      |r1 AS (SELECT e.id, min(bm0.m) AS l FROM edges e JOIN bm0 USING (bucket) GROUP BY e.id),
      |bm1 AS (SELECT e.bucket, min(r1.l) AS m FROM edges e JOIN r1 ON r1.id = e.id GROUP BY e.bucket),
      |r2 AS (SELECT e.id, min(bm1.m) AS l FROM edges e JOIN bm1 USING (bucket) GROUP BY e.id),
      |bm2 AS (SELECT e.bucket, min(r2.l) AS m FROM edges e JOIN r2 ON r2.id = e.id GROUP BY e.bucket),
      |r3 AS (SELECT e.id, min(bm2.m) AS l FROM edges e JOIN bm2 USING (bucket) GROUP BY e.id),
      |lb AS MATERIALIZED (SELECT e.bucket, r.l FROM edges e JOIN r3 r ON r.id = e.id),
      |bmin AS (SELECT bucket, min(l) AS m FROM lb GROUP BY bucket),
      |le AS (SELECT DISTINCT bmin.m AS x, lb.l AS y FROM lb JOIN bmin USING (bucket)
      |       WHERE bmin.m <> lb.l),
      |und AS MATERIALIZED (SELECT x, y FROM le UNION ALL SELECT y AS x, x AS y FROM le),
      |f0 AS MATERIALIZED (SELECT DISTINCT l AS x, l AS f FROM lb),
      |f1 AS MATERIALIZED (SELECT p.x, least(p.f, coalesce(min(q.f), p.f)) AS f
      |       FROM f0 p LEFT JOIN und u ON u.x = p.x
      |                 LEFT JOIN f0 q ON q.x = u.y
      |       GROUP BY p.x, p.f),
      |f2 AS MATERIALIZED (SELECT p.x, least(p.f, coalesce(min(q.f), p.f)) AS f
      |       FROM f1 p LEFT JOIN und u ON u.x = p.x
      |                 LEFT JOIN f1 q ON q.x = u.y
      |       GROUP BY p.x, p.f),
      |f3 AS MATERIALIZED (SELECT p.x, least(p.f, coalesce(min(q.f), p.f)) AS f
      |       FROM f2 p LEFT JOIN und u ON u.x = p.x
      |                 LEFT JOIN f2 q ON q.x = u.y
      |       GROUP BY p.x, p.f),
      |f4 AS MATERIALIZED (SELECT p.x, least(p.f, coalesce(min(q.f), p.f)) AS f
      |       FROM f3 p LEFT JOIN und u ON u.x = p.x
      |                 LEFT JOIN f3 q ON q.x = u.y
      |       GROUP BY p.x, p.f),
      |und2 AS MATERIALIZED (SELECT DISTINCT fa.f AS x, fb.f AS y
      |         FROM und u JOIN f4 fa ON fa.x = u.x JOIN f4 fb ON fb.x = u.y
      |         WHERE fa.f <> fb.f),
      |reach AS (
      |  SELECT DISTINCT f AS lid, f AS rid FROM f4
      |  UNION
      |  SELECT u.y AS lid, r.rid FROM und2 u JOIN reach r ON r.lid = u.x),
      |rm AS (SELECT lid, min(rid) AS m FROM reach GROUP BY lid),
      |lc AS (SELECT f4.x AS lid, coalesce(rm.m, f4.f) AS cluster
      |       FROM f4 LEFT JOIN rm ON rm.lid = f4.f),
      |assign AS (SELECT r3.id, lc.cluster
      |           FROM r3 JOIN lc ON lc.lid = r3.l)""".stripMargin
}
