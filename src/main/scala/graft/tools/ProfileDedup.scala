package graft.tools

import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timing of the star-verified dedup path
  * (the two most expensive bench rows share it). Mirrors the stages of
  * TextPipeline.verifiedClusterAssignment inline so each leg can be
  * timed with the noop sink in isolation (guide §1.1/§1.4).
  *
  * Usage: runMain graft.tools.ProfileDedup [sfDir]
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("profile-dedup")
    import spark.implicits._
    import graft.queries.PortableLsh

    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, dir).select($"doc_id", $"text")

    // Stage A: word base hashes only (md5 per distinct word)
    time("A wordBaseHashes")(noop(
      docs.select($"doc_id", PortableLsh.wordBaseHashes($"text").as("x"))))
    // Stage B: + 64-permutation minhash signature
    time("B minhashArray")(noop(
      docs.select($"doc_id", PortableLsh.wordBaseHashes($"text").as("x"))
        .select($"doc_id", PortableLsh.minhashArray($"x").as("m"))))
    // Stage C: signatures persisted, bucket explode + star candidates
    val mh = docs
      .select($"doc_id", PortableLsh.wordBaseHashes($"text").as("x"))
      .select($"doc_id", PortableLsh.minhashArray($"x").as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("C mh persist+count")(mh.count())
    val cand = mh.select($"doc_id".as("id"),
      explode(PortableLsh.bucketArrayFromSigs($"m",
        PortableLsh.RowsPerBand)).as("bucket"))
    val star = cand
      .join(cand.groupBy($"bucket").agg(min($"id").as("hub")), "bucket")
      .filter($"id" =!= $"hub")
      .select($"hub", $"id").distinct()
    time("D star candidates")(noop(star))
    val ver = star
      .join(mh.select($"doc_id".as("hub"), $"m".as("ma")), Seq("hub"))
      .join(mh.select($"doc_id".as("id"), $"m".as("mb")), Seq("id"))
      .filter(aggregate(
        zip_with($"ma", $"mb", (a, b) => when(a === b, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v) >= PortableLsh.VerifyAgree)
      .select($"id", $"hub")
    time("E verified edges")(noop(ver))
    val edges = ver.select($"id", $"hub".cast("string").as("bucket"))
      .unionByName(docs.select($"doc_id".as("id"),
        $"doc_id".cast("string").as("bucket")))
    val assign = time("F fixpoint")(
      graft.queries.Clustering.propagateToFixpoint(edges, maxIters = 20,
        requireConverged = true).select($"id", $"cluster"))
    time("F fixpoint noop")(noop(assign))
    // Stage G: the bounded 500-doc all-pairs exact-Jaccard leg of
    // dedup_lsh_recall_verified
    val t = docs.filter($"doc_id" < 500)
      .select($"doc_id",
        array_sort(array_distinct(split(
          regexp_replace(trim(lower($"text")), "\\s+", " "), " "))).as("w"))
    val a = t.select($"doc_id".as("id_a"), $"w".as("wa"))
    val b = t.select($"doc_id".as("id_b"), $"w".as("wb"))
    val pairs = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("ni", size(array_intersect($"wa", $"wb")))
      .withColumn("j", $"ni".cast("double") /
        (size($"wa") + size($"wb") - $"ni"))
    time("G 500-doc all-pairs jaccard")(noop(pairs))
    mh.unpersist()

    // --- r20: the CURRENT window-pass shape of
    // verifiedClusterAssignment, stage by stage (the D/E join-back
    // stages above are the r18 shapes, kept for comparison) ---
    import org.apache.spark.sql.expressions.Window
    val mh2 = graft.Tables.parallelized(docs)
      .select($"doc_id", PortableLsh.wordBaseHashes($"text").as("x"))
      .select($"doc_id", PortableLsh.minhashArray($"x").as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("W0 mh2 persist+count")(mh2.count())
    val cand2 = mh2.select($"doc_id".as("id"), $"m",
      explode(PortableLsh.bucketArrayFromSigs($"m",
        PortableLsh.RowsPerBand)).as("bucket"))
    time("W1 bucket explode")(noop(cand2))
    val wb2 = Window.partitionBy($"bucket").orderBy($"id")
    val ver2 = cand2
      .withColumn("hub", first($"id").over(wb2))
      .withColumn("hm", first($"m").over(wb2))
      .filter($"id" =!= $"hub")
      .filter(org.apache.spark.sql.functions.call_function(
        "arr_eq_count", $"hm", $"m") >= PortableLsh.VerifyAgree)
      .select($"id", $"hub").distinct()
    time("W2 window-verified edges")(noop(ver2))
    val edges2 = ver2.select($"id", $"hub".cast("string").as("bucket"))
      .unionByName(docs.select($"doc_id".as("id"),
        $"doc_id".cast("string").as("bucket")))
    val assign2 = time("W3 fixpoint (current)")(
      graft.queries.Clustering.propagateToFixpoint(edges2, maxIters = 20,
        requireConverged = true).select($"id", $"cluster"))
    time("W4 assignment noop")(noop(assign2))
    time("W5 assignment orderBy noop")(noop(assign2.orderBy($"id")))
    mh2.unpersist()
    spark.stop()
  }
}
