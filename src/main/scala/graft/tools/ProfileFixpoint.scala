package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev profiler: phase-by-phase timing of the r20 contracted fixpoint
  * against the r19 uncontracted one, on the sim_embed_neardup_full
  * edge list. Usage: runMain graft.tools.ProfileFixpoint [sfDir]
  */
object ProfileFixpoint {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("profile-fixpoint")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }

    // the sim_embed_neardup_full edge list (hyperplane band buckets)
    val edges = graft.queries.Similarity.neardupEdges(spark, dir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("edges persist+count")(edges.count())

    for (pass <- 1 to 3) {
      // pass 3: every materialization is a localCheckpoint (flat
      // LogicalRDD leaf) instead of persist (nested InMemoryRelation
      // whose plan embeds the full child — replanned per action)
      val ckpt = pass == 3
      def mat(df: DataFrame): DataFrame =
        if (ckpt) df.localCheckpoint()
        else df.persist(StorageLevel.MEMORY_AND_DISK)
      val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val eById = mat(edges.select($"id", $"bucket")
        .repartition(nParts, $"id"))
      val eByBucket = mat(eById.repartition(nParts, $"bucket"))
      def round(ed1: DataFrame, ed2: DataFrame)(ls: DataFrame): DataFrame = {
        val bucketMin = ed1.join(ls.hint("shuffle_hash"), "id")
          .groupBy("bucket").agg(min("cluster").as("bmin"))
        ed2.join(bucketMin.hint("shuffle_hash"), "bucket")
          .groupBy("id").agg(min("bmin").as("cluster"))
      }
      def init(eb: DataFrame): DataFrame = eb.join(
          eb.groupBy($"bucket").agg(min($"id").as("bmin"))
            .hint("shuffle_hash"), "bucket")
        .groupBy($"id").agg(min($"bmin").as("cluster"))
      def sumOnce(label: String)(df: DataFrame): (DataFrame, Long) = {
        val obs = new org.apache.spark.sql.Observation
        val m = mat(df.observe(obs, sum($"cluster").as("s")))
        time(label)(m.count())
        val s = obs.get("s").asInstanceOf[Long]
        (m, s)
      }
      val r = round(eById, eByBucket) _
      var (labels, prevSum) =
        sumOnce(s"p$pass full init (3 rounds)")(r(r(init(eByBucket))))

      // contracted path
      val cEdges = eById.join(labels.hint("shuffle_hash"), "id")
        .select($"cluster".as("id"), $"bucket").distinct()
      val cById = time(s"p$pass cById persist") {
        val f = mat(cEdges.repartition(nParts, $"id"))
        f.count(); f
      }
      val cByBucket = time(s"p$pass cByBucket persist") {
        val f = mat(cById.repartition(nParts, $"bucket"))
        f.count(); f
      }
      val cr = round(cById, cByBucket) _
      var (cLabels, cPrev) =
        sumOnce(s"p$pass contracted init (3 rounds)")(cr(cr(init(cByBucket))))
      var it = 1
      var converged = false
      while (!converged && it < 10) {
        val (next, nextSum) =
          sumOnce(s"p$pass contracted double round $it")(cr(cr(cLabels)))
        converged = nextSum == cPrev
        cPrev = nextSum
        cLabels.unpersist()
        cLabels = next
        it += 1
      }
      time(s"p$pass reattach join NOHINT") {
        labels.join(
          cLabels.select($"id".as("cluster"), $"cluster".as("cmin")),
          "cluster")
          .select($"id", $"cmin".as("cluster")).count()
      }
      val out = time(s"p$pass reattach join") {
        val f = mat(labels.join(
          cLabels.select($"id".as("cluster"), $"cluster".as("cmin"))
            .hint("shuffle_hash"), "cluster")
          .select($"id", $"cmin".as("cluster")))
        f.count(); f
      }
      if (pass == -1) {
        System.err.println("[plan] reattach executedPlan:\n" +
          out.queryExecution.executedPlan.toString.take(6000))
        val dbl = cr(cr(cLabels))
        System.err.println("[plan] contracted double-round analyzed-with-cache:\n" +
          dbl.queryExecution.withCachedData.toString.take(6000))
      }

      // uncontracted tail for comparison (the r19 shape)
      var (l2, s2) = sumOnce(s"p$pass UNCONTRACTED init (3 rounds)")(
        r(r(init(eByBucket))))
      var it2 = 1
      var conv2 = false
      while (!conv2 && it2 < 10) {
        val (next, nextSum) =
          sumOnce(s"p$pass UNCONTRACTED double round $it2")(r(r(l2)))
        conv2 = nextSum == s2
        s2 = nextSum
        l2.unpersist()
        l2 = next
        it2 += 1
      }
      Seq(eById, eByBucket, cById, cByBucket, labels, cLabels, out, l2)
        .foreach(_.unpersist())
    }
    spark.stop()
  }
}
