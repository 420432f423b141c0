package graft

import graft.functions.{CentroidBuffer, EvalPredsBuffer, MlModel, RegressorBuffer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit coverage for the presto-ml tier's pure cores: OLS normal
  * equations, centroid classify, the distributed-merge invariants the
  * aggregates rely on, and the evaluate summary format
  * (EvaluateClassifierPredictionsAggregation.java:100-118). */
class MlSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("learn_libsvm_* aliases are SQL-callable and train the same models") {
    val row = spark.sql(
      """WITH t AS (SELECT * FROM VALUES (1.0D, 1.0D), (2.0D, 2.0D), (3.0D, 3.0D) v(y, x)),
        |m AS (SELECT learn_libsvm_regressor(y, features(x), 'kernel=linear, C=1') AS r,
        |             learn_libsvm_classifier(CAST(y >= 2 AS INT), features(x), '') AS c
        |      FROM t)
        |SELECT round(regress(features(2.5D), r), 6) AS pred,
        |       classify(features(2.9D), c) AS cls
        |FROM m""".stripMargin).head()
    row.getDouble(0) shouldBe 2.5 +- 1e-9 // exact fit y = x
    row.getLong(1) shouldBe 1L // nearer the y>=2 centroid
  }

  test("learn_libsvm_* validates the params string with the reference grammar") {
    import graft.functions.GraftFunctions.validateLibsvmParams
    // the reference's full key set parses
    validateLibsvmParams("kernel=rbf, degree=3, gamma=0.5, coef0=0, C=10, nu=0.5, eps=0.01")
    validateLibsvmParams("") // empty = all defaults
    // same failures the reference raises (LibSvmUtils.parseParameters)
    an[IllegalArgumentException] should be thrownBy
      validateLibsvmParams("unknown_key=1")
    an[IllegalArgumentException] should be thrownBy
      validateLibsvmParams("not a pair")
    an[IllegalArgumentException] should be thrownBy
      validateLibsvmParams("kernel=quantum")
    a[NumberFormatException] should be thrownBy
      validateLibsvmParams("C=abc")
    // plan-time rejection through the SQL surface for literal params
    val e = intercept[Exception] {
      spark.sql("SELECT learn_libsvm_regressor(y, features(x), 'bogus=1') " +
        "FROM VALUES (1.0D, 1.0D) v(y, x)").collect()
    }
    e.getMessage should include("Unknown parameter")
  }

  test("OLS recovers an exact linear relationship") {
    val buf = new RegressorBuffer(0)
    // y = 3 + 2*x0 - 0.5*x1, exactly
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val x0 = rng.nextInt(100).toDouble
      val x1 = rng.nextInt(50).toDouble
      buf.add(3.0 + 2.0 * x0 - 0.5 * x1, Array(x0, x1))
    }
    val MlModel.Regressor(w, b) = MlModel.deserialize(buf.toModel)
    b shouldBe 3.0 +- 1e-9
    w(0) shouldBe 2.0 +- 1e-9
    w(1) shouldBe -0.5 +- 1e-9
  }

  test("regressor merge(serialize) equals single-pass accumulation") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(60)((rng.nextDouble() * 10,
      Array(rng.nextDouble(), rng.nextDouble(), rng.nextDouble())))
    val whole = new RegressorBuffer(0)
    rows.foreach { case (y, x) => whole.add(y, x) }
    val a = new RegressorBuffer(0)
    val bb = new RegressorBuffer(0)
    rows.take(25).foreach { case (y, x) => a.add(y, x) }
    rows.drop(25).foreach { case (y, x) => bb.add(y, x) }
    val merged = RegressorBuffer.deserialize(a.serialize())
    merged.mergeWith(RegressorBuffer.deserialize(bb.serialize()))
    merged.n shouldBe whole.n
    val MlModel.Regressor(w1, b1) = MlModel.deserialize(whole.toModel)
    val MlModel.Regressor(w2, b2) = MlModel.deserialize(merged.toModel)
    b2 shouldBe b1 +- 1e-9
    w1.zip(w2).foreach { case (p, q) => q shouldBe p +- 1e-9 }
  }

  test("dependent (all-zero) feature column gets weight 0, not a failure") {
    val buf = new RegressorBuffer(0)
    for (i <- 1 to 20) buf.add(2.0 * i, Array(i.toDouble, 0.0))
    val MlModel.Regressor(w, b) = MlModel.deserialize(buf.toModel)
    w(0) shouldBe 2.0 +- 1e-9
    w(1) shouldBe 0.0
    b shouldBe 0.0 +- 1e-9
  }

  test("centroid classify picks the nearer class; ties break to the smaller label") {
    val buf = new CentroidBuffer
    buf.add("a", Array(0.0, 0.0))
    buf.add("b", Array(10.0, 0.0))
    val m = MlModel.deserialize(buf.toModel).asInstanceOf[MlModel.Classifier]
    m.classify(Array(1.0, 0.0)) shouldBe "a"
    m.classify(Array(9.0, 0.0)) shouldBe "b"
    m.classify(Array(5.0, 0.0)) shouldBe "a" // equidistant → smallest label
  }

  test("classifier merge across shards equals whole-corpus centroids") {
    val whole = new CentroidBuffer
    val s1 = new CentroidBuffer
    val s2 = new CentroidBuffer
    val rng = new scala.util.Random(3)
    for (i <- 1 to 50) {
      val lbl = if (i % 2 == 0) "x" else "y"
      val v = Array(rng.nextDouble(), rng.nextDouble())
      whole.add(lbl, v)
      (if (i <= 25) s1 else s2).add(lbl, v)
    }
    val merged = CentroidBuffer.deserialize(s1.serialize())
    merged.mergeWith(CentroidBuffer.deserialize(s2.serialize()))
    val mw = MlModel.deserialize(whole.toModel).asInstanceOf[MlModel.Classifier]
    val mm = MlModel.deserialize(merged.toModel).asInstanceOf[MlModel.Classifier]
    mm.labels shouldBe mw.labels
    mw.centroids.zip(mm.centroids).foreach { case (p, q) =>
      p.zip(q).foreach { case (x, y) => y shouldBe x +- 1e-12 }
    }
  }

  test("bigint labels order numerically: ties prefer 2 over 10") {
    val buf = new CentroidBuffer
    buf.add("10", Array(0.0))
    buf.add("2", Array(10.0))
    val m = MlModel.deserialize(buf.toModel).asInstanceOf[MlModel.Classifier]
    m.labels.toSeq shouldBe Seq("2", "10") // numeric, not lexicographic
    m.classify(Array(5.0)) shouldBe "2" // equidistant → smallest number
  }

  test("empty model raises a clear error from classify, not an index crash") {
    val m = MlModel.deserialize(new CentroidBuffer().toModel)
      .asInstanceOf[MlModel.Classifier]
    val e = intercept[IllegalArgumentException](m.classify(Array(1.0)))
    e.getMessage should include("zero rows")
  }

  test("tiny-magnitude features are solved, not zeroed as dependent") {
    val buf = new RegressorBuffer(0)
    // y = 1e8 * x with x ~ 1e-8: XtX diagonal ≈ rows × 1e-16, far
    // below any absolute pivot cutoff but perfectly well-conditioned
    for (i <- 1 to 50) buf.add(i.toDouble, Array(i * 1e-8))
    val MlModel.Regressor(w, b) = MlModel.deserialize(buf.toModel)
    w(0) shouldBe 1e8 +- 1.0
    b shouldBe 0.0 +- 1e-6
  }

  test("property: OLS recovers random planted weights across dims and scales") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val d = rng.nextInt(6) + 1
      val unit = math.pow(10, rng.nextInt(9) - 4) // feature units 1e-4 … 1e4
      val wTrue = Array.fill(d)(rng.nextDouble() * 4 - 2)
      val bTrue = rng.nextDouble() * 10 - 5
      val buf = new RegressorBuffer(0)
      for (_ <- 1 to (d * 8 + 20)) {
        val x = Array.fill(d)(rng.nextDouble() * unit)
        val y = bTrue + x.indices.map(i => wTrue(i) * x(i)).sum
        buf.add(y, x)
      }
      val MlModel.Regressor(w, b) = MlModel.deserialize(buf.toModel)
      withClue(s"trial $trial d=$d unit=$unit: ") {
        b shouldBe bTrue +- 1e-6
        w.indices.foreach(i => w(i) * unit shouldBe wTrue(i) * unit +- 1e-6)
      }
    }
  }

  test("evaluate summary matches the reference format exactly") {
    val buf = new EvalPredsBuffer
    // truth, pred over two classes: 3 correct 'a', 1 'a'→'b', 2 correct 'b'
    buf.add("a", "a"); buf.add("a", "a"); buf.add("a", "a")
    buf.add("a", "b")
    buf.add("b", "b"); buf.add("b", "b")
    buf.summary shouldBe
      "Accuracy: 5/6 (83.33%)\n" +
        "Class 'a'\nPrecision: 3/3 (100.00%)\nRecall: 3/4 (75.00%)\n" +
        "Class 'b'\nPrecision: 2/3 (66.67%)\nRecall: 2/2 (100.00%)\n"
  }

  test("evaluate merge equals single-pass counts") {
    val whole = new EvalPredsBuffer
    val p1 = new EvalPredsBuffer
    val p2 = new EvalPredsBuffer
    val rng = new scala.util.Random(5)
    for (i <- 1 to 200) {
      val t = (rng.nextInt(3)).toString
      val p = (rng.nextInt(3)).toString
      whole.add(t, p)
      (if (i % 2 == 0) p1 else p2).add(t, p)
    }
    val merged = EvalPredsBuffer.deserialize(p1.serialize())
    merged.mergeWith(EvalPredsBuffer.deserialize(p2.serialize()))
    merged.summary shouldBe whole.summary
  }

  test("model round-trips through serialize/deserialize and caches decode") {
    val r = MlModel.Regressor(Array(1.5, -2.0), 0.25)
    val bytes = MlModel.serializeRegressor(r)
    val back = MlModel.decodeCached(bytes).asInstanceOf[MlModel.Regressor]
    back.intercept shouldBe 0.25
    back.weights.toSeq shouldBe Seq(1.5, -2.0)
    // cache: same bytes content (even a different array) returns the memo
    val again = MlModel.decodeCached(bytes.clone()).asInstanceOf[MlModel.Regressor]
    again should be theSameInstanceAs back
  }

  test("regress sums only overlapping dims; classify rejects regressor models") {
    val r = MlModel.Regressor(Array(2.0), 1.0)
    r.predict(Array(3.0, 99.0)) shouldBe 7.0 // extra feature ignored
    r.predict(Array.empty[Double]) shouldBe 1.0
    val c = new CentroidBuffer
    c.add("1", Array(1.0))
    val model = MlModel.deserialize(c.toModel)
    model shouldBe a[MlModel.Classifier]
  }
}
