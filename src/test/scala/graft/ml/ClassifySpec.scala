package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // vocabulary-separable corpus: fruit-language vs animal-language.
  // doc_id % 5 == 0 rows are the held-out fold.
  private def corpus = Seq(
    (1L, "fruit", "apple banana cherry apple"),
    (2L, "fruit", "banana cherry banana apple"),
    (3L, "animal", "dog emu fox dog"),
    (4L, "animal", "fox dog emu emu"),
    (0L, "fruit", "apple apple banana"),
    (5L, "animal", "emu fox dog"),
    (10L, "fruit", "cherry banana plum") // plum unseen in training
  ).toDF("doc_id", "lang", "text")

  test("held-out docs are classified by vocabulary, smoothing absorbs " +
      "unseen words, and only the held-out fold is scored") {
    val out = Classify.naiveBayes(corpus).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 5L, 10L),
      "exactly the doc_id % 5 == 0 fold is predicted")
    assert(out.forall(r => r.getString(2) === r.getString(1)),
      "separable vocabularies classify correctly, incl. the " +
        "unseen-word doc")
    assert(out.forall(_.getInt(4) === 1))
  }

  test("scores match the hand-computed add-one-smoothed log-likelihood") {
    val out = Classify.naiveBayes(corpus)
      .filter(col("doc_id") === 0L).collect()(0)
    // training: fruit docs 1,2 (8 tokens: apple*3 banana*3 cherry*2),
    // animal docs 3,4 (8 tokens: dog*3 emu*3 fox*2); V = 6.
    // doc 0 = apple apple banana; winner is fruit:
    //   ln(2/4) + 2*ln((3+1)/(8+6)) + 1*ln((3+1)/(8+6))
    val expected = math.log(2.0 / 4.0) + 3 * math.log(4.0 / 14.0)
    assert(out.getString(2) === "fruit")
    assert(math.abs(out.getDouble(3) -
      math.rint(expected * 1e6) / 1e6) < 1e-9)
  }

  test("an ambiguous doc tie-breaks to the lexicographically first " +
      "label at equal rounded score") {
    // symmetric training, held-out doc with one word from each side:
    // both labels score identically, so 'animal' < 'fruit' wins
    val sym = Seq(
      (1L, "fruit", "apple banana"),
      (2L, "animal", "dog emu"),
      (0L, "fruit", "apple dog")
    ).toDF("doc_id", "lang", "text")
    val r = Classify.naiveBayes(sym).collect()(0)
    assert(r.getString(2) === "animal")
  }

  /** Independent naive full-batch GD on standardized x, mirroring the
    * operator's update rule exactly (population stddev, mean
    * gradient, lr sweep).
    */
  private def naiveLogit(xy: Seq[(Double, Double)], steps: Int,
      lr: Double): (Double, Double, Double, Double) = {
    val n = xy.length
    val mu = xy.map(_._1).sum / n
    val sd = math.max(
      math.sqrt(xy.map(p => (p._1 - mu) * (p._1 - mu)).sum / n), 1e-12)
    val std = xy.map { case (x, y) => ((x - mu) / sd, y) }
    var w0 = 0.0; var w1 = 0.0
    for (_ <- 1 to steps) {
      val ps = std.map { case (x, y) =>
        (1.0 / (1.0 + math.exp(-(w0 + w1 * x))) - y, x) }
      w0 -= lr * ps.map(_._1).sum / n
      w1 -= lr * ps.map(p => p._1 * p._2).sum / n
    }
    val loss = std.map { case (x, y) =>
      val p = 1.0 / (1.0 + math.exp(-(w0 + w1 * x)))
      -(y * math.log(math.max(p, 1e-15)) +
        (1 - y) * math.log(math.max(1 - p, 1e-15)))
    }.sum / n
    val acc = std.count { case (x, y) =>
      (1.0 / (1.0 + math.exp(-(w0 + w1 * x))) >= 0.5) == (y == 1.0)
    }.toDouble / n
    (w0, w1, loss, acc)
  }

  test("logistic GD matches an independent naive implementation and " +
      "separates a separable feature") {
    val xy = Seq(1.0 -> 0.0, 2.0 -> 0.0, 3.0 -> 0.0, 4.0 -> 0.0,
      7.0 -> 1.0, 8.0 -> 1.0, 9.0 -> 1.0, 11.0 -> 1.0)
    val df = xy.toDF("x", "label")
    val got = Classify.logisticRegression(df, "label", Seq("x"),
      steps = 50, lr = 1.0).collect()(0)
    val (w0, w1, loss, acc) = naiveLogit(xy, 50, 1.0)
    assert(got.getLong(0) === 8L)
    assert(math.abs(got.getDouble(1) - w0) < 1e-5, "w0")
    assert(math.abs(got.getDouble(2) - w1) < 1e-5, "w1")
    assert(math.abs(got.getAs[Double]("log_loss") - loss) < 1e-5,
      "log_loss")
    assert(got.getAs[Double]("accuracy") === 1.0,
      "separable data classifies fully")
    assert(got.getDouble(2) > 0, "positive slope on the positive class")
    // the model row is serving-ready: mu/sd are the training moments
    val mu = xy.map(_._1).sum / xy.size
    val sd = math.sqrt(xy.map(x => (x._1 - mu) * (x._1 - mu)).sum / xy.size)
    assert(math.abs(got.getAs[Double]("mu_x") - mu) < 1e-5, "mu")
    assert(math.abs(got.getAs[Double]("sd_x") - sd) < 1e-5, "sd")
  }

  test("logisticScore applies the rounded model row exactly: hand " +
      "sigmoid, threshold at 0.5, and fit->score round-trips the " +
      "training accuracy") {
    val xy = Seq(1.0 -> 0.0, 2.0 -> 0.0, 3.0 -> 0.0, 4.0 -> 0.0,
      7.0 -> 1.0, 8.0 -> 1.0, 9.0 -> 1.0, 11.0 -> 1.0)
    val df = xy.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "label")
    // hand model: p = sigmoid(0.5 + 2*(x-5)/2)
    val got = Classify.logisticScore(df, "id", 0.5,
        Seq(("x", 2.0, 5.0, 2.0)))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    xy.zipWithIndex.foreach { case ((x, _), i) =>
      val p = 1.0 / (1.0 + math.exp(-(0.5 + 2.0 * (x - 5.0) / 2.0)))
      val pr = BigDecimal(p).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(i)._2 === pr, s"p at x=$x")
      assert(got(i)._3 === (if (p >= 0.5) 1 else 0), s"pred at x=$x")
    }
    // serving the fit's own rounded row reproduces training accuracy
    val fit = Classify.logisticRegression(df, "label", Seq("x"),
      steps = 50, lr = 1.0).head()
    val scored = Classify.logisticScore(df, "id", fit.getAs[Double]("w0"),
        Seq(("x", fit.getAs[Double]("w1"), fit.getAs[Double]("mu_x"),
          fit.getAs[Double]("sd_x"))))
      .orderBy("id").collect().map(_.getInt(2))
    val acc = xy.zip(scored)
      .count { case ((_, y), pr) => pr.toDouble == y } / 8.0
    assert(acc === fit.getAs[Double]("accuracy"))
  }

  test("a zero-variance feature fits the base rate without NaN") {
    val df = Seq(5.0 -> 1.0, 5.0 -> 1.0, 5.0 -> 1.0, 5.0 -> 0.0)
      .toDF("x", "label")
    val got = Classify.logisticRegression(df, "label", Seq("x"),
      steps = 30, lr = 1.0).collect()(0)
    // x standardizes to all-zero, so w1 never moves and the intercept
    // converges toward logit(0.75)
    assert(got.getDouble(2) === 0.0)
    assert(!got.getAs[Double]("log_loss").isNaN &&
      !got.getDouble(1).isNaN)
    assert(math.abs(got.getDouble(1) - math.log(3.0)) < 0.3)
    assert(got.getAs[Double]("accuracy") === 0.75)
    // the model row stays serving-safe: sd rounds to 0.0, and
    // logisticScore must SKIP the degenerate term (its standardized
    // value was identically 0 in the fit), never divide by the zero
    // literal — which would NULL every prediction (r11 review)
    assert(got.getAs[Double]("sd_x") === 0.0)
    val scored = Classify.logisticScore(
      Seq((1L, 5.0)).toDF("id", "x"), "id",
      got.getDouble(1), Seq(("x", got.getDouble(2),
        got.getAs[Double]("mu_x"), got.getAs[Double]("sd_x")))).head()
    val expP = 1.0 / (1.0 + math.exp(-got.getDouble(1)))
    assert(math.abs(scored.getDouble(1) - expP) < 1e-6,
      "zero-variance model must score as intercept-only")
    assert(scored.getInt(2) === (if (expP >= 0.5) 1 else 0))
  }

  test("a tiny-but-nonzero feature variance is refused at fit time " +
      "(it would round to sd = 0.0 in the model row and serve as a " +
      "silently dropped live term)") {
    // sd ≈ 2.5e-8: live standardized values in the fit, but the 6 dp
    // model row would carry sd_x = 0.0 and logisticScore would skip
    // the term — the r11 advice divergence. The fit must fail loudly
    // with the pre-scale remedy instead.
    val df = Seq(5.0 -> 1.0, 5.00000005 -> 1.0, 5.0 -> 0.0,
      5.00000005 -> 0.0).toDF("x", "label")
    val e = intercept[IllegalArgumentException] {
      Classify.logisticRegression(df, "label", Seq("x"), steps = 1)
    }
    assert(e.getMessage.contains("pre-scale"))
    // and the same data pre-scaled fits fine
    val ok = Classify.logisticRegression(
      df.withColumn("x", (col("x") - 5.0) * 1e8), "label", Seq("x"),
      steps = 1).collect()(0)
    assert(!ok.getAs[Double]("log_loss").isNaN)
  }

  test("nearestCentroid classifies planted clusters, excludes " +
      "degenerate vectors from fit and predict, and matches a " +
      "hand-computed cosine") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1),
      (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(0.0f, 0.0f), 1) // zero norm: must not dilute label 1
    ).toDF("vec_id", "embedding", "label")
    val test_ = Seq(
      (10L, Seq(0.8f, 0.2f), 0),
      (11L, Seq(0.2f, 0.8f), 1),
      (12L, Seq(Float.NaN, 1.0f), 0) // NaN norm: absent from output
    ).toDF("vec_id", "embedding", "label")
    val got = Classify.nearestCentroid(train, test_)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3))).toSeq
    assert(got.map(x => (x._1, x._3)) === Seq((10L, 0), (11L, 1)))
    // hand cosine of vec 11 against the label-1 centroid — which is
    // the mean of (0,1) and (0.1,0.9) ONLY (the zero vector excluded):
    // (0.05, 0.95). The float inputs are exact in binary? 0.1f/0.9f
    // are not — recompute through the same float->double path.
    val c = Array((0.0f.toDouble + 0.1f.toDouble) / 2,
      (1.0f.toDouble + 0.9f.toDouble) / 2)
    val e = Array(0.2f.toDouble, 0.8f.toDouble)
    val cos = (e(0) * c(0) + e(1) * c(1)) /
      (math.sqrt(e(0) * e(0) + e(1) * e(1)) *
        math.sqrt(c(0) * c(0) + c(1) * c(1)))
    val expect = BigDecimal(cos).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.find(_._1 == 11L).get._4 === expect)
  }

  test("nearestCentroid breaks exact cosine ties on the smaller label") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f), 7),
      (2L, Seq(0.0f, 1.0f), 3)).toDF("vec_id", "embedding", "label")
    val test_ = Seq((9L, Seq(1.0f, 1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val got = Classify.nearestCentroid(train, test_).head()
    // cos = 1/sqrt(2) against BOTH prototypes -> label 3 wins the tie
    assert(got.getInt(2) === 3)
  }
}
