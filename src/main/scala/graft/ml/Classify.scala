package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised text classification as distributed algebra — the model
  * "training" here IS an aggregation plan, so the same engine that
  * cleans and dedups a corpus (reference anchor: the cleaned item
  * text PodioConnector.py:96 ships downstream) can also fit and apply
  * the baseline classifiers those pipelines use for labeling and
  * routing.
  */
object Classify {

  /** Multinomial Naive Bayes with add-one smoothing, trained and
    * applied in one plan: documents whose `doc_id % holdoutMod != fold`
    * train per-label word counts, and each held-out document is
    * assigned the label maximizing ln P(label) + Σ k_w · ln P(w|label).
    *
    * The model is three aggregates — c(w, l) word-label counts, N_l
    * label totals, and V distinct train words — so "fit" ships one
    * groupBy of hashed words and "predict" is a broadcast of the
    * |labels|-row stats frame against the held-out docs' word counts,
    * left-joined to c(w, l) so unseen words fall to the smoothing
    * floor ln(1/(N_l+V)). No iteration, no driver-side state: at
    * 100 TB both phases are the same shuffles the dedup operators
    * already do (8-byte word hashes, never text).
    *
    * Scores are rounded to 6 dp BEFORE the per-doc argmax and the
    * argmax tie-breaks on label, so the winner is cross-engine
    * deterministic even when two labels score within an ulp (the
    * unrounded-double ordering hazard q66 taught the registry).
    */
  def naiveBayes(docs: DataFrame, labelCol: String = "lang",
      holdoutMod: Int = 5, fold: Int = 0): DataFrame = {
    require(holdoutMod > 1 && fold >= 0 && fold < holdoutMod,
      "need a non-trivial holdout split")
    val words = docs.select(col("doc_id"), col(labelCol).as("l"),
        explode(split(col("text"), " ")).as("w"))
      // same tokenization contract as Bpe.learn: irregular whitespace
      // must not mint a bogus "" vocabulary word that shifts V and N_l
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("l"), HashUtils.hash60(col("w")).as("h"))
    val isTest = col("doc_id") % holdoutMod === fold
    val cl = words.filter(!isTest)
      .groupBy(col("l"), col("h")).agg(count(lit(1)).as("c"))
    val nl = cl.groupBy(col("l")).agg(sum(col("c")).as("n_l"))
    val v = cl.select(col("h")).distinct().agg(count(lit(1)).as("v"))
    val pri = docs.filter(!isTest)
      .groupBy(col(labelCol).as("l")).agg(count(lit(1)).as("dl"))
    val dt = pri.agg(sum(col("dl")).as("dt"))
    val labels = pri.join(nl, Seq("l"))
      .crossJoin(broadcast(v)).crossJoin(broadcast(dt))
    val dw = words.filter(isTest)
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("k"))
    val scored = dw.crossJoin(broadcast(labels))
      .join(cl, Seq("l", "h"), "left")
      .groupBy(col("doc_id"), col("l"), col("dl"), col("dt"),
        col("n_l"), col("v"))
      .agg(sum(col("k") * log(
        (coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n_l") + col("v")).cast("double"))).as("ll"))
      .select(col("doc_id"), col("l"),
        round(log(col("dl").cast("double") / col("dt").cast("double")) +
          col("ll"), 6).as("score"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("l"))
    scored.withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .join(docs.select(col("doc_id"), col(labelCol).as("actual")),
        Seq("doc_id"))
      .select(col("doc_id"), col("actual"), col("l").as("predicted"),
        col("score"),
        (col("l") === col("actual")).cast("int").as("hit"))
  }

  /** Binary logistic regression by full-batch gradient descent — the
    * iterative-optimization counterpart of the closed-form OLS tier
    * (q89): each step is ONE aggregate pass computing the mean
    * gradient ∂/∂w of the log-loss with the CURRENT coefficients
    * inlined as plan literals, so unlike the BPE loop the plan never
    * grows — no checkpointing needed, the data is scanned as-is every
    * step (cache it upstream for a real run) and only the
    * (#features+1)-value gradient row reaches the driver.
    *
    * Features are standardized in-plan from one preliminary
    * mean/stddev aggregate (zero-variance features guard to a unit
    * divisor instead of dividing by zero). The returned single row
    * carries the fitted coefficients ON THE STANDARDIZED scale, the
    * standardization moments (mu_f, sd_f per feature — without them
    * the coefficients cannot score anything, so the model row is
    * self-contained for [[logisticScore]]) plus training log-loss and
    * accuracy at threshold 0.5. Everything rounds to 6 dp, so a
    * serving chain built on the ROUNDED row is cross-engine
    * restatable (q99b pins exactly that).
    */
  def logisticRegression(data: DataFrame, labelCol: String,
      features: Seq[String], steps: Int = 15, lr: Double = 1.0)
      : DataFrame = {
    require(features.nonEmpty && steps > 0 && lr > 0,
      "need features, steps > 0, lr > 0")
    val y = col(labelCol).cast("double")
    // bounded driver action: one row of 2·k moments
    val mo = data.agg(
      count(lit(1)).cast("long").as("n"),
      features.flatMap(f => Seq(
        avg(col(f)).as(s"mu_$f"),
        stddev_pop(col(f)).as(s"sd_$f"))): _*).head()
    val n = mo.getLong(0)
    require(n > 0, "cannot fit on an empty dataset")
    val xs = features.zipWithIndex.map { case (f, i) =>
      // a NULL moment means the feature column held no non-null value
      // — fail with the column name instead of an opaque NPE below
      require(!mo.isNullAt(1 + 2 * i),
        s"feature '$f' has no non-null values")
      val mu = mo.getDouble(1 + 2 * i)
      val sdTrue = mo.getDouble(2 + 2 * i)
      // the model row rounds sd to 6 dp (the gated-output contract),
      // so a tiny variance serves with a DIFFERENT standardization
      // scale than it fit with — rounds-to-zero drops the term
      // entirely (the r11 advice finding), and a barely-surviving sd
      // like 5.5e-7 rounds to 1e-6, silently halving the term's
      // contribution (the r12 review's follow-up). Refuse the whole
      // class: any sd whose 6 dp round diverges > 0.5% relative
      // needs pre-scaling so it carries ≥ 3 significant digits. An
      // exactly-constant feature (sd = 0) is fine — its standardized
      // value is identically 0, the weight never moves, and
      // serving's skip matches the fit.
      val sdRounded = BigDecimal(sdTrue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      require(sdTrue == 0.0 ||
        math.abs(sdRounded - sdTrue) <= 0.005 * sdTrue,
        s"feature '$f' has sd $sdTrue, which the 6 dp model row " +
          s"rounds to $sdRounded (> 0.5% relative error) — the " +
          "served model would silently standardize on a different " +
          "scale than the fit; pre-scale the feature so its sd " +
          "carries at least three significant digits at 6 dp")
      val sd = math.max(sdTrue, 1e-12)
      (col(f).cast("double") - lit(mu)) / lit(sd)
    }
    var w = Array.fill(features.length + 1)(0.0)
    def margin(wv: Array[Double]) =
      xs.zipWithIndex.foldLeft(lit(wv(0)): org.apache.spark.sql.Column) {
        case (acc, (x, i)) => acc + lit(wv(i + 1)) * x
      }
    var step = 0
    while (step < steps) {
      val p = lit(1.0) / (lit(1.0) + exp(-margin(w)))
      val err = p - y
      val g = data.agg(avg(err).as("g0"),
        xs.zipWithIndex.map { case (x, i) =>
          avg(err * x).as(s"g${i + 1}") }: _*).head()
      w = w.indices.map(i => w(i) - lr * g.getDouble(i)).toArray
      step += 1
    }
    val p = lit(1.0) / (lit(1.0) + exp(-margin(w)))
    val eps = lit(1e-15) // clamp keeps the loss finite at p → 0/1
    val out = data.agg(
      avg(-(y * log(greatest(p, eps)) +
        (lit(1.0) - y) * log(greatest(lit(1.0) - p, eps))))
        .as("log_loss"),
      avg(when((p >= 0.5) === (y === 1.0), 1.0).otherwise(0.0))
        .as("accuracy"))
    out.select(
      (lit(n).as("n") +: w.toSeq.zipWithIndex.map { case (v, i) =>
        round(lit(v), 6).as(s"w$i") } :++
        features.zipWithIndex.flatMap { case (f, i) => Seq(
          round(lit(mo.getDouble(1 + 2 * i)), 6).as(s"mu_$f"),
          round(lit(math.max(mo.getDouble(2 + 2 * i), 1e-12)), 6)
            .as(s"sd_$f")) } :+
        round(col("log_loss"), 6).as("log_loss") :+
        round(col("accuracy"), 6).as("accuracy")): _*)
  }

  /** Score rows with a fitted logistic model — the serving half of
    * [[logisticRegression]]: p = σ(w0 + Σ wᵢ·(xᵢ−muᵢ)/sdᵢ) with the
    * model values as plan literals (map-only, no shuffle, whole-stage
    * codegen — the broadcast-model-apply shape every scoring pass at
    * 100 TB wants). `model` pairs each feature with its
    * (weight, mu, sd) from the fit's ROUNDED output row, so the
    * scored probabilities are a pure deterministic function of
    * (data, rounded model) and the whole chain restates in SQL —
    * q99b gates fit → score end to end on the pinned sf0.01
    * literals. Output adds (p, pred) to the id column given.
    */
  def logisticScore(data: DataFrame, idCol: String, intercept: Double,
      model: Seq[(String, Double, Double, Double)]): DataFrame = {
    require(model.nonEmpty, "need at least one feature")
    val margin = model.foldLeft(lit(intercept)
        : org.apache.spark.sql.Column) {
      // a zero-variance feature rounds its sd to 0.0 in the model row
      // (the fit floors it at 1e-12 internally, below the 6 dp
      // round); the fit REFUSES tiny-but-nonzero variances that
      // would round to 0.0, so sd <= 0.0 here can only mean a
      // genuinely constant feature: its standardized value was
      // identically 0 during the fit and its weight never moved, so
      // the serving-side contract is "contributes nothing" —
      // skipping the term entirely, never a division by the zero
      // literal (which would NULL every margin, not just the
      // degenerate feature's share)
      case (acc, (_, _, _, sd)) if sd <= 0.0 => acc
      case (acc, (f, wi, mu, sd)) =>
        acc + lit(wi) * ((col(f).cast("double") - lit(mu)) / lit(sd))
    }
    val p = lit(1.0) / (lit(1.0) + exp(-margin))
    data.select(col(idCol), round(p, 6).as("p"),
      (p >= 0.5).cast("int").as("pred"))
  }

  /** Nearest-centroid (Rocchio) classification over embeddings: fit =
    * per-label mean-pooled prototypes ([[Similarity.centroidsByKey]]
    * on the train split), predict = cosine argmax of each test vector
    * against the |labels|-row broadcast prototype frame. Inputs need
    * (vec_id, embedding, label); output is one row per test vector:
    * (vec_id, true_label, pred_label, cos).
    *
    * Shape at 100 TB: train collapses to |labels|·dim partial averages
    * (the centroidsByKey shuffle), the prototype frame is model-sized
    * and broadcasts, and predict is a map-only codegen-dot pass over
    * the test vectors — no test-side shuffle at all until a consumer
    * aggregates. Cosines round to 6 dp BEFORE the argmax and ties
    * break on label, so the winner is cross-engine deterministic (the
    * naiveBayes argmax discipline). Degenerate vectors (zero/NaN/Inf
    * norm) are excluded on BOTH sides: a broken embedding must not
    * poison a prototype or rank first via NaN ordering.
    */
  def nearestCentroid(train: DataFrame, test: DataFrame): DataFrame = {
    def finite(df: DataFrame): DataFrame = {
      val nrm = sqrt(graft.functions.VectorFunctions.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")))
      df.withColumn("_nrm", nrm)
        .filter(Similarity.finitePositiveNorm(col("_nrm")))
    }
    val cents = Similarity.centroidsByKey(
        finite(train).drop("_nrm"), "label")
      .select(col("key"), col("centroid"),
        sqrt(graft.functions.VectorFunctions.dot(col("centroid"), col("centroid")))
          .as("cnorm"))
      // a label whose finite train vectors AVERAGE to the zero vector
      // has a directionless prototype: its cosine is 0/0 = NaN, and
      // NaN orders above every double, so it would win rank 1 for
      // every test row. Cosine-Rocchio has no answer for such a label
      // — exclude the prototype (same rule as the per-vector guard)
      .filter(Similarity.finitePositiveNorm(col("cnorm")))
    val te = finite(test).select(col("vec_id"),
      col("label").as("true_label"),
      col("embedding").cast("array<double>").as("e"), col("_nrm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("key"))
    te.crossJoin(broadcast(cents))
      .withColumn("cos", round(graft.functions.VectorFunctions.dot(col("e"), col("centroid"))
        / (col("_nrm") * col("cnorm")), 6))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("vec_id"), col("true_label"),
        col("key").as("pred_label"), col("cos"))
  }
}
