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
}
