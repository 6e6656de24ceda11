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
}
