package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the logistic/fastText-style quality
  * filter stage of LLM data pipelines (weak labels in, per-document keep
  * probability out), over the columnar `TextStats.qualityFeatures`.
  *
  * Scale shape: TRAINING runs on a bounded labeled sample through spark.ml
  * (`LogisticRegression` on the assembled feature vector); the fitted
  * coefficients come back to the driver as plain numbers. SCORING of the full
  * corpus is pure columnar arithmetic — sigmoid(b + w·x) built from literal
  * weights over the same feature expressions, fully codegen'd: no ml
  * Transformer, no vector column, no UDF anywhere in the 100 TB pass. The
  * corpus-wide stage is therefore one linear projection, and the ml dependency
  * is quarantined to the sample-sized fit.
  */
object QualityModel {

  /** Feature order is the weight-vector order (stable contract). */
  val FEATURES: Seq[String] =
    Seq("avg_word_len", "punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio")

  final case class Weights(bias: Double, w: Seq[Double]) {
    require(w.length == FEATURES.length, s"need ${FEATURES.length} weights")
  }

  /** Hand-set interpretable default: stopword-rich prose up, digit/punct spam down.
    * (The trained path replaces these; the default keeps scoring usable — and
    * externally reproducible — without a labeled sample.)
    */
  val DEFAULT: Weights = Weights(bias = -1.0,
    w = Seq(0.1, -8.0, -6.0, -2.0, 6.0))

  /** Fit logistic-regression weights on a LABELED sample (labelCol ∈ {0, 1}).
    * The sample is expected to be bounded (collected coefficients only — the
    * fit itself is distributed but sample-sized).
    */
  def train(labeled: DataFrame, idCol: String, textCol: String, labelCol: String,
            maxIter: Int = 50, regParam: Double = 0.0): Weights = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val feats = TextStats.qualityFeatures(labeled, idCol, textCol)
      .join(labeled.select(col(idCol), col(labelCol)), idCol)
    val assembled = new VectorAssembler()
      .setInputCols(FEATURES.toArray).setOutputCol("__fv")
      .setHandleInvalid("skip")
      .transform(feats)
    val m = new LogisticRegression()
      .setFeaturesCol("__fv").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(assembled)
    Weights(m.interceptVector(0), m.coefficientMatrix.rowIter.next().toArray.toSeq)
  }

  /** sigmoid(b + w·x) as a single codegen'd Column over the feature columns. */
  private def sigmoidCol(wts: Weights): Column = {
    val z = FEATURES.zip(wts.w).foldLeft(lit(wts.bias)) {
      case (acc, (f, wi)) => acc + lit(wi) * col(f)
    }
    lit(1.0d) / (lit(1.0d) + exp(-z))
  }

  /** Corpus-wide scoring pass: (id, quality probability). Pure projection. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            wts: Weights = DEFAULT): DataFrame =
    TextStats.qualityFeatures(docs, idCol, textCol)
      .select(col(idCol), sigmoidCol(wts).as("prob"))
}
