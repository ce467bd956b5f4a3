package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * X39 — learned text classification for corpus curation: multinomial
 * Naive Bayes (McCallum & Nigam 1998) over hashed token features, in
 * INTEGER surprisal units so Spark and the SQL oracle compute the
 * identical model and the identical predictions. This is the "learned
 * classifier" stage of a production pipeline (CCNet's fastText
 * language/quality filters — Wenzek et al. 2020, Joulin et al. 2016):
 * train on a labeled split, broadcast a pruned model, score the corpus
 * in one shuffle-light pass.
 *
 * Exactness: −log₂ probabilities are replaced by the engine's integer
 * binary digit-count device (`bitlen(x)` = length of x in binary — the
 * bigramSurprisal/BM25 idf proxy; monotone in the MLE probability, no
 * transcendentals, no float accumulation order). With Laplace add-one
 * smoothing the per-class surprisal of a document d is
 *
 *   surp_c(d) = [bitlen(N) − bitlen(n_c)]                       (prior)
 *             + Σ_t tf_t · (bitlen(T_c) − bitlen(cnt_{t,c} + 1))
 *
 * where n_c = training docs in class c, T_c = (token instances in c) +
 * V (V = distinct training features — the Laplace denominator), and
 * cnt_{t,c} = instances of feature t in class c. Features absent from
 * class c contribute tf·(bitlen(T_c) − 1) (cnt+1 = 1 ⇒ bitlen 1); the
 * scorer uses the algebraic split
 *
 *   surp_c(d) = prior_c + dl·(bitlen(T_c) − 1)
 *             − Σ_{t ∈ model_c ∩ d} tf_t · (bitlen(cnt_{t,c}+1) − 1)
 *
 * so ONLY model hits need joining — the dense absent-feature floor
 * folds into the per-doc dl term. Prediction = argmin surprisal with a
 * deterministic label-ascending tiebreak.
 *
 * Features are [[TextOps.tokenHash]] values (the cross-engine token
 * hash): hashed features ARE the fastText trick — collisions merge
 * counts identically in both engines, and int64 keys keep the model
 * join slim. The model is PRUNED to the `vocabPerClass` highest-count
 * features per class (count-desc, hash-asc tiebreak — a pure function
 * of the corpus) via the native GroupTopK; pruned-out features behave
 * exactly as unseen ones, which is the documented semantics (production
 * classifiers bound their feature table the same way).
 *
 * Scale posture: training is one map-side-combined groupBy(label, h)
 * over the token stream (output is vocabulary-bounded, never
 * corpus-bounded) + a per-class GroupTopK; class totals and the V
 * scalar are O(C) and O(1) aggregates. Classification joins the token
 * stream against the BROADCAST pruned model (≤ C·vocabPerClass rows),
 * partial-aggregates hit sums per (doc, class) map-side, densifies
 * against the O(C) class table, and ranks with GroupTopK k=1 — the
 * corpus crosses the wire once, keyed by doc_id, already collapsed to
 * ≤ C rows per doc. A Zipfian-hot token is NOT a hot key here: the
 * shuffle key is doc_id, never the token.
 */
object NaiveBayes {

  /** Trained-model frames: pruned per-class feature counts, per-class
   * totals, and the corpus-level scalars (all small; `feat` is the only
   * one that grows, bounded by C·vocabPerClass). */
  final case class Model(feat: DataFrame, cls: DataFrame, corpus: DataFrame)

  /** (doc_id, label, h, tf, dl) token-feature stream: per-doc tf
   * computed INSIDE the row via the HashCounts kernel (no
   * groupBy(doc, token) exchange — the BM25 device). */
  private def featureStream(df: DataFrame, idCol: String, textCol: String,
      labelCol: Option[String]): DataFrame = {
    val K = org.apache.spark.sql.graft.SignatureKernels
    val th = K.tokenHashes(TextOps.tokens(col(textCol)), graft.ext.Dedup.P)
    val base = df.select(
      Seq(col(idCol), size(TextOps.tokens(col(textCol))).cast("long").as("dl"),
        K.hashCounts(th).as("tfs")) ++ labelCol.map(col): _*)
    base.select(
      Seq(col(idCol), col("dl"), explode(col("tfs")).as("tc")) ++ labelCol.map(col): _*)
      .select(Seq(col(idCol), col("dl"), col("tc.h").as("h"),
        col("tc.c").as("tf")) ++ labelCol.map(col): _*)
  }

  /**
   * Fit the model on labeled documents. `feat`: (label, h, cnt) pruned
   * to `vocabPerClass` per label; `cls`: (label, n_docs, t_c) with
   * t_c = token instances + V already folded in; `corpus`: one row
   * (n_docs_total, v).
   */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
      vocabPerClass: Int = 1000): Model = {
    val fs = featureStream(df, idCol, textCol, Some(labelCol))
    val counts = fs.groupBy(col(labelCol).as("label"), col("h"))
      .agg(sum("tf").as("cnt"))
    val feat = org.apache.spark.sql.graft.plans.GroupTopK.topkPerKey(
      counts, Seq("label"), Seq(col("cnt").desc, col("h").asc), vocabPerClass)
    // V = distinct features over the WHOLE training corpus (the Laplace
    // denominator), independent of pruning; one tiny crossJoin row.
    val vocab = counts.select(countDistinct("h").as("v"))
    // class doc/instance totals need no token explode at all: Σ tf over
    // a doc IS its length, which rides the source row as size(tokens)
    val cls = docLengths(df, idCol, textCol, Some(labelCol))
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tok"))
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("n_docs"), (col("n_tok") + col("v")).as("t_c"))
    val corpus = cls.agg(sum("n_docs").as("n_total")).crossJoin(broadcast(vocab))
    Model(feat, cls, corpus)
  }

  /** (id[, label], dl): document lengths straight off the source rows. */
  private def docLengths(df: DataFrame, idCol: String, textCol: String,
      labelCol: Option[String]): DataFrame =
    df.select(Seq(col(idCol), size(TextOps.tokens(col(textCol))).cast("long").as("dl")) ++
      labelCol.map(col): _*)

  /** bitlen(x): binary digit count — the integer −log₂ proxy. */
  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /**
   * Score and label documents with a trained model. Output: (idCol,
   * predicted, surp_best) — predicted is the argmin-surprisal label,
   * ties broken label-ascending; surp_best is the winning integer
   * surprisal (bit-units), the corpus-curation confidence signal.
   */
  def classify(df: DataFrame, model: Model, idCol: String, textCol: String): DataFrame = {
    val fs = featureStream(df, idCol, textCol, None)
    val hits = fs.join(broadcast(model.feat), "h")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf") * (bitlen(col("cnt") + 1) - 1)).as("hit_sum"))
    val grid = docLengths(df, idCol, textCol, None)
      .crossJoin(broadcast(model.cls))
      .crossJoin(broadcast(model.corpus))
      .join(hits, Seq(idCol, "label"), "left_outer")
      .na.fill(0L, Seq("hit_sum"))
      .select(col(idCol), col("label"),
        ((bitlen(col("n_total")) - bitlen(col("n_docs"))) +
          col("dl") * (bitlen(col("t_c")) - 1) - col("hit_sum")).as("surp"))
    org.apache.spark.sql.graft.plans.GroupTopK
      .topkPerKey(grid, Seq(idCol), Seq(col("surp").asc, col("label").asc), 1)
      .select(col(idCol), col("label").as("predicted"), col("surp").as("surp_best"))
  }
}
