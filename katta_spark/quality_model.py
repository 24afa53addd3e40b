"""Trained quality classifier — the "looks like the reference corpus"
filter of large-scale training-data pipelines.

The GPT-3 / WebText recipe (Brown et al. 2020, appendix A; CCNet takes
the same shape with an LM instead of a classifier): train a LINEAR
classifier to separate a small trusted positive set (curated reference
text) from the raw corpus (noisy negatives), score every document with
P(positive), then keep a document iff a Pareto draw exceeds
``1 - score`` — keeping mostly-high-quality text while letting a long
tail of low-scored documents through so the filter doesn't collapse
diversity.

Spark shape (all built-in, zero Python in the hot path):

- features: the engine's own tokenizer (``tokenize_col``, JVM codegen)
  feeding ``pyspark.ml.feature.HashingTF`` — a stateless, deterministic
  (MurmurHash3) hashed bag-of-words, so the featurizer needs no
  vocabulary broadcast and is reconstructed bit-identically at score
  time from ``n_features`` alone.
- training: ``pyspark.ml.classification.LogisticRegression`` over the
  (small) positive set + a hash-sampled negative slice of the corpus —
  the classic case for MLlib's distributed L-BFGS; at 100 TB the
  TRAINING set stays sample-sized while SCORING is one broadcast-model
  map pass (``model.transform``) with no shuffle at all.
- the keep rule: a pure codegen expression — the Pareto draw derives
  from md5(doc_id|seed) exactly like :func:`textops.stratified_sample`'s
  survival hash, so the filtered corpus is reproducible across runs,
  engines and cluster sizes (GPT-3 uses ``np.random.pareto(alpha=9) >
  1 - score``; this is that rule with the randomness made deterministic
  per document).

Training is iterative (L-BFGS) and therefore has no DuckDB-SQL oracle —
like BPE induction and the IVF k-means, it verifies through behavioral
tests (separation on held-out data, scoring determinism, no-shuffle
plan audit) instead of a value-hash gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokenize_col


def _featurize(df: DataFrame, text_col: str, n_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="_tokens", outputCol="_features", numFeatures=n_features
    )
    return tf.transform(
        df.withColumn("_tokens", tokenize_col(F.col(text_col)))
    )


@dataclass
class QualityModel:
    """A fitted quality classifier: the LR model plus the featurizer
    config needed to rebuild the (stateless) hashing stage at score
    time."""

    model: object  # pyspark.ml LogisticRegressionModel
    n_features: int


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> QualityModel:
    """Fit P(document ~ positive set) on positive vs (noisy) negative
    documents. ``negative`` is typically a deterministic hash-sample of
    the raw corpus (:func:`textops.stratified_sample`) a few times the
    positive count — unlabeled corpus docs standing in as negatives is
    the documented GPT-3 approximation, not an error."""
    from pyspark.ml.classification import LogisticRegression

    pos = positive.select(
        F.lit(1.0).alias("_label"), F.col(text_col).alias("_qtext")
    )
    neg = negative.select(
        F.lit(0.0).alias("_label"), F.col(text_col).alias("_qtext")
    )
    data = _featurize(pos.unionByName(neg), "_qtext", n_features)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    fitted = lr.fit(data)
    # The training summary must be stripped before scoring: it holds the
    # SparkSession, and the scoring UDF's closure would drag the whole
    # session graph into every task (non-serializable once e.g. an
    # Observation is registered — "Task not serializable:
    # ObservationManager"). Clearing it in place (the JVM setter is
    # public bytecode) replaces the disk persistence round-trip that did
    # the same job with four Spark jobs; the round-trip remains as the
    # fallback if the internal setter ever disappears.
    try:
        spark = data.sparkSession
        fitted._java_obj.setSummary(spark._jvm.scala.Option.empty())
        return QualityModel(model=fitted, n_features=n_features)
    except Exception:
        pass
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    tmp = tempfile.mkdtemp(prefix="katta_qm_")
    try:
        fitted.write().overwrite().save(tmp)
        model = LogisticRegressionModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return QualityModel(model=model, n_features=n_features)


def score_quality(
    model: QualityModel,
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """``docs`` + ``out_col`` = P(positive) in [0, 1]. One broadcast-model
    map pass — the plan adds no exchange over the input's."""
    from pyspark.ml.functions import vector_to_array

    reserved = {"_tokens", "_features", "rawPrediction", "probability",
                "prediction"}
    clash = reserved & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the scorer's "
            "internal columns — rename them first"
        )
    scored = model.model.transform(
        _featurize(docs, text_col, model.n_features)
    )
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability"))[1]
    ).drop("_tokens", "_features", "rawPrediction", "probability",
           "prediction")


def pareto_keep_expr(
    alpha: float = 9.0,
    seed: int = 7,
    score_col: str = "quality_prob",
    id_col: str = "doc_id",
):
    """Boolean Column: GPT-3's keep rule, deterministic. Keep a doc iff
    its per-doc Pareto draw exceeds ``1 - score``. The draw inverts the
    Lomax CDF at a md5(id|seed)-derived uniform — ``(1-u)^(-1/alpha)-1``
    is exactly ``numpy.random.pareto(alpha)`` with u made a pure
    function of the row. score=1 keeps (almost) everything; score=0
    keeps a ~``2^-alpha`` diversity tail. Pure codegen: no shuffle, no
    Python, nested samples under a fixed seed as alpha falls."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col(id_col).cast("string"), F.lit(str(seed))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return draw > F.lit(1.0) - F.col(score_col)


def pareto_filter(
    scored: DataFrame,
    alpha: float = 9.0,
    seed: int = 7,
    score_col: str = "quality_prob",
    id_col: str = "doc_id",
) -> DataFrame:
    """``scored`` filtered by :func:`pareto_keep_expr` — see there."""
    return scored.where(pareto_keep_expr(alpha, seed, score_col, id_col))
