"""Trained (model-based) document quality scoring.

:func:`graphique_spark.llm.text.quality_score` and ``logistic_quality``
are fixed heuristics; production curation (CCNet, Gopher, LLaMA) trains
a *classifier* — reference text (wiki/books) vs random crawl — and keeps
documents the model scores reference-like. This module is that loop on
Spark ML, JVM-side end to end:

* :func:`train_quality_classifier` — regex tokenizer -> hashing-TF
  (fastText-style fixed-width feature hashing, no vocabulary to build or
  broadcast) -> IDF -> logistic regression. The fitted model is a few
  hundred KB regardless of corpus size.
* :func:`score_quality` — apply the model; scoring is a map-side
  transform (model broadcast once), so it runs at scan speed on 100 TB.
* :func:`self_training_labels` — when no labeled reference exists,
  bootstrap labels from the heuristic's extremes (top/bottom quantiles),
  the standard distillation trick: the cheap heuristic labels the easy
  tail, the model generalizes to the middle.

No reference counterpart (beyond-reference extension). KMeans-style
caveat: the model itself is not SQL-expressible, so correctness is
pytest separation/AUC floors rather than a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pipeline(text: str, num_features: int, max_iter: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text, outputCol="__toks", pattern="[a-z]{2,}", gaps=False,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__tf", numFeatures=int(num_features)
    )
    idf = IDF(inputCol="__tf", outputCol="__feat")
    lr = LogisticRegression(
        featuresCol="__feat", labelCol="label", maxIter=int(max_iter),
        regParam=1e-4,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    good: DataFrame,
    bad: DataFrame,
    text: str = "text",
    num_features: int = 1 << 18,
    max_iter: int = 20,
):
    """Fit reference-vs-crawl logistic regression. ``good``/``bad`` need
    only the ``text`` column; at 100 TB fit on a sample (quality models
    saturate with ~1M docs) and persist the returned PipelineModel."""
    train = good.select(F.col(text), F.lit(1.0).alias("label")).unionByName(
        bad.select(F.col(text), F.lit(0.0).alias("label"))
    )
    return _pipeline(text, num_features, max_iter).fit(train)


def score_quality(
    model, df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score ``df``: returns (id_col, p_good). Map-side model transform —
    the broadcast model is the only non-scan cost."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df.select(F.col(id_col), F.col(text)))
    return scored.select(
        F.col(id_col),
        vector_to_array(F.col("probability")).getItem(1).alias("p_good"),
    )


def self_training_labels(
    df: DataFrame,
    text: str = "text",
    lo: float = 0.25,
    hi: float = 0.75,
) -> tuple[DataFrame, DataFrame]:
    """Bootstrap (good, bad) training frames from the heuristic scorer's
    quantile extremes — one percentile aggregate, two scans; the middle
    band (ambiguous under the heuristic) is deliberately excluded so the
    model, not the heuristic, decides it."""
    from graphique_spark.llm.text import quality_score

    scored = df.withColumn("__q", quality_score(F.col(text)))
    q_lo, q_hi = scored.agg(
        F.expr(f"percentile(__q, {float(lo)})"),
        F.expr(f"percentile(__q, {float(hi)})"),
    ).first()
    good = scored.where(F.col("__q") >= q_hi).drop("__q")
    bad = scored.where(F.col("__q") <= q_lo).drop("__q")
    return good, bad
