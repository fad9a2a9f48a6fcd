"""Distributed multinomial Naive Bayes over character n-grams — a
fastText-style linear text classifier whose TRAINING and SCORING are both
plain relational plans (groupBy counts + broadcast join + ordered fold).

Why NB and not SGD: training reduces to exact integer count aggregation,
so the whole fit is one shuffle (``groupBy(label, gram)``), trivially
map-side combined, deterministic on any cluster size, and mirrorable in
ANSI SQL — the properties a 100 TB pipeline (and this repo's DuckDB
correctness gate) actually need. The model it learns is the same shape
fastText learns for language-ID: a linear score per label over char-ngram
features (Joulin et al. 2016 use rank-constrained softmax; NB is the
closed-form count-based member of the family).

Scale notes
-----------
- Fit: one ``groupBy(label, gram)`` with map-side partial aggregation;
  ``min_count`` prunes the rare-gram tail so the broadcast model stays
  bounded (the dropped tail is folded into the OOV mass, not ignored).
- Score: broadcast-join the model onto exploded grams, then ONE ordered
  fold per document — logp sums run position-ascending, so the float
  result is identical on every cluster size and bit-comparable to the
  serial oracle.
- No driver-side data: only label metadata (a handful of rows) and the
  model-size decision are collected.

Reference parity: the reference's language/weirdness scoring is a kenlm
char LM (pycorrector/detector.py:106-150); this operator is the
classifier counterpart for corpus-level labeling (langid, quality tiers)
that the reference leaves to external fastText models.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["NBModel", "char_ngrams_expr", "fit_nb", "score_nb"]


def char_ngrams_expr(text: Column, n: int = 3) -> Column:
    """Array of overlapping character ``n``-grams of ``lower(text)``
    (codepoint-based, so CJK and Latin both produce dense features).
    Texts shorter than ``n`` yield an empty array — the guard matters
    because Spark's ``sequence(1, 0)`` counts DOWN, not empty."""
    t = F.lower(F.coalesce(text, F.lit("")))
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: F.substring(t, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams_sql(text_sql: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`char_ngrams_expr` (same lowercasing, same
    codepoint slicing; generate_series(1, 0) is already empty there)."""
    t = f"lower(coalesce({text_sql}, ''))"
    return (
        f"list_transform(generate_series(1, length({t}) - {n - 1}),"
        f" i -> substr({t}, i, {n}))"
    )


@dataclass
class NBModel:
    """Fitted model: a grams DataFrame plus tiny driver-side metadata.

    ``gram_logps``: (gram, logps array<double>) — per-label additive
    smoothed log-likelihoods in ``labels`` order, dense (every vocab gram
    has all labels). ``oov_logps``/``prior_logps`` are per-label scalars
    in the same order.
    """

    labels: list
    gram_logps: DataFrame
    oov_logps: list
    prior_logps: list
    n: int


def fit_nb(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    min_count: int = 1,
) -> NBModel:
    """Fit multinomial NB with add-one smoothing over char ``n``-grams.

    ``min_count`` drops grams whose total count (across labels) is below
    the threshold BEFORE smoothing; their mass lands in the OOV estimate
    ``1 / (label_total + V)``, keeping the broadcastable model bounded on
    an open-vocabulary corpus.
    """
    labeled = docs.where(F.col(label_col).isNotNull())
    grams = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(char_ngrams_expr(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("label", "gram").agg(F.count("*").alias("c"))
    kept = (
        counts.withColumn("tot_c", F.sum("c").over(Window.partitionBy("gram")))
        .where(F.col("tot_c") >= min_count)
        .drop("tot_c")
    )

    # tiny driver-side metadata: label totals + priors + vocab size
    label_rows = sorted(
        labeled.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("n_docs"))
        .collect(),
        key=lambda r: r["label"],
    )
    labels = [r["label"] for r in label_rows]
    n_total = sum(r["n_docs"] for r in label_rows)
    prior_logps = [math.log(r["n_docs"] / n_total) for r in label_rows]

    tok_totals = {
        r["label"]: r["t"]
        for r in kept.groupBy("label").agg(F.sum("c").alias("t")).collect()
    }
    v = kept.select("gram").distinct().count()
    oov_logps = [
        math.log(1.0 / (tok_totals.get(l, 0) + v)) if (tok_totals.get(l, 0) + v) > 0
        else 0.0
        for l in labels
    ]

    # dense (gram x label) log-likelihoods in fixed label order
    vocab = kept.select("gram").distinct()
    label_lits = F.array(*[F.lit(l) for l in labels])
    full = vocab.select("gram", F.explode(label_lits).alias("label")).join(
        kept, ["gram", "label"], "left"
    ).fillna({"c": 0})
    tot_map = F.create_map(
        *[x for l in labels for x in (F.lit(l), F.lit(float(tok_totals.get(l, 0))))]
    )
    with_logp = full.withColumn(
        "logp",
        F.log((F.col("c") + 1.0) / (tot_map[F.col("label")] + F.lit(float(v)))),
    )
    gram_logps = (
        with_logp.groupBy("gram")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("label", "logp"))
            ).alias("m")
        )
        .select(
            "gram",
            F.array(*[F.col("m")[l] for l in labels]).alias("logps"),
        )
    )
    return NBModel(labels, gram_logps, oov_logps, prior_logps, n)


def score_nb(docs: DataFrame, model: NBModel, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Per-document label scores and argmax prediction.

    The per-label score folds gram log-likelihoods in POSITION order
    (collect_list -> array_sort on (pos, ...) -> sequential aggregate), so
    float accumulation order — hence the exact double — is independent of
    partitioning and matches the oracle's in-order ``list_reduce``.
    Ties break toward the lexically smaller label.
    """
    k = len(model.labels)
    exploded = docs.select(
        F.col(id_col),
        F.posexplode_outer(char_ngrams_expr(F.col(text_col), model.n)).alias(
            "pos", "gram"
        ),
    )
    joined = exploded.join(F.broadcast(model.gram_logps), "gram", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col("pos").isNotNull(), F.struct("pos", "logps"))
            )
        ).alias("seq")
    )
    def _fold_for(i: int):
        # bind i by closure: pyspark inspects lambda arity, so a default
        # arg would be rebound to a Column
        oov = float(model.oov_logps[i])
        return lambda acc, x: acc + F.coalesce(
            F.element_at(x["logps"], i + 1), F.lit(oov)
        )

    score_cols = []
    for i in range(k):
        fold = F.aggregate(
            F.col("seq"), F.lit(float(model.prior_logps[i])), _fold_for(i)
        )
        score_cols.append(fold.alias(f"score_{i}"))
    scored = per_doc.select(id_col, *score_cols)

    pred = F.lit(model.labels[0])
    best = F.col("score_0")
    for i in range(1, k):
        is_better = F.col(f"score_{i}") > best
        pred = F.when(is_better, F.lit(model.labels[i])).otherwise(pred)
        best = F.when(is_better, F.col(f"score_{i}")).otherwise(best)
    return scored.select(
        id_col,
        pred.alias("nb_pred"),
        best.alias("nb_logp"),
        *[F.col(f"score_{i}").alias(f"logp_{l}") for i, l in enumerate(model.labels)],
    )
