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

from pyspark.sql import Column, DataFrame, functions as F

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

    def release(self) -> None:
        """Unpersist the cached per-gram count relation backing
        ``gram_logps`` (safe after the last scoring action)."""
        cached = getattr(self, "_cached", None)
        if cached is not None:
            try:
                cached.unpersist()
            except Exception:
                pass


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
    # one row per kept gram carrying its per-label counts: a second small
    # aggregation over the (label, gram) counts replaces the per-gram
    # window AND the former vocab-cross-labels explode+join — the gram
    # relation is built and shuffled exactly once, then cached so the
    # vocab-size / per-label-total actions and the lazy logps projection
    # don't each re-run the corpus explode (the uncached form re-computed
    # it 4x, measured ~4x slower at sf0.1).
    gm = (
        counts.groupBy("gram")
        .agg(
            F.sum("c").alias("tot_c"),
            F.map_from_entries(F.collect_list(F.struct("label", "c"))).alias("cm"),
        )
        .where(F.col("tot_c") >= min_count)
        .persist()
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

    v = gm.count()  # materializes the cache
    tok_totals = {
        r["label"]: r["t"]
        for r in gm.select(F.explode("cm").alias("label", "c"))
        .groupBy("label")
        .agg(F.sum("c").alias("t"))
        .collect()
    }
    oov_logps = [
        math.log(1.0 / (tok_totals.get(l, 0) + v)) if (tok_totals.get(l, 0) + v) > 0
        else 0.0
        for l in labels
    ]

    # dense per-label log-likelihoods in fixed label order (same formula
    # and the same doubles as the former explode+join construction)
    gram_logps = gm.select(
        "gram",
        F.array(
            *[
                F.log(
                    (F.coalesce(F.col("cm")[l], F.lit(0)) + 1.0)
                    / F.lit(float(tok_totals.get(l, 0)) + float(v))
                )
                for l in labels
            ]
        ).alias("logps"),
    )
    model = NBModel(labels, gram_logps, oov_logps, prior_logps, n)
    model._cached = gm
    return model


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

    # ALL k folds live in one array expression materialized by its own
    # projection: the former per-column running-argmax chain re-inlined
    # each fold into every comparison (HOF lambdas are exempt from
    # codegen subexpression elimination), duplicating the O(n_grams)
    # folds ~2^k times. Downstream expressions reference the multi-ref
    # non-cheap "scores" alias, which CollapseProject keeps materialized.
    scored = per_doc.select(
        F.col(id_col),
        F.array(
            *[
                F.aggregate(
                    F.col("seq"), F.lit(float(model.prior_logps[i])), _fold_for(i)
                )
                for i in range(k)
            ]
        ).alias("scores"),
    )
    # argmax: array_position returns the FIRST occurrence of the max, so
    # ties break toward the lower index = lexically smaller label, exactly
    # like the former strict-greater-than running chain.
    labels_arr = F.array(*[F.lit(l) for l in model.labels])
    idx = F.array_position(F.col("scores"), F.array_max(F.col("scores")))
    return scored.select(
        id_col,
        F.element_at(labels_arr, idx.cast("int")).alias("nb_pred"),
        F.array_max(F.col("scores")).alias("nb_logp"),
        *[
            F.element_at(F.col("scores"), i + 1).alias(f"logp_{l}")
            for i, l in enumerate(model.labels)
        ],
    )
