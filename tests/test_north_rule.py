"""North-rule gate (BASELINE.json): the distributed pipeline must match
the reference labels at keep/drop F1 >= 0.99 AND produce byte-identical
scrubbed text per url.

"Reference labels" here = the serial reference implementation
(refimpl/golden.py — the same detect/correct/scrub semantics as
shibing624/pycorrector's statistical core, kenlm detector + confusion /
rule corrector, reimplemented; see refimpl/core.py docstrings for
file:line citations) run DRIVER-SIDE over the real sf0.01 corpus. The
Spark pipeline runs the same operators distributed; this test proves the
distribution step loses nothing: per-document keep/drop decisions and
scrubbed bytes survive partitioning, Arrow batching, and shuffle
boundaries exactly.
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="sf0.01 testdata absent",
)


def _f1(pairs):
    """keep/drop F1 with DROP as the positive class (the rarer, costlier
    decision: dropping a good doc loses training data)."""
    tp = sum(1 for s, r in pairs if not s and not r)
    fp = sum(1 for s, r in pairs if not s and r)
    fn = sum(1 for s, r in pairs if s and not r)
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def test_keep_drop_f1_and_scrub_bytes_vs_reference_labels(spark):
    from __spark_entry__ import _artifacts_bc, _docs_as_webpages
    from pycorrector_spark.pipeline import run_quality_pipeline
    from pycorrector_spark.refimpl.golden import golden_row
    from pycorrector_spark.operators.score import default_artifacts, make_workers

    docs = _docs_as_webpages(spark, SF_DIR)
    out = (
        run_quality_pipeline(spark, docs, bc=_artifacts_bc(spark, full=True))
        .select("url", "keep", "scrubbed_text")
        .collect()
    )
    spark_rows = {r["url"]: (bool(r["keep"]), r["scrubbed_text"]) for r in out}

    # reference labels: serial golden over the SAME input rows
    src = docs.select("url", "text").collect()
    art = default_artifacts()
    zh, en = make_workers(art)
    ref_rows = {}
    for r in src:
        g = golden_row(r["text"] or "", zh, en, art.cfg)
        ref_rows[r["url"]] = (bool(g["keep"]), g["scrubbed_text"])

    assert set(spark_rows) == set(ref_rows)
    pairs = [(spark_rows[u][0], ref_rows[u][0]) for u in ref_rows]
    f1 = _f1(pairs)
    label_match = sum(1 for s, r in pairs if s == r) / len(pairs)
    byte_identical = sum(
        1 for u in ref_rows if spark_rows[u][1] == ref_rows[u][1]
    ) / len(ref_rows)

    # BASELINE.json north rule: F1 >= 0.99; per-row invariant:
    # byte-identical scrubbed text per url
    assert f1 >= 0.99, (f1, label_match)
    assert byte_identical == 1.0, byte_identical
    # record the measured values where the bench notes can cite them
    print(
        f"NORTH_RULE n={len(pairs)} keep_drop_f1={f1:.6f} "
        f"label_match={label_match:.6f} scrub_byte_identical={byte_identical:.6f}"
    )
