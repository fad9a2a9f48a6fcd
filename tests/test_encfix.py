"""Mojibake repair (operators/encfix.py): codec round-trip safety."""

from __future__ import annotations

from pycorrector_spark.fixtures import MOJIBAKE_POOL, _mojibake
from pycorrector_spark.operators.encfix import fix_mojibake, with_fixed_encoding


def test_clean_text_never_changes():
    for s in ["hello", "café déjà", "中文未损坏", "", "tab\tand\nnewline"]:
        fixed, changed = fix_mojibake(s)
        assert fixed == s and changed is False
    assert fix_mojibake(None) == (None, False)


def test_single_and_double_generations_repair():
    orig = "café déjà vu — naïve façade"
    for times in (1, 2, 3):
        fixed, changed = fix_mojibake(_mojibake(orig, times=times))
        assert fixed == orig and changed is True


def test_cp1252_flavor_repairs():
    assert fix_mojibake("smart â€œquote and â€“ dash") == (
        "smart “quote and – dash",
        True,
    )


def test_spark_column_matches_serial(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(MOJIBAKE_POOL)],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: (r["fixed_text"], r["was_mojibake"])
        for r in with_fixed_encoding(df).collect()
    }
    for i, s in enumerate(MOJIBAKE_POOL):
        assert got[i] == fix_mojibake(s)
