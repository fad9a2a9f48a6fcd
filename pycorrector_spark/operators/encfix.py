"""Mojibake repair: undo utf-8 text mis-decoded through a single-byte
codepage (ftfy's core trick, Speer 2019 — "fixes text for you").

Web crawls are full of double-encoded text: a page's utf-8 bytes get read
as latin-1/cp1252 somewhere upstream, turning "café" into "cafÃ©" (and,
one generation deeper, "cafÃ\x83Â©"). The repair is the exact inverse —
re-encode with the suspected codepage and decode as utf-8 — applied only
when it round-trips cleanly. In practice clean text (ASCII, CJK,
genuinely accented Latin) is untouched because its codepage bytes are
not valid multi-byte utf-8; the exception ftfy also accepts is text that
deliberately QUOTES mojibake (a page about encodings containing a
literal "Ã©") — it round-trips and gets "repaired", so was_mojibake is a
heuristic signal, not a guarantee.

The reference normalizes text at the character level (uniform/B2Q,
pycorrector/utils/text_utils.py) but assumes clean unicode in; this is
the upstream repair a Common-Crawl pipeline needs before those stages.

Scale shape: a pure per-row function under ONE Arrow-batched pandas UDF —
no shuffle, no state; Python is unavoidable here (codec tables), so it
rides the same vectorized seam as the LM scorer. Determinism: byte-level
codec arithmetic, identical on any cluster size — the driver oracle
hash-checks it against per-pool-index expected values computed by this
same function.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["fix_mojibake", "with_fixed_encoding"]

# cp1252 first: where both succeed the bytes are identical, and cp1252
# covers the visible-punctuation flavor (â€œ) that latin-1 cannot encode;
# the control-char flavor (â\x80\x9c) fails cp1252 and falls to latin-1.
_CODEPAGES = ("cp1252", "latin-1")
_MAX_GENERATIONS = 4


def fix_mojibake(s: str | None, max_iters: int = _MAX_GENERATIONS):
    """Return ``(fixed, changed)``; repairs up to ``max_iters`` mojibake
    generations, leaving text untouched unless the reverse decode
    round-trips as valid utf-8 AND changes the string."""
    if not s:
        return s if s is not None else None, False
    changed = False
    for _ in range(max_iters):
        fixed = None
        for enc in _CODEPAGES:
            try:
                b = s.encode(enc)
            except UnicodeEncodeError:
                continue
            try:
                f = b.decode("utf-8")
            except UnicodeDecodeError:
                continue
            fixed = f
            break
        if fixed is None or fixed == s:
            break
        s, changed = fixed, True
    return s, changed


def with_fixed_encoding(
    df: DataFrame, text_col: str = "text", out_col: str = "fixed_text"
) -> DataFrame:
    """Add ``out_col`` (repaired text) and ``was_mojibake`` (bool)."""

    @F.pandas_udf("struct<t: string, m: boolean>")
    def _fix(s: pd.Series) -> pd.DataFrame:
        pairs = [fix_mojibake(v) for v in s]
        return pd.DataFrame(
            {"t": [p[0] for p in pairs], "m": [p[1] for p in pairs]}
        )

    staged = df.withColumn("_enc", _fix(F.col(text_col)))
    return staged.select(
        "*",
        F.col("_enc")["t"].alias(out_col),
        F.col("_enc")["m"].alias("was_mojibake"),
    ).drop("_enc")
