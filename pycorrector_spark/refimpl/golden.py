"""Serial golden-label generator: the per-document oracle the distributed
pipeline must reproduce (keep/drop F1 >= 0.99, byte-identical text — in
practice both are exact because pipeline and oracle share the same frozen
primitives).

This is deliberately a straight-line, row-at-a-time reading of the
pipeline contract; it mirrors the reference's serial `correct_batch` loop
(corrector.py:320-327) applied to the quality-filter signals.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_CONFIG, PipelineConfig, keep_decision
from ..textops import lang_id, quality_signals, scrub_text, uniform
from .core import Corrector, EnSpellCorrector


def golden_row(text: str, zh: Corrector, en: EnSpellCorrector,
               cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """All pipeline output columns for one document, computed serially."""
    q = quality_signals(text, cfg.min_len, cfg.max_len)
    lid, conf = lang_id(text)
    cheap_pass = (
        q["len_ok"]
        and q["symbol_ratio"] <= cfg.max_symbol_ratio
        and q["rep_ratio"] <= cfg.max_rep_ratio
        and lid in cfg.allowed_langs
    )
    ppl = None
    n_errors = None
    errors = None
    corrected = None
    corrections = None
    if cheap_pass:
        ppl = float(zh.lm.ppl_batch([uniform(text)])[0])
        if lid == "zh":
            dets = zh.detect(text)
            res = zh.correct(text)
        else:
            res = en.correct(text)
            dets = [[w, p, p + len(w), "en_spell"] for (w, c, p) in res["errors"]]
        errors = [
            {"word": w, "begin": int(b), "end": int(e), "type": ty}
            for (w, b, e, ty) in dets
        ]
        n_errors = len(dets)
        corrected = res["target"]
        corrections = [
            {"error_word": w, "correct_word": c, "pos": int(p)}
            for (w, c, p) in res["errors"]
        ]
    density = (n_errors / max(q["n_chars"], 1)) if n_errors is not None else 0.0
    keep, reason = keep_decision(
        q["len_ok"], q["symbol_ratio"], q["rep_ratio"], lid,
        ppl if ppl is not None else 0.0, density, cfg,
    )
    return {
        "lang_id": lid,
        "lang_conf": conf,
        "n_chars": q["n_chars"],
        "n_words": q["n_words"],
        "symbol_ratio": q["symbol_ratio"],
        "rep_ratio": q["rep_ratio"],
        "len_ok": q["len_ok"],
        "ppl": ppl,
        "n_errors": n_errors,
        "error_density": density,
        "errors": errors,
        "corrected_text": corrected,
        "corrections": corrections,
        "scrubbed_text": scrub_text(text),
        "keep": keep,
        "drop_reason": reason,
    }


def golden_frame(texts, zh, en, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pandas DataFrame of golden rows (index-aligned with `texts`)."""
    import pandas as pd

    return pd.DataFrame([golden_row(t, zh, en, cfg) for t in texts])
