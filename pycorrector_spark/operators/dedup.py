"""Deduplication operators for large-scale training-data pipelines.

Four tiers, each with its scale story:

- exact_dedup: md5(text) group — one shuffle on the digest; the digest is
  computed JVM-side, so the shuffle carries 16 bytes + id, not the text.
- ngram_jaccard_pairs: word-shingle inverted-index self-join. The join key
  is the shingle, so only docs sharing a shingle ever meet — this is the
  exact-verification tier; at 100 TB you put minhash_lsh_candidates in
  front of it so the join runs per LSH bucket, not per shingle.
- minhash_lsh: MinHash signatures (vectorized numpy over Arrow batches)
  banded into bucket keys; candidate pairs = docs sharing a band bucket.
- simhash64: 64-bit SimHash + pigeonhole banding for hamming distance <= 3.

All hashes are deterministic (fixed seeds / fixed mixers) so reruns and
resumes produce identical clusters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[ \t\n\r]+"

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (text_md5, keeper_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup_keep(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Filter df to one keeper row per distinct text (min id wins)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# word shingles (shared by jaccard + minhash)
# ---------------------------------------------------------------------------


def _words_col(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != F.lit("")
    )


def with_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Add `shingles`: distinct k-word shingles (space-joined, lowercase)."""
    w = _words_col(text_col)
    shingles = F.when(
        F.size(w) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - k + 1),
                lambda i: F.concat_ws(" ", F.slice(w, i, k)),
            )
        ),
    ).otherwise(F.array())
    return df.select(F.col(id_col), shingles.alias("shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle inverted-index self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    sh = with_shingles(df, id_col, text_col, k)
    sized = sh.select(
        F.col(id_col).alias("id"), "shingles", F.size("shingles").alias("n_sh")
    ).filter(F.col("n_sh") > 0)
    inv = sized.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("n_inter"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_U64 = 0xFFFFFFFFFFFFFFFF


def _shingle_hash64(shingle: str) -> int:
    """Deterministic FNV-1a 64-bit hash of a shingle string."""
    h = 0xCBF29CE484222325
    for byte in shingle.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & _U64
    return h


def _minhash_batch(shingle_lists, a, b):
    """MinHash signatures for a batch: list of uint64 arrays -> int64 matrix."""
    num_perm = len(a)
    out = np.empty((len(shingle_lists), num_perm), dtype=np.int64)
    for i, hashes in enumerate(shingle_lists):
        if len(hashes) == 0:
            out[i] = np.zeros(num_perm, dtype=np.int64)
            continue
        x = hashes.reshape(-1, 1)  # (n_shingles, 1) uint64
        # (a*x + b) mod mersenne, folded to 32 bits
        hv = (x * a + b) % _MERSENNE & _MAX_HASH
        out[i] = hv.min(axis=0).astype(np.int64)
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — vectorized numpy inside mapInPandas.

    Docs with no shingles (shorter than k words) are excluded: they have
    no MinHash signature, and keeping them would make every empty doc an
    LSH candidate of every other (zero signatures collide in all bands —
    a quadratic blowup at web scale and a divide-by-zero in the exact
    Jaccard verification).
    """
    sh = with_shingles(df, id_col, text_col, k).filter(F.size("shingles") > 0)
    a, b = _minhash_params(num_perm, seed)

    def fn(it):
        for pdf in it:
            hash_lists = [
                np.array([_shingle_hash64(s) for s in (lst if lst is not None else [])],
                         dtype=np.uint64)
                for lst in pdf["shingles"]
            ]
            sigs = _minhash_batch(hash_lists, a, b)
            yield pd.DataFrame({id_col: pdf[id_col], "sig": list(sigs)})

    return sh.mapInPandas(fn, f"{id_col} long, sig array<long>")


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Band key = (band_index, hash of that band's signature slice); the
    bucket join shuffles only (id, band_key) pairs.
    """
    assert_cols = bands * rows_per_band
    banded = sig_df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(
                    bnd, F.slice("sig", bnd * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard (the full scale pattern)."""
    cands = minhash_lsh_candidates(
        minhash_signatures(df, id_col, text_col, k, num_perm),
        id_col,
        bands,
        num_perm // bands,
    )
    sh = with_shingles(df, id_col, text_col, k)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over word unigrams (FNV-1a)."""

    def fn(it):
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in it:
            out = np.empty(len(pdf), dtype=np.int64)
            texts = pdf[text_col].fillna("")
            for i, t in enumerate(texts):
                words = [w for w in t.lower().split() if w]
                if not words:
                    out[i] = 0
                    continue
                hs = np.array([_shingle_hash64(w) for w in words], dtype=np.uint64)
                bits = ((hs.reshape(-1, 1) >> bit_idx) & np.uint64(1)).astype(np.int64)
                # signed arithmetic: uint64 would wrap for minority-vote bits
                votes = bits.sum(axis=0) * 2 - len(words)
                sim = np.uint64(0)
                for j in np.where(votes > 0)[0]:
                    sim |= np.uint64(1) << np.uint64(j)
                out[i] = sim.astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(fn, f"{id_col} long, simhash long")


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", max_distance: int = 3
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_distance via 4x16-bit pigeonhole
    banding (any pair within distance 3 shares at least one 16-bit band)."""
    parts = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ]
    )
    banded = sim_df.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.posexplode(parts).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
