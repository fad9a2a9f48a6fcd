"""Property-based tests (hypothesis) over the pure text/hash primitives.

The reference has no property tests (SURVEY.md §5); these harden the
invariants the distributed stages rely on: splitter reassembly, normalizer
idempotence, scrub stability, minhash's Jaccard estimate, and edit-distance
metric laws.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pycorrector_spark.refimpl.proper import levenshtein
from pycorrector_spark.textops import (
    longest_match_rewrite,
    s2t,
    scrub_text,
    split_sentences_by_symbol,
    string_b2q,
    string_q2b,
    t2s,
    uniform,
)

# mixed alphabet: ASCII, fullwidth, CJK (incl. traditional), whitespace, punct
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019 \t\n.,!?@:/-_#&+")
        + list("，。！？；：")
        + list("的了是我你他在有不人一上大东风马学习汉汗")
        + list("東風馬學習漢")
        + [chr(c) for c in range(0xFF01, 0xFF10)]
    ),
    max_size=80,
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_split_reassembles(text):
    frags = split_sentences_by_symbol(text, include_symbol=True)
    assert "".join(f for f, _ in frags) == text
    for frag, idx in frags:
        assert text[idx: idx + len(frag)] == frag


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_uniform_idempotent_and_length_preserving(text):
    once = uniform(text)
    assert uniform(once) == once
    assert len(once) == len(text)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_q2b_b2q_partial_inverse(text):
    # Q2B then B2Q maps every ASCII-printable to fullwidth; Q2B again
    # returns to the halfwidth normal form — i.e. Q2B∘B2Q∘Q2B == Q2B
    assert string_q2b(string_b2q(string_q2b(text))) == string_q2b(text)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_t2s_length_preserving_and_idempotent(text):
    out = t2s(text)
    assert len(out) == len(text)
    assert t2s(out) == out  # simplified output contains no mapped trad chars


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_s2t_t2s_fixpoint(text):
    # t2s(s2t(x)) == t2s(x): converting to traditional and back lands on
    # the same simplified normal form
    assert t2s(s2t(t2s(text))) == t2s(text)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(text):
    once = scrub_text(text)
    assert scrub_text(once) == once


@given(TEXT, st.dictionaries(st.text(min_size=1, max_size=3), st.text(max_size=3), max_size=5))
@settings(max_examples=100, deadline=None)
def test_longest_match_rewrite_total(text, table):
    # never crashes, and with an empty table is the identity
    longest_match_rewrite(text, table)
    assert longest_match_rewrite(text, {}) == text


SHORT = st.text(alphabet=st.sampled_from("abcde"), max_size=8)


@given(SHORT, SHORT, SHORT)
@settings(max_examples=200, deadline=None)
def test_levenshtein_metric_laws(a, b, c):
    assert levenshtein(a, b) == levenshtein(b, a)
    assert (levenshtein(a, b) == 0) == (a == b)
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@given(st.integers(0, 2 ** 31), st.integers(1, 200), st.integers(1, 200))
@settings(max_examples=50, deadline=None)
def test_minhash_jaccard_estimate(seed, n_a, n_overlap):
    from pycorrector_spark.operators.dedup import _minhash_batch, _minhash_params

    rng = np.random.default_rng(seed)
    a_only = rng.integers(0, 2 ** 63, size=n_a, dtype=np.uint64)
    shared = rng.integers(0, 2 ** 63, size=n_overlap, dtype=np.uint64)
    set_a = np.unique(np.concatenate([a_only, shared]))
    set_b = np.unique(shared)
    inter = len(np.intersect1d(set_a, set_b))
    union = len(np.union1d(set_a, set_b))
    true_j = inter / union
    pa, pb = _minhash_params(256)
    sigs = _minhash_batch([set_a, set_b], pa, pb)
    est = (sigs[0] == sigs[1]).mean()
    # 256 permutations: std err ~ sqrt(j(1-j)/256) <= 0.031; 6 sigma
    assert abs(est - true_j) < 0.2


@given(st.lists(st.integers(0, 2 ** 62), min_size=0, max_size=50))
@settings(max_examples=100, deadline=None)
def test_minhash_identical_sets_identical_sigs(vals):
    from pycorrector_spark.operators.dedup import _minhash_batch, _minhash_params

    arr = np.unique(np.array(vals, dtype=np.uint64))
    pa, pb = _minhash_params(64)
    sigs = _minhash_batch([arr, arr.copy()], pa, pb)
    assert (sigs[0] == sigs[1]).all()


# ---------------------------------------------------------------------------
# round-2 machinery: DAG segmentation, longest-match rewrite, ARPA, md5_64
# ---------------------------------------------------------------------------

ZH_TEXT = st.text(
    alphabet=st.sampled_from("我们的人工智能学习数据系统分析能力很不错一二三 ab12"),
    max_size=40,
)
WORDS = st.dictionaries(
    st.text(alphabet="我们的人工智能学习", min_size=1, max_size=4),
    st.integers(min_value=0, max_value=10_000),
    max_size=30,
)


@given(ZH_TEXT, WORDS)
@settings(max_examples=200, deadline=None)
def test_dag_tokens_partition_the_sentence(sentence, wf):
    from pycorrector_spark.textops import dag_max_prob_tokens

    toks = dag_max_prob_tokens(sentence, wf)
    # spans are contiguous, start at 0, end at len, and re-join to the input
    pos = 0
    for t, b, e in toks:
        assert b == pos and e > b and sentence[b:e] == t
        pos = e
    assert pos == len(sentence)
    # every multi-char token is a positive-frequency dict word
    for t, b, e in toks:
        if e - b > 1:
            assert wf.get(t)


@given(ZH_TEXT, WORDS)
@settings(max_examples=100, deadline=None)
def test_search_mode_superset_of_base_tokens(sentence, wf):
    from pycorrector_spark.textops import dag_max_prob_tokens, search_mode_tokens

    base = dag_max_prob_tokens(sentence, wf)
    search = search_mode_tokens(sentence, wf)
    assert set(base) <= set(search)
    # sub-words are all in-dict with positive freq and lie inside a base span
    extra = set(search) - set(base)
    for t, b, e in extra:
        assert wf.get(t)
        assert any(bb <= b and e <= ee for _, bb, ee in base)


@given(ZH_TEXT, st.dictionaries(
    st.text(alphabet="一二三四五", min_size=1, max_size=3),
    st.text(alphabet="六七八", min_size=1, max_size=3),
    max_size=10,
))
@settings(max_examples=200, deadline=None)
def test_longest_match_rewrite_fixed_point_outside_keys(sentence, table):
    from pycorrector_spark.textops import LongestMatchRewriter

    rw = LongestMatchRewriter(table)
    out = rw(sentence)
    # chars outside every key pass through; text with no key occurrence
    # is unchanged
    if not any(k in sentence for k in table):
        assert out == sentence
    # rewriting is deterministic
    assert rw(sentence) == out


@given(st.lists(st.text(alphabet="甲乙丙丁abc", min_size=1, max_size=12),
                min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_arpa_round_trip_random_corpora(corpus):
    import numpy as np

    from pycorrector_spark.lm.model import load_arpa, to_arpa_lines, train_char_lm

    lm = train_char_lm(corpus)
    lm2 = load_arpa(to_arpa_lines(lm))
    texts = corpus[:5] + ["甲乙丙", ""]
    assert np.allclose(lm.ppl_batch(texts), lm2.ppl_batch(texts), rtol=1e-5)


@given(st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_md5_64_matches_duckdb_expression(word):
    """The one hash with a SQL twin: verify the exact DuckDB expression the
    simhash oracle uses reproduces textops.md5_64."""
    import duckdb

    from pycorrector_spark.textops import md5_64

    got = duckdb.sql(
        "SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT", params=[word]
    ).fetchone()[0]
    assert got == md5_64(word)


# ---------------------------------------------------------------------------
# round-4 primitives
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=2, max_value=8).flatmap(
        lambda mcs: st.tuples(
            st.just(mcs),
            st.lists(st.integers(0, (1 << mcs) - 1), min_size=0, max_size=600),
        )
    )
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_property(args):
    from pycorrector_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode_uncompressed,
    )

    mcs, idx = args
    assert _gif_lzw_decode(_gif_lzw_encode_uncompressed(idx, mcs), mcs) == idx


@given(
    st.dictionaries(
        st.sampled_from("abcdefgh"), st.integers(0, 10_000), min_size=1, max_size=8
    ),
    st.dictionaries(
        st.sampled_from("abcdefgh"),
        st.floats(0.01, 10, allow_nan=False),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=120, deadline=None)
def test_domain_mix_cuts_properties(counts, weights):
    from pycorrector_spark.operators.curation import _BUCKET_DENOM, domain_mix_cuts

    cuts = domain_mix_cuts(counts, weights)
    assert set(cuts) == set(counts)
    for d, cut in cuts.items():
        assert 0 <= cut <= _BUCKET_DENOM
        # unweighted or empty domains are dropped entirely
        if d not in weights or counts[d] == 0:
            assert cut == 0
    # the binding weighted-and-present domain keeps everything (weighted
    # domains with no docs are ignored, not allowed to zero the corpus)
    active = [d for d in cuts if d in weights and weights[d] > 0 and counts[d] > 0]
    if active:
        assert max(cuts[d] for d in active) >= _BUCKET_DENOM - 1
        # realized totals track target proportions: expected kept docs
        # n_d * cut_d/denom ~ T * w_d (within bucket quantization)
        t_est = [counts[d] * cuts[d] / _BUCKET_DENOM / weights[d] for d in active]
        quant_slack = max(1.0 / weights[d] for d in active)  # 1 bucket per domain
        assert max(t_est) - min(t_est) <= max(2.0, 0.01 * max(t_est)) + quant_slack


@given(st.text(alphabet=st.sampled_from(list("abc ABC\t\n.")), max_size=120),
       st.integers(2, 5))
@settings(max_examples=80, deadline=None)
def test_word_ngram_hash_count(text, n):
    """Serial replica of curation.word_ngram_hashes' COUNT contract:
    max(0, n_words - n + 1) hashes, words = lowercase whitespace split."""
    import hashlib

    words = [w for w in text.lower().split() if w]
    expect = max(0, len(words) - n + 1)
    grams = [
        int(hashlib.md5(" ".join(words[i:i + n]).encode()).hexdigest()[:15], 16)
        for i in range(expect)
    ]
    assert len(grams) == expect
    assert len(set(grams)) <= max(1, expect)


@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
                       width=32),
             min_size=1, max_size=400),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(vals, ch, rate):
    """Any float signal in [-1,1] survives encode_wav/decode_wav to
    within PCM16 quantization, preserving shape and rate."""
    import numpy as np

    from pycorrector_spark.operators.multimodal import decode_wav, encode_wav

    n = max(1, len(vals) // ch)
    flat = (vals * (ch * n))[: n * ch]  # tile the draw out to n*ch values
    s = np.asarray(flat, dtype=np.float64).reshape(n, ch)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate and out.shape == (n, ch)
    assert np.abs(out - s).max() <= 2.0 / 32768


@given(st.integers(2, 9), st.integers(2, 12), st.integers(2, 16),
       st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_shape_property(h, w, ncolors, seed):
    """encode_jpeg/decode_jpeg preserve shape/dtype for arbitrary small
    RGB images (444 and 420), and encoding is deterministic."""
    import numpy as np

    from pycorrector_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        data = encode_jpeg(px, subsampling=sub)
        assert data == encode_jpeg(px, subsampling=sub)
        out = decode_jpeg(data)
        assert out.shape == (h, w, 3) and out.dtype == np.uint8


@given(st.integers(2, 10), st.integers(2, 10), st.integers(1, 6),
       st.integers(2, 8), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_animated_gif_frames_property(h, w, n_frames, n_colors, seed):
    """Any frame stack through encode_gif_animated/decode_gif_frames
    round-trips pixel-exact with the frame count preserved."""
    import numpy as np

    from pycorrector_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = [rng.integers(0, n_colors, (h, w), dtype=np.uint8)
              for _ in range(n_frames)]
    out = decode_gif_frames(encode_gif_animated(frames, pal))
    assert len(out) == n_frames
    for f_in, f_out in zip(frames, out):
        assert np.array_equal(pal[f_in], f_out)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 24),
       st.integers(1, 24))
@settings(max_examples=60, deadline=None)
def test_resize_pixels_property(h, w, th, tw):
    """Nearest-neighbor resample: exact target shape, every output pixel
    is SOME input pixel, and identity when dims match."""
    import numpy as np

    from pycorrector_spark.operators.multimodal import resize_pixels

    px = (np.arange(h * w * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(h, w, 3)
    out = resize_pixels(px, tw, th)
    assert out.shape == (th, tw, 3)
    flat_in = {tuple(p) for p in px.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in out.reshape(-1, 3))
    if (th, tw) == (h, w):
        assert np.array_equal(out, px)
