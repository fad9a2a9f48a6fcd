"""JPEG codec: baseline sequential DCT (ITU-T T.81, Annex K tables) —
the third real multimodal codec next to PNG and GIF; closes the last
deterministic-fake path on the gated media_features query (round-4
verdict ask #6). Lossy by nature, so round trips assert bounded error
and bitwise determinism, not pixel equality."""

import numpy as np
import pytest

from pycorrector_spark.operators.multimodal import (
    decode_jpeg,
    encode_jpeg,
    jpeg_features,
    media_features,
    media_rows,
)


def _smooth_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.zeros((h, w, 3))
    base[..., 0] = np.linspace(0, 200, w)[None, :]
    base[..., 1] = np.linspace(30, 220, h)[:, None]
    base[..., 2] = 120.0
    return np.clip(base + rng.normal(0, 6, (h, w, 3)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (21, 17), (9, 31)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_bounded_error(shape, sub):
    px = _smooth_rgb(*shape, seed=shape[0] * 100 + shape[1])
    data = encode_jpeg(px, subsampling=sub)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == px.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.float64) - px.astype(np.float64))
    # Annex-K tables on smooth content: small quantization error only
    # (4:2:0 on a tiny 8x8 with a steep chroma gradient is the worst case)
    assert err.mean() < 12.0
    assert err.max() < 64.0


def test_grayscale_roundtrip():
    g = np.tile(np.linspace(10, 240, 17, dtype=np.uint8)[None, :], (12, 1))
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == (12, 17, 1)
    err = np.abs(out[:, :, 0].astype(float) - g.astype(float))
    assert err.max() < 16.0


def test_encode_deterministic():
    px = _smooth_rgb(13, 19, seed=3)
    assert encode_jpeg(px) == encode_jpeg(px)
    assert encode_jpeg(px, "420") == encode_jpeg(px, "420")
    assert encode_jpeg(px) != encode_jpeg(px, "420")


def test_flat_image_exact():
    """A constant image survives the DCT exactly (only the DC coefficient
    is nonzero and Annex-K DC steps divide it cleanly enough)."""
    px = np.full((16, 16, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert np.abs(out.astype(int) - 128).max() <= 1


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG" + b"\x00" * 16)
    data = encode_jpeg(_smooth_rgb(8, 8))
    # progressive SOF marker is detected and refused, not mis-decoded
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))


def test_byte_stuffing_survives():
    """Find a fixture whose entropy stream contains a stuffed FF00 and
    confirm decode (regression for unstuffing)."""
    seen = False
    for seed in range(40):
        px = _smooth_rgb(16, 16, seed=seed)
        data = encode_jpeg(px)
        scan = data[data.find(b"\xff\xda"):]
        if b"\xff\x00" in scan:
            seen = True
            decode_jpeg(data)
    assert seen, "no fixture produced a stuffed byte — widen the search"


def test_media_features_real_jpeg_path():
    """media_features routes JPEG payloads through the REAL decoder with
    deterministic_fake OFF — the gated query no longer uses the fake."""
    px = _smooth_rgb(6, 4, seed=9)
    data = encode_jpeg(px)
    feats = media_features(data, deterministic_fake=False)
    assert feats[0] == 4.0 and feats[1] == 6.0 and feats[2] == 3.0
    decoded = decode_jpeg(data).astype(np.float64).reshape(-1, 3)
    assert feats[3] == pytest.approx(decoded.mean())
    assert np.array_equal(feats, jpeg_features(data))


def test_media_rows_jpeg_payloads_really_decode():
    """Every jpeg row in the fixture table is a real decodable baseline
    JPEG whose decoded dims match the row metadata — 6/6 mime rows now
    decode for real."""
    rows = media_rows(64)
    n_jpeg = 0
    for _i, mime, w, h, payload in rows:
        if mime != "image/jpeg":
            continue
        n_jpeg += 1
        px = decode_jpeg(payload)
        assert px.shape == (h, w, 3)
    assert n_jpeg >= 8


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad the stream
    before a marker; some encoders emit them after SOI or before EOI."""
    px = _smooth_rgb(16, 16, seed=3)
    data = encode_jpeg(px)
    base = decode_jpeg(data)
    padded = data[:2] + b"\xff\xff" + data[2:-2] + b"\xff" + data[-2:]
    assert np.array_equal(decode_jpeg(padded), base)
