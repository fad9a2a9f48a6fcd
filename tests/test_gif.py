"""GIF codec: real LZW decode (growing widths, clear/EOI), palettes,
interlace, extension skipping — the second real multimodal codec next to
PNG (multimodal.py decode tiers)."""

import struct

import numpy as np
import pytest

from pycorrector_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode_uncompressed,
    decode_gif,
    encode_gif,
    gif_features,
    media_features,
)


def test_lzw_roundtrip_various_code_sizes():
    rng = np.random.default_rng(7)
    for mcs in (2, 3, 4, 7, 8):
        n_sym = 1 << mcs
        idx = rng.integers(0, n_sym, size=1000).tolist()
        blob = _gif_lzw_encode_uncompressed(idx, mcs)
        assert _gif_lzw_decode(blob, mcs) == idx


def test_encode_decode_roundtrip_pixels():
    rng = np.random.default_rng(11)
    for shape, ncol in [((4, 4), 2), ((13, 7), 5), ((32, 32), 16), ((9, 40), 256)]:
        palette = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=shape, dtype=np.uint8)
        px = decode_gif(encode_gif(idx, palette))
        assert px.shape == (*shape, 3)
        assert np.array_equal(px, palette[idx])


def test_real_lzw_compression_decodes():
    """Decode a stream that exercises table growth and the KwKwK case —
    a run of identical symbols forces code N to be emitted while entry N
    is still being defined."""
    # hand-built: mcs=2, clear=4, eoi=5; encode "0 0 0 0 0 0" with a real
    # LZW encoder would emit 4,0,6,7,5 (6="00", 7="000")
    codes = [4, 0, 6, 7, 5]
    width = 3
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        # table grows after codes 0,6,7 -> width stays 3 (next_code<8)
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert _gif_lzw_decode(bytes(out), 2) == [0, 0, 0, 0, 0, 0]


def test_interlaced_gif_decodes():
    """Build an interlaced variant by hand: rows stored in pass order."""
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(10, 6), dtype=np.uint8)
    # build the interlaced variant by hand: rows in pass order + flag set
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, 10, step)]
    from pycorrector_spark.operators.multimodal import (
        _gif_lzw_encode_uncompressed as enc,
    )
    mcs = 2  # 4-color palette -> 2 bits -> min code size 2
    lzw = enc(idx[order].ravel(), mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    interlaced = (
        b"GIF89a" + struct.pack("<HHBBB", 6, 10, 0x81, 0, 0)  # GCT: 4 entries
        + palette.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 10, 0x40)
        + bytes([mcs]) + bytes(blocks) + b"\x3b"
    )
    assert np.array_equal(decode_gif(interlaced), palette[idx])


def test_extension_blocks_skipped():
    palette = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    g = encode_gif(idx, palette)
    # inject a Graphic Control Extension right before the image descriptor
    img_at = g.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = g[:img_at] + gce + g[img_at:]
    assert np.array_equal(decode_gif(with_ext), palette[idx])


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    palette = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 1, 1]], dtype=np.uint8)
    idx = np.arange(256, dtype=np.uint8).reshape(16, 16) % 4
    g = encode_gif(idx, palette)
    with pytest.raises(ValueError):
        decode_gif(g[:-40])  # truncated pixel data / missing trailer


def test_media_features_real_gif_path():
    """media_features must route GIF payloads through the REAL decoder
    even when deterministic_fake is off — the fake path is only for
    mimes without an in-sandbox codec."""
    palette = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    idx = np.tile(np.array([[0, 1]], dtype=np.uint8), (3, 2))
    g = encode_gif(idx, palette)
    feats = media_features(g, deterministic_fake=False)
    assert feats[0] == 4.0 and feats[1] == 3.0 and feats[2] == 3.0
    px = palette[idx].astype(np.float64).reshape(-1, 3)
    assert feats[3] == pytest.approx(px.mean())
    assert np.array_equal(feats, gif_features(g))


def test_animated_gif_frames_roundtrip():
    """Round 5: multi-frame encode -> decode_gif_frames gives every frame
    pixel-exact; decode_gif still returns the first frame."""
    import numpy as np

    from pycorrector_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
        frame_count,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, (9, 6), dtype=np.uint8) for _ in range(5)]
    g = encode_gif_animated(frames, pal)
    out = decode_gif_frames(g)
    assert len(out) == 5 and frame_count(g) == 5
    for f_in, f_out in zip(frames, out):
        assert np.array_equal(pal[f_in], f_out)
    assert np.array_equal(decode_gif(g), pal[frames[0]])


def test_animated_gif_transparency_composites_over_previous_frame():
    """A GCE transparent index must leave the previous canvas visible —
    the compositing rule real animated GIFs rely on."""
    import struct as _st

    import numpy as np

    from pycorrector_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.uint8)          # all red
    f2 = np.zeros((4, 4), dtype=np.uint8)            # index 0 everywhere
    f2[0, 0] = 2                                     # one green pixel
    g = bytearray(encode_gif_animated([f1, f2], pal))
    # flip the SECOND frame's GCE to "transparent, index 0": find the 2nd
    # GCE (0x21 0xF9 0x04 flags delay delay tindex 0x00)
    first = g.find(b"\x21\xf9\x04")
    second = g.find(b"\x21\xf9\x04", first + 1)
    g[second + 3] |= 0x01          # transparency flag
    g[second + 6] = 0              # transparent index 0
    out = decode_gif_frames(bytes(g))
    assert len(out) == 2
    # frame 2: index-0 pixels transparent -> red shows through; (0,0) green
    want = np.full((4, 4, 3), [200, 0, 0], dtype=np.uint8)
    want[0, 0] = [0, 200, 0]
    assert np.array_equal(out[1], want)


def test_frame_sample_real_frames(spark):
    from pycorrector_spark.operators.multimodal import (
        frame_sample,
        make_video_table,
        video_rows,
    )

    rows = frame_sample(make_video_table(spark, 12), every_n=2, max_samples=4).collect()
    truth = {i: nf for i, _m, nf, _p in video_rows(12)}
    by_media = {}
    for r in rows:
        assert r["n_frames"] == truth[r["media_id"]]
        assert r["frame_index"] % 2 == 0
        by_media.setdefault(r["media_id"], []).append(r["frame_index"])
    for mid, idxs in by_media.items():
        assert len(idxs) == min(4, (truth[mid] + 1) // 2)
        assert sorted(idxs) == list(range(0, 2 * len(idxs), 2))


def test_animated_gif_disposal_restore_to_previous():
    """GCE disposal=3 (restore-to-previous): the canvas must revert to
    its pre-frame state before the NEXT frame composites — optimized
    animations rely on this; treating it as 'leave in place' carries
    stale pixels forward."""
    import numpy as np

    from pycorrector_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.uint8)   # all red
    f2 = np.full((4, 4), 2, dtype=np.uint8)   # all green, disposal=3
    f3 = np.zeros((4, 4), dtype=np.uint8)     # fully transparent
    g = bytearray(encode_gif_animated([f1, f2, f3], pal))
    first = g.find(b"\x21\xf9\x04")
    second = g.find(b"\x21\xf9\x04", first + 1)
    third = g.find(b"\x21\xf9\x04", second + 1)
    g[second + 3] = (g[second + 3] & ~0x1C) | 0x0C  # frame 2: disposal 3
    g[third + 3] |= 0x01                            # frame 3: transparent,
    g[third + 6] = 0                                # index 0
    out = decode_gif_frames(bytes(g))
    assert len(out) == 3
    # frame 2 itself shows green...
    assert np.array_equal(out[1], np.full((4, 4, 3), [0, 200, 0], np.uint8))
    # ...but frame 3 composites over the RESTORED post-frame-1 canvas
    assert np.array_equal(out[2], np.full((4, 4, 3), [200, 0, 0], np.uint8))
