"""Multimodal binary-column plumbing: Arrow-batched byte features, REAL
stdlib PNG encode/decode (spec vectors hand-filtered independently of the
encoder), frame-sampling fan-out, and the test-only fake paths for the
formats that genuinely need absent codecs (JPEG/video)."""

from __future__ import annotations

import pytest

from smartpool_bigdata_spark.ops.multimodal import (
    decode_images,
    extract_byte_features,
    sample_frames,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, "hello world"), (2, "x" * 200), (3, "")]
    return with_binary_payload(
        spark.createDataFrame(rows, ["doc_id", "text"]), mime="text/plain"
    )


def test_payload_and_metadata_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.select("media_meta.*").columns
    assert meta == ["mime", "width", "height", "duration_ms"]


def test_byte_features(media):
    feats = {r["doc_id"]: r for r in extract_byte_features(media).collect()}
    assert feats[1]["n_bytes"] == 11 and feats[1]["first_byte"] == ord("h")
    assert feats[2]["n_bytes"] == 200 and feats[2]["first_byte"] == ord("x")
    assert feats[3]["n_bytes"] == 0 and feats[3]["first_byte"] == -1


def test_decode_stub_raises_without_fake_for_non_png(media):
    # the media fixture's payloads are text/plain — NOT PNG — so without
    # PIL the only honest answers are the fake (opt-in) or an error
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub path not reachable")
    except ImportError:
        pass
    # the guard now fires per-payload inside the Python worker (PNG
    # payloads decode real regardless of PIL), so Spark surfaces it as a
    # PythonException wrapping the NotImplementedError
    with pytest.raises(Exception, match="needs PIL"):
        decode_images(media).collect()


def test_decode_fake_is_schema_correct(media):
    out = decode_images(media, deterministic_fake=True)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "width", "height", "n_channels",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["width"] == 200 % 640
    assert all(r["n_channels"] == 3 for r in rows.values())


def test_frame_sampling_fanout(media):
    frames = sample_frames(media, every_n_bytes=64).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["frame_offset"]))
    assert sorted(by_doc[1]) == [(0, 0)]  # 11 bytes -> 1 frame
    assert sorted(by_doc[2]) == [(0, 0), (1, 64), (2, 128), (3, 192)]  # 200 -> 4
    assert 3 not in by_doc  # empty payload -> no frames


def test_resize_stub_raises_without_fake(media):
    import importlib.util

    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import resize_images

    if importlib.util.find_spec("PIL") is not None:
        _pytest.skip("Pillow installed — the decode path is real, not a stub")
    with _pytest.raises(Exception, match="needs PIL"):
        resize_images(media).collect()


def test_resize_fake_emits_target_sized_payloads(media):
    from smartpool_bigdata_spark.ops.multimodal import resize_images

    rows = resize_images(
        media, target_w=8, target_h=4, deterministic_fake=True
    ).collect()
    assert rows
    for r in rows:
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["payload"]) == 8 * 4 * 3
    # deterministic: same input -> same bytes
    again = resize_images(
        media, target_w=8, target_h=4, deterministic_fake=True
    ).collect()
    assert {r["doc_id"]: bytes(r["payload"]) for r in rows} == {
        r["doc_id"]: bytes(r["payload"]) for r in again
    }


def test_paeth_predictor_spec_cases():
    """Hand-worked PNG-spec §9.4 cases, including the left/up/up-left
    tie-break order — computed from the spec text, not from the code."""
    from smartpool_bigdata_spark.ops.multimodal import _paeth

    assert _paeth(3, 9, 8) == 3      # p=4: pa=1 < pb=5, pc=4 -> left
    assert _paeth(10, 10, 10) == 10  # all distances 0 -> tie -> left
    assert _paeth(0, 50, 25) == 25   # p=25: pa=pb=25 > pc=0 -> up-left
    assert _paeth(5, 5, 0) == 5      # p=10: pa=pb=5, pc=10 -> tie -> left
    assert _paeth(0, 7, 3) == 3      # p=4: pa=4, pb=3, pc=1 -> up-left


def test_png_decode_hand_filtered_spec_vector():
    """Decode a PNG whose scanlines were filtered BY HAND from the spec
    (one scanline per filter type 0-4), assembled with struct/zlib only
    — independent of png_encode, so a symmetric encoder/decoder bug
    (e.g. a shared wrong predictor, which any matched pair would
    round-trip) fails here."""
    import struct
    import zlib

    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import png_decode

    # raw 5x2 RGB image (rows of pixel triples)
    want = np.array(
        [
            [[10, 20, 30], [40, 50, 60]],
            [[7, 8, 9], [17, 28, 39]],
            [[100, 110, 120], [130, 140, 150]],
            [[50, 60, 70], [80, 90, 100]],
            [[60, 70, 80], [90, 100, 110]],
        ],
        dtype=np.uint8,
    )
    # hand-filtered scanlines (filter byte + 6 filtered bytes each):
    scanlines = bytes(
        [0, 10, 20, 30, 40, 50, 60]          # None
        + [1, 7, 8, 9, 10, 20, 30]           # Sub: raw - left(bpp=3)
        + [2, 93, 102, 111, 113, 112, 111]   # Up: raw - prev raw row
        + [3, 0, 5, 10, 246, 246, 246]       # Average (mod-256 wraps)
        + [4, 10, 10, 10, 10, 10, 10]        # Paeth
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = png_decode(data)
    assert (w, h, ch) == (2, 5, 3)
    assert np.array_equal(px, want)


def test_png_decode_rejects_corruption():
    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_image,
        png_decode,
        png_encode,
    )

    good = png_encode(_det_image(11))
    with _pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + good)
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip a byte inside IHDR body -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))


def test_png_roundtrip_random_images():
    """encode->decode is the identity over random images whose heights
    exercise every filter in the y%5 cycle, including 1-pixel edges."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import png_decode, png_encode

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (1, 7), (6, 1), (5, 5), (13, 9), (8, 20)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ww, hh, ch, back = png_decode(png_encode(img))
        assert (ww, hh, ch) == (w, h, 3)
        assert np.array_equal(back, img)


def test_synthesize_png_decodes_to_formula_and_real_dims(spark):
    """Spark-side loop: synthesize_png emits REAL PNG bytes whose decode
    (decode_images with no fake flag, PIL absent) recovers the formula
    dims; png_pixel_stats matches a pure-numpy recomputation."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_image,
        png_pixel_stats,
        synthesize_png,
    )

    ids = spark.createDataFrame([(0,), (7,), (123,)], ["doc_id"])
    imgs = synthesize_png(ids)
    dims = {
        r["doc_id"]: (r["width"], r["height"], r["n_channels"])
        for r in decode_images(imgs).collect()
    }
    stats = {
        r["doc_id"]: (r["px_sum"], r["px_min"], r["px_max"])
        for r in png_pixel_stats(imgs).collect()
    }
    for d in (0, 7, 123):
        img = _det_image(d).astype(np.int64)
        assert dims[d] == (8 + d % 13, 8 + (d * 7) % 11, 3)
        assert stats[d] == (int(img.sum()), int(img.min()), int(img.max()))


def test_resize_png_nearest_neighbor_exact(spark):
    """resize_images on PNG payloads = decode -> NN sample -> re-encode;
    decoding the output must equal numpy fancy-indexing of the source."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_image,
        png_decode,
        synthesize_png,
        resize_images,
    )

    ids = spark.createDataFrame([(4,), (99,)], ["doc_id"])
    out = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_images(
            synthesize_png(ids), target_w=8, target_h=6
        ).collect()
    }
    for d in (4, 99):
        src = _det_image(d)
        h, w, _ = src.shape
        ys = (np.arange(6) * h) // 6
        xs = (np.arange(8) * w) // 8
        ww, hh, ch, px = png_decode(out[d])
        assert (ww, hh, ch) == (8, 6, 3)
        assert np.array_equal(px, src[ys][:, xs])


def test_gif_lzw_hand_packed_spec_vector():
    """Decode an LZW stream PACKED BY HAND from the GIF89a spec's
    bit-ordering rules (LSB-first variable-width codes; min_code=2 →
    clear=4, eoi=5, width starts at 3 and bumps to 4 when the table
    reaches 8 entries): CLEAR,1,2,3 in 3-bit codes then 0,EOI in 4-bit
    codes packs to 8C 06 05. Independent of _lzw_encode — a symmetric
    encoder/decoder bug (shared wrong width timing or bit order) fails
    here."""
    from smartpool_bigdata_spark.ops.multimodal import _lzw_decode

    assert _lzw_decode(bytes([0x8C, 0x06, 0x05]), min_code=2) == bytes(
        [1, 2, 3, 0]
    )


def test_gif_lzw_roundtrip_edge_cases():
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(3)
    cases = [
        [0],
        [255] * 300,           # KwKwK repetition
        [1, 1, 1, 1, 1, 1],    # immediate KwKwK
        rng.integers(0, 256, 255).tolist(),
        rng.integers(0, 256, 60000).tolist(),  # forces 12-bit + CLEAR reset
    ]
    for s in cases:
        assert list(_lzw_decode(_lzw_encode(s))) == s


def test_gif_roundtrip_and_palette():
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_gif_frames,
        _gif_palette,
        gif_decode,
        gif_encode,
    )

    for d in (0, 5, 17, 499):
        frames = _det_gif_frames(d)
        w, h, pal, back = gif_decode(gif_encode(frames))
        assert (h, w) == frames[0].shape
        assert len(back) == 2 + d % 4
        assert pal == _gif_palette()
        for a, b in zip(frames, back):
            assert np.array_equal(a, b)
    # corruption: bad signature rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTGIF" + gif_encode(_det_gif_frames(1)))


def test_gif_frame_stats_match_formula(spark):
    """Spark-side loop: synthesize_gif emits REAL GIF89a bytes whose
    per-frame palette-mapped stats match a pure-numpy recomputation."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_gif_frames,
        gif_frame_stats,
        synthesize_gif,
    )

    ids = spark.createDataFrame([(0,), (7,), (123,)], ["doc_id"])
    rows = {
        (r["doc_id"], r["frame_idx"]): (
            r["width"], r["height"], r["rgb_sum"], r["rgb_min"], r["rgb_max"]
        )
        for r in gif_frame_stats(synthesize_gif(ids)).collect()
    }
    pal = np.array(
        [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)],
        dtype=np.int64,
    )
    for d in (0, 7, 123):
        frames = _det_gif_frames(d)
        for fi, fr in enumerate(frames):
            rgb = pal[fr.reshape(-1)]
            want = (
                fr.shape[1],
                fr.shape[0],
                int(rgb.sum()),
                int(rgb.min()),
                int(rgb.max()),
            )
            assert rows[(d, fi)] == want
    assert len(rows) == sum(2 + d % 4 for d in (0, 7, 123))


def test_pcm_roundtrip_and_chunk_features(spark):
    """synthesize -> parse -> window: the PCM bytes round-trip exactly
    (frombuffer inverts tobytes), tail chunks are short, and the integer
    features match a pure-Python recomputation from the generator."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        pcm_chunk_features,
        synthesize_pcm,
    )

    ids = spark.createDataFrame([(3,), (1025,)], ["doc_id"])
    audio = synthesize_pcm(ids)
    feats = {
        (r["doc_id"], r["chunk_idx"]): (r["n_samples"], r["peak"], r["sum_sq"])
        for r in pcm_chunk_features(audio).collect()
    }
    for d in (3, 1025):
        n = 1536 + d % 1024
        i = np.arange(n, dtype=np.int64)
        s = (d * 31 + i * 7) % 65536 - 32768
        for c0 in range(0, n, 1024):
            ch = s[c0 : c0 + 1024]
            want = (len(ch), int(np.abs(ch).max()), int((ch * ch).sum()))
            assert feats[(d, c0 // 1024)] == want
    # tail chunk of doc 3 is short: 1536+3 = 1539 -> chunks of 1024, 515
    assert feats[(3, 1)][0] == 515


def test_codec_error_contract_on_truncated_payloads():
    """ADVICE r11: truncated payloads must raise ValueError (the
    documented error contract), never struct.error/IndexError leaking
    from the chunk/sub-block walks."""
    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_gif_frames,
        _det_image,
        gif_decode,
        gif_encode,
        png_decode,
        png_encode,
    )

    png = png_encode(_det_image(9))
    gif = gif_encode(_det_gif_frames(9))
    # cut points chosen to land mid-chunk-header, mid-body, mid-CRC
    for cut in (9, 14, 21, len(png) - 3):
        # cuts inside the first chunk HEADER exit the walk early and
        # surface as "missing IHDR"; cuts inside a body/CRC surface as
        # "truncated" — both inside the ValueError contract
        with _pytest.raises(ValueError, match="truncated|missing IHDR"):
            png_decode(png[:cut])
    for cut in (8, 14, len(gif) - 5):
        with _pytest.raises(ValueError, match="truncated"):
            gif_decode(gif[:cut])


def test_gif_local_color_table_rejected():
    """A spec-valid frame carrying a LOCAL color table would silently
    take the wrong RGB through the fixed global palette downstream —
    the decoder rejects it loudly like the other unsupported variants."""
    import struct

    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_gif_frames,
        gif_decode,
        gif_encode,
    )

    good = bytearray(gif_encode(_det_gif_frames(2)))
    # first image descriptor: find the 0x2C introducer after the
    # NETSCAPE extension, set the local-color-table flag and splice in
    # a 4-entry (2<<1) local table
    pos = good.index(0x2C, 13 + 768)
    fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", good[pos + 1 : pos + 10])
    assert iflags == 0
    good[pos + 9] = 0x80 | 0x01  # local table present, 4 entries
    patched = bytes(good[: pos + 10]) + b"\x00" * 12 + bytes(good[pos + 10 :])
    with _pytest.raises(ValueError, match="local color table"):
        gif_decode(patched)


def test_lzw_decode_without_leading_clear():
    """A spec-conforming LZW stream may omit the initial CLEAR; the
    decoder's pre-initialized table must decode it, not IndexError
    (ADVICE r11). Hand-packed: codes 1,2,3,EOI(=5) at width 3 for
    min_code=2 pack LSB-first to 0x91 0x2E."""
    from smartpool_bigdata_spark.ops.multimodal import _lzw_decode

    # width=3 codes 1,2,3,EOI(5), LSB-first:
    #   byte0 = 1 | 2<<3 | (3 & 0b11)<<6 = 0xD1
    #   byte1 = 3>>2 | 5<<1            = 0x0A
    assert _lzw_decode(bytes([0xD1, 0x0A]), min_code=2) == bytes([1, 2, 3])
    # and a genuinely corrupt FIRST code (beyond the initial table)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="corrupt LZW"):
        _lzw_decode(bytes([0x07]), min_code=2)


def test_wav_roundtrip_and_container_shape():
    """wav_encode emits a genuine RIFF/WAVE container (fmt + fact +
    data, word-aligned sizes); wav_decode inverts it exactly and the
    chunk walk skips the fact chunk generically."""
    import struct

    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import wav_decode, wav_encode

    rng = np.random.default_rng(7)
    for n, rate in [(1, 8000), (513, 16000), (4096, 24000)]:
        s = rng.integers(-32768, 32768, n).astype("<i2")
        data = wav_encode(s, rate)
        # container shape: RIFF size covers the whole body
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        (riff,) = struct.unpack("<I", data[4:8])
        assert 8 + riff == len(data)
        assert b"fmt " in data and b"fact" in data and b"data" in data
        back_rate, back = wav_decode(data)
        assert back_rate == rate
        assert np.array_equal(back, s)


def test_wav_decode_error_contract():
    import struct

    import numpy as np
    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import wav_decode, wav_encode

    good = wav_encode(np.arange(100, dtype="<i2"), 8000)
    with _pytest.raises(ValueError, match="signature"):
        wav_decode(b"JUNK" + good[4:])
    for cut in (10, 20, len(good) - 7):
        with _pytest.raises(ValueError, match="truncated"):
            wav_decode(good[:cut])
    # stereo / non-PCM / 8-bit all reject with the variant message
    bad_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    pos = good.index(b"fmt ") + 8
    patched = good[:pos] + bad_fmt + good[pos + 16 :]
    with _pytest.raises(ValueError, match="unsupported WAV"):
        wav_decode(patched)
    # data before fmt rejected
    with _pytest.raises(ValueError, match="data chunk before fmt"):
        wav_decode(
            b"RIFF" + struct.pack("<I", 4 + 8 + 2) + b"WAVE"
            + b"data" + struct.pack("<I", 2) + b"\x01\x00"
        )


def test_wav_synthesize_and_chunk_features(spark):
    """Spark-side loop: synthesize_wav -> wav_chunk_features recovers
    the container sample_rate and exact per-chunk integer features
    matching a pure-numpy recomputation of the waveform formula."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        synthesize_wav,
        wav_chunk_features,
    )

    ids = spark.createDataFrame([(2,), (771,)], ["doc_id"])
    feats = {
        (r["doc_id"], r["chunk_idx"]): (
            r["sample_rate"], r["n_samples"], r["peak"], r["sum_sq"]
        )
        for r in wav_chunk_features(synthesize_wav(ids)).collect()
    }
    for d in (2, 771):
        rate = 8000 * (1 + d % 3)
        n = 2048 + (d * 5) % 1536
        i = np.arange(n, dtype=np.int64)
        s = (d * 37 + i * 11) % 65536 - 32768
        for c0 in range(0, n, 512):
            ch = s[c0 : c0 + 512]
            want = (rate, len(ch), int(np.abs(ch).max()), int((ch * ch).sum()))
            assert feats[(d, c0 // 512)] == want

def test_mp4_roundtrip_and_container_shape():
    """mp4_encode emits a genuine ISO BMFF file (ftyp/mdat/moov with a
    full stsd/stts/stsc/stsz/stco sample table); mp4_decode inverts it
    exactly — frames, per-frame durations, track dims, timescale — and
    the sample spans really address PNG bytes inside mdat."""
    import struct

    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import mp4_decode, mp4_encode

    rng = np.random.default_rng(11)
    # 1 frame (single 1-sample chunk), even count (uniform pairs), odd
    # count >1 (trailing 1-sample chunk -> multi-run stsc)
    for nf, w, h in [(1, 6, 5), (4, 9, 7), (5, 16, 3)]:
        frames = [
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            for _ in range(nf)
        ]
        durs = [24 + (f % 2) * 12 for f in range(nf)]
        data = mp4_encode(frames, durs)
        assert data[4:8] == b"ftyp" and data[8:12] == b"qt  "
        (ftyp_sz,) = struct.unpack(">I", data[:4])
        assert data[ftyp_sz + 4 : ftyp_sz + 8] == b"mdat"
        bw, bh, ts, dur, out = mp4_decode(data)
        assert (bw, bh, ts, dur) == (w, h, 600, sum(durs))
        assert [fd for fd, _, _, _ in out] == durs
        for (fd, off, sz, px), fr in zip(out, frames):
            assert np.array_equal(px, fr)
            assert data[off : off + sz].startswith(b"\x89PNG")


def test_mp4_decode_error_contract():
    """ValueError — never IndexError/struct.error — on truncation,
    unsupported variants (64-bit boxes, version-1 headers, foreign
    codecs, multiple video tracks), and inconsistent sample tables."""
    import struct

    import numpy as np
    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_video,
        mp4_decode,
        mp4_encode,
    )

    good = mp4_encode(*_det_video(7))
    # EVERY prefix must raise ValueError (the documented contract), and
    # every single-byte flip must either still decode or raise ValueError
    for cut in range(0, len(good), 7):
        with _pytest.raises(ValueError):
            mp4_decode(good[:cut])
    for i in range(0, len(good), 11):
        mut = bytearray(good)
        mut[i] ^= 0xFF
        try:
            mp4_decode(bytes(mut))
        except ValueError:
            pass
    # 64-bit largesize box
    with _pytest.raises(ValueError, match="largesize"):
        mp4_decode(struct.pack(">I", 1) + b"mdat" + good)
    # version-1 header boxes
    pos = good.index(b"mdhd") + 4
    with _pytest.raises(ValueError, match="version-1"):
        mp4_decode(good[:pos] + b"\x01" + good[pos + 1 :])
    # foreign codec fourcc names the ffmpeg residue explicitly
    pos = good.index(b"png ", good.index(b"stsd"))
    with _pytest.raises(ValueError, match="avc1"):
        mp4_decode(good[:pos] + b"avc1" + good[pos + 4 :])
    # stts total vs mdhd duration: bump the first run's delta
    pos = good.index(b"stts") + 4 + 4 + 4  # tag + fullbox hdr + count
    (c0, d0) = struct.unpack(">II", good[pos : pos + 8])
    patched = good[:pos] + struct.pack(">II", c0, d0 + 1) + good[pos + 8 :]
    with _pytest.raises(ValueError, match="mdhd duration"):
        mp4_decode(patched)
    # a sample span pointing outside every mdat
    pos = good.index(b"stco") + 4 + 4 + 4
    patched = good[:pos] + struct.pack(">I", len(good)) + good[pos + 4 :]
    with _pytest.raises(ValueError, match="outside every mdat"):
        mp4_decode(patched)


def test_mp4_frame_stats_match_formula(spark):
    """Spark-side loop: synthesize_mp4 -> mp4_frame_stats emits one row
    per frame whose container timing AND pixel stats match a pure-numpy
    replay of the _det_video formula, with carry columns passing
    through (no join back to the source)."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        mp4_frame_stats,
        synthesize_mp4,
    )

    docs = spark.createDataFrame(
        [(3, "web"), (88, "print")], ["doc_id", "source"]
    )
    carry = {"source": "string"}
    rows = {
        (r["doc_id"], r["frame_idx"]): r
        for r in mp4_frame_stats(
            synthesize_mp4(docs, carry=carry), carry=carry
        ).collect()
    }
    for d, src in [(3, "web"), (88, "print")]:
        w = 6 + (d * 5) % 9
        h = 6 + (d * 3) % 7
        nf = 2 + d % 3
        assert sum(1 for k in rows if k[0] == d) == nf
        for f in range(nf):
            r = rows[(d, f)]
            y = np.arange(h)[:, None, None]
            x = np.arange(w)[None, :, None]
            c = np.arange(3)[None, None, :]
            px = (d * 29 + f * 23 + y * 17 + x * 5 + c * 11) % 256
            assert r["source"] == src
            assert (r["width"], r["height"]) == (w, h)
            assert (r["timescale"], r["frame_dur"]) == (600, 24 + (f % 2) * 12)
            assert r["px_sum"] == int(px.sum())
            assert r["px_min"] == int(px.min())
            assert r["px_max"] == int(px.max())
            assert r["frame_bytes"] > 0 and r["frame_offset"] >= 28

def test_jpeg_block_constant_roundtrip_exact():
    """For block-CONSTANT inputs the lossy JPEG pipeline is exact: the
    DCT concentrates each block into an integral DC coefficient, every
    AC quantizes to zero, and the full Huffman/DCT round-trip returns
    the input bit-for-bit (the property the SQL oracle relies on)."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_jpeg_image,
        jpeg_decode,
        jpeg_encode,
    )

    rng = np.random.default_rng(5)
    for bh, bw in [(1, 1), (3, 2), (2, 4)]:
        vals = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        w, h, back = jpeg_decode(jpeg_encode(img))
        assert (w, h) == (bw * 8, bh * 8)
        assert np.array_equal(back, img)
    for d in (0, 7, 123, 4567):
        img = _det_jpeg_image(d)
        _, _, back = jpeg_decode(jpeg_encode(img))
        assert np.array_equal(back, img)


def test_jpeg_general_roundtrip_near_lossless():
    """With unit quant tables, arbitrary images (including non-multiple-
    of-8 dims exercising replicate padding) round-trip within +-1 —
    the quantization-rounding bound; this pins the DCT/IDCT pair and
    the DC-differential chain beyond the exact block-constant case."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(17)
    for shape in [(8, 8), (5, 5), (17, 23), (48, 64)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        w, h, back = jpeg_decode(jpeg_encode(img))
        assert (w, h) == (shape[1], shape[0])
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_decode_error_contract():
    """ValueError — never IndexError/struct.error — on truncation and
    unsupported variants (progressive SOF2, 16-bit quant, restart
    intervals, multi-component color naming PIL)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_jpeg_image,
        jpeg_decode,
        jpeg_encode,
    )

    good = jpeg_encode(_det_jpeg_image(9))
    with _pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"JUNK" + good)
    for cut in range(0, len(good), 3):
        try:
            jpeg_decode(good[:cut])
        except ValueError:
            pass  # the only exception type the contract allows
    for i in range(len(good)):
        mut = bytearray(good)
        mut[i] ^= 0xFF
        try:
            jpeg_decode(bytes(mut))
        except ValueError:
            pass
    # progressive marker
    pos = good.index(b"\xff\xc0")
    with _pytest.raises(ValueError, match="progressive"):
        jpeg_decode(good[:pos] + b"\xff\xc2" + good[pos + 2 :])
    # 2-component frames are not a thing this decoder does
    pos = good.index(b"\xff\xc0") + 9  # component count byte in SOF0
    with _pytest.raises(ValueError, match="unsupported"):
        jpeg_decode(good[:pos] + b"\x02" + good[pos + 1 :])
    # an unsupported sampling layout (4:2:2) names the PIL residue
    color = jpeg_encode(
        np.stack([_det_jpeg_image(9)] * 3, axis=-1), subsampling="444"
    )
    pos = color.index(b"\xff\xc0") + 11  # Y sampling byte in SOF0
    assert color[pos] == 0x11
    with _pytest.raises(ValueError, match="PIL"):
        jpeg_decode(color[:pos] + b"\x21" + color[pos + 1 :])
    # 16-bit quant table precision
    pos = good.index(b"\xff\xdb") + 4
    with _pytest.raises(ValueError, match="16-bit"):
        jpeg_decode(good[:pos] + b"\x10" + good[pos + 1 :])
    # nonzero restart interval
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 8)
    pos = good.index(b"\xff\xda")
    with _pytest.raises(ValueError, match="restart"):
        jpeg_decode(good[:pos] + dri + good[pos:])


def test_jpeg_synthesize_and_stats_match_formula(spark):
    """Spark-side loop: synthesize_jpeg -> jpeg_pixel_stats recovers
    exact per-image stats matching the block formula, carry intact;
    decode_images sniffs the JPEG magic and decodes real (1 channel)."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        decode_images,
        jpeg_pixel_stats,
        synthesize_jpeg,
    )

    docs = spark.createDataFrame(
        [(4, "web"), (77, "print")], ["doc_id", "source"]
    )
    carry = {"source": "string"}
    payloads = synthesize_jpeg(docs, carry=carry)
    rows = {
        r["doc_id"]: r
        for r in jpeg_pixel_stats(payloads, carry=carry).collect()
    }
    for d, src in [(4, "web"), (77, "print")]:
        bw, bh = 1 + d % 3, 1 + (d * 2) % 3
        by = np.arange(bh)[:, None]
        bx = np.arange(bw)[None, :]
        v = (d * 41 + by * 13 + bx * 7) % 256
        r = rows[d]
        assert r["source"] == src
        assert (r["width"], r["height"]) == (bw * 8, bh * 8)
        assert r["px_sum"] == int(v.sum()) * 64
        assert (r["px_min"], r["px_max"]) == (int(v.min()), int(v.max()))
    dims = {r["doc_id"]: r for r in decode_images(payloads).collect()}
    assert dims[4]["n_channels"] == 1
    assert dims[77]["width"] == (1 + 77 % 3) * 8

def test_jpeg_color_roundtrip():
    """Color baseline JPEG (YCbCr, Annex K chrominance tables): gray
    inputs (R=G=B, Cb=Cr=128 exactly) survive BOTH sampling layouts
    bit-exact when block-constant; 4:4:4 random color round-trips
    within the conversion-rounding bound; 4:2:0 with 2x2-constant
    clip-free chroma round-trips within the same bound (the chroma
    subsample is exact there, isolating the conversion error)."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 256, (2, 3)).astype(np.uint8)
    gray = np.kron(vals, np.ones((16, 16), dtype=np.uint8))
    rgb = np.stack([gray] * 3, axis=-1)
    for ss in ("420", "444"):
        w, h, back = jpeg_decode(jpeg_encode(rgb, subsampling=ss))
        assert back.shape == rgb.shape
        assert np.array_equal(back, rgb), ss
    # 4:4:4: only YCbCr conversion + unit-quant rounding
    any_rgb = rng.integers(20, 236, (25, 33, 3)).astype(np.uint8)
    _, _, back = jpeg_decode(jpeg_encode(any_rgb, subsampling="444"))
    assert np.abs(back.astype(int) - any_rgb.astype(int)).max() <= 3
    # 4:2:0: construct from YCbCr with 2x2-constant chroma, clip-free
    yy = rng.integers(70, 180, (32, 48)).astype(np.float64)
    cb = np.kron(rng.integers(110, 146, (16, 24)).astype(np.float64),
                 np.ones((2, 2)))
    cr = np.kron(rng.integers(110, 146, (16, 24)).astype(np.float64),
                 np.ones((2, 2)))
    smooth = np.stack(
        [np.rint(yy + 1.402 * (cr - 128)),
         np.rint(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
         np.rint(yy + 1.772 * (cb - 128))],
        axis=-1,
    ).astype(np.uint8)
    _, _, back = jpeg_decode(jpeg_encode(smooth))
    assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 3
    # decode_images channel sniff rides the ndim
    from smartpool_bigdata_spark.ops.multimodal import jpeg_decode as jd

    assert jd(jpeg_encode(rgb))[2].ndim == 3
    assert jd(jpeg_encode(gray))[2].ndim == 2

def test_sample_frames_real_bmff_offsets(spark):
    """ISO BMFF payloads get REAL frame offsets resolved from the
    container's sample table (no pixel decode); non-BMFF payloads in
    the same batch keep the byte-stride fake. The offsets must equal
    what the full decoder reports for the same payload."""
    from smartpool_bigdata_spark.ops.multimodal import (
        _det_video,
        mp4_decode,
        mp4_encode,
        sample_frames,
    )

    payloads = {d: mp4_encode(*_det_video(d)) for d in (3, 10)}
    rows = [(d, p) for d, p in payloads.items()] + [(99, b"x" * 130)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {}
    for r in sample_frames(df, every_n_bytes=64).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["frame_idx"], r["frame_offset"])
        )
    for d, p in payloads.items():
        want = [
            (i, off)
            for i, (_, off, _, _) in enumerate(mp4_decode(p)[4])
        ]
        assert sorted(got[d]) == want
    assert sorted(got[99]) == [(0, 0), (1, 64), (2, 128)]  # fake path
    # with the fake disabled, BMFF rows still resolve real; the raw
    # payload now raises the explicit guard
    import pytest as _pytest

    with _pytest.raises(Exception, match="ffmpeg"):
        sample_frames(df, deterministic_fake=False).collect()
    bmff_only = spark.createDataFrame(
        [(3, payloads[3])], "doc_id long, payload binary"
    )
    n = sample_frames(bmff_only, deterministic_fake=False).count()
    assert n == len(mp4_decode(payloads[3])[4])

def test_resize_jpeg_real_path(spark):
    """Baseline JPEG payloads resize REAL: decode -> NN -> JPEG
    re-encode. Identity resize of a block-constant grayscale JPEG is
    bit-exact through BOTH codec passes; a downsize matches a pure-
    numpy NN recompute within the re-encode quantization bound."""
    import numpy as np

    from smartpool_bigdata_spark.ops.multimodal import (
        _det_jpeg_image,
        jpeg_decode,
        jpeg_encode,
        resize_images,
    )

    img = _det_jpeg_image(5)  # block-constant grayscale
    h, w = img.shape
    df = spark.createDataFrame(
        [(1, jpeg_encode(img))], "doc_id long, payload binary"
    )
    same = resize_images(df, target_w=w, target_h=h).collect()[0]
    assert (same["width"], same["height"]) == (w, h)
    _, _, back = jpeg_decode(bytes(same["payload"]))
    assert np.array_equal(back, img)  # exact through decode+NN+encode+decode
    half = resize_images(df, target_w=w // 2, target_h=h // 2).collect()[0]
    _, _, small = jpeg_decode(bytes(half["payload"]))
    ys = (np.arange(h // 2) * h) // (h // 2)
    xs = (np.arange(w // 2) * w) // (w // 2)
    want = img[ys][:, xs]
    assert np.abs(small.astype(int) - want.astype(int)).max() <= 1
