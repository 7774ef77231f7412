"""Multimodal binary-column plumbing: Arrow-batched byte features, stubbed
decode with schema-correct fakes, frame-sampling fan-out."""

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


def test_decode_stub_raises_without_fake(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_images(media)


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
    with _pytest.raises(NotImplementedError):
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
