import pyarrow as pa
import pytest

from crawling_infrastructure_ray.sources.corpus import make_spans, spans_arrow_type
from crawling_infrastructure_ray.stages.multimodal import (
    DecodeStub, ResizeStub, frame_sample_plan, media_rows_from_spans)


def _doc_batch():
    spans = [make_spans(f"http://h{i}.example/p{i}", seed=42) for i in range(20)]
    return pa.table({"doc_id": pa.array([f"d{i}" for i in range(20)]),
                     "spans": pa.array(spans, spans_arrow_type())})


def test_media_rows_from_spans():
    out = media_rows_from_spans(_doc_batch())
    assert out.num_rows > 0
    assert set(out["media_type"].to_pylist()) <= {"image", "audio", "video"}
    assert all(r.startswith("m://") for r in out["media_ref"].to_pylist())
    # deterministic
    assert out.equals(media_rows_from_spans(_doc_batch()))


def test_decode_stub_fake_and_strict():
    media = media_rows_from_spans(_doc_batch())
    out = DecodeStub(mode="fake")(media)
    feats = out["features"].to_pylist()
    assert all(len(f) == DecodeStub.FEATURE_DIM for f in feats)
    assert all(0.0 <= x <= 1.0 for f in feats for x in f)
    with pytest.raises(NotImplementedError):
        DecodeStub(mode="strict")(media)
    with pytest.raises(ValueError):
        DecodeStub(mode="bogus")


def test_resize_stub_aspect():
    media = media_rows_from_spans(_doc_batch())
    out = ResizeStub(max_side=256)(media)
    for w, h, rw, rh in zip(out["width"].to_pylist(), out["height"].to_pylist(),
                            out["resized_w"].to_pylist(), out["resized_h"].to_pylist()):
        assert 1 <= max(rw, rh) <= 256
        assert (w >= h) == (rw >= rh)  # orientation preserved
        if max(w, h) <= 256:           # no upscaling
            assert (rw, rh) == (w, h)


def test_frame_sample_plan():
    media = media_rows_from_spans(_doc_batch())
    plan = frame_sample_plan(media, every_ms=60_000)
    vids = media.filter(pa.compute.equal(media["media_type"], "video"))
    if vids.num_rows:
        assert plan.num_rows >= vids.num_rows  # ≥1 frame per video
        assert all(t % 60_000 == 0 for t in plan["frame_ts_ms"].to_pylist())
