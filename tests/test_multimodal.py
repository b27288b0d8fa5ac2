"""Multimodal plumbing: Arrow mapInPandas decode + frame fan-out.

Value parity with DuckDB runs in test_oracle_parity.py; here we pin the
contract: stubbed real mode, schema, determinism, fan-out bounds.
"""

from __future__ import annotations

import pytest

from w_userflow_featurestore_spark.operators import multimodal as MM


def _docs(spark):
    return spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon"), (2, "zeta eta theta")],
        "doc_id long, text string")


def test_real_decode_is_stubbed(spark):
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_media(MM.synthesize_media(_docs(spark)), decode="real")
    with pytest.raises(ValueError):
        MM.decode_media(MM.synthesize_media(_docs(spark)), decode="bogus")


def test_decode_schema_and_kind_rules(spark):
    out = {r["media_id"]: r
           for r in MM.multimodal_features(_docs(spark)).collect()}
    assert [f.name for f in MM.multimodal_features(_docs(spark)).schema] == [
        "media_id", "kind", "n_bytes", "width", "height", "duration_ms",
        "checksum"]
    assert (out[0]["kind"], out[1]["kind"], out[2]["kind"]) == (
        "image", "audio", "video")
    assert all(r["n_bytes"] == 32 for r in out.values())
    assert out[0]["duration_ms"] == 0          # images have no duration
    assert out[1]["width"] == 0                # audio has no dims
    assert out[2]["width"] >= 16 and out[2]["height"] >= 16


def test_decode_deterministic(spark):
    a = sorted(map(tuple, MM.multimodal_features(_docs(spark)).collect()))
    b = sorted(map(tuple, MM.multimodal_features(_docs(spark)).collect()))
    assert a == b


def test_frame_fanout_bounds_and_features(spark):
    decoded = MM.multimodal_features(_docs(spark))
    frames = MM.sample_frames(decoded, fps=1.0, max_frames=5).collect()
    assert frames, "video row must yield at least one frame"
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    checks = {r["media_id"]: r["checksum"] for r in decoded.collect()}
    for mid, rs in by_media.items():
        assert 1 <= len(rs) <= 5
        assert sorted(r["frame_idx"] for r in rs) == list(range(len(rs)))
        assert all(r["frame_checksum"] == checks[mid] + r["frame_idx"]
                   for r in rs)
    # only videos fan out
    kinds = {r["media_id"]: r["kind"] for r in decoded.collect()}
    assert all(kinds[m] == "video" for m in by_media)
