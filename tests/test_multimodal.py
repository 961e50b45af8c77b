"""Multimodal plumbing: resize + frame-sample kernels over the
deterministic fake decode (real math, codec boundary stubbed)."""

import hashlib
import math

import numpy as np
import pytest

from closure_html_spark.spark import multimodal as M

SF = "/root/testdata/sf0.001"


def test_resize_identity_at_native_dims(spark):
    """Resizing to the native (meta.width, meta.height) is the identity
    index map: resized_sha equals the sha of the tiled source matrix and
    mean_px its exact mean.  Verified independently in numpy for the
    first rows."""
    media = M.media_from_documents(spark, SF).limit(6)
    rows = media.collect()
    for r in rows:
        w, h = r.meta.width, r.meta.height
        got = M.resize_media(
            media.filter(f"media_id = {r.media_id}"),
            out_w=w, out_h=h).collect()[0]
        px = M._fake_pixels(bytes(r.payload), w, h)
        assert got.resized_sha == hashlib.sha256(px.tobytes()).hexdigest()
        assert got.mean_px == pytest.approx(float(px.mean()))


def test_resize_known_tiny_case():
    """2x2 nearest-neighbor downsample of a hand-built 4x4 matrix."""
    px = M._fake_pixels(bytes(range(16)), 4, 4)
    yi = (np.arange(2) * 4) // 2
    xi = (np.arange(2) * 4) // 2
    rs = px[yi][:, xi]
    # index map picks rows/cols 0 and 2 -> values [[0,2],[8,10]]
    assert rs.tolist() == [[0, 2], [8, 10]]


def test_frame_sample_one_row_per_sampled_frame(spark):
    """Video rows explode to ceil(n_frames / k) output rows with the
    deterministic per-index digests; non-video rows contribute none."""
    media = M.media_from_documents(spark, SF)
    k = 5
    got = M.frame_sample(media, every_k=k).toPandas()
    vids = media.filter("mime = 'fake/video'").collect()
    expected = sum(math.ceil(r.meta.n_frames / k) for r in vids)
    assert len(got) == expected > 0
    r0 = vids[0]
    mine = got[got.media_id == r0.media_id].sort_values("frame_idx")
    assert list(mine.frame_idx) == list(range(0, r0.meta.n_frames, k))
    assert mine.iloc[0].frame_sha == hashlib.sha256(
        bytes(r0.payload) + (0).to_bytes(4, "big")).hexdigest()


def test_real_codec_honestly_stubbed(spark):
    """A non-fake mime must fail loudly at the codec boundary, not
    silently fake-decode."""
    media = (M.media_from_documents(spark, SF).limit(1)
             .withColumn("mime", M.F.lit("image/png")))
    with pytest.raises(Exception) as ei:
        M.resize_media(media).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)
