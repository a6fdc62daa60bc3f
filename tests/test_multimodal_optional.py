"""Multimodal real-codec tier: decode_fn="auto" dispatch.

Always-run tests pin the dispatch contract in THIS container (no codec
libs → "auto" falls back to the deterministic fake, bit-identical to the
default). The real_libs-marked tests run the same operators through
actual Pillow/soundfile decoders when those are importable (lib-enabled
environments / tools/integration_lane.sh) and skip cleanly here.
"""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark.datapipe.multimodal import (
    _resolve_decoder,
    audio_features,
    decode_image_features,
    frame_sample,
    phash_images,
    pil_image_decoder,
    resize_images,
    soundfile_audio_decoder,
)


def _media_df(spark, n=6):
    rng = np.random.default_rng(7)
    rows = [(i, bytes(rng.integers(0, 256, 200, dtype=np.uint8))) for i in range(n)]
    return spark.createDataFrame(rows, "id long, media binary")


def test_auto_dispatch_contract(spark):
    """'auto' without codec libs == the deterministic fake (bit-identical
    output); callables pass through; junk decode_fn values error loudly."""
    df = _media_df(spark)
    for op in (decode_image_features, resize_images, phash_images,
               audio_features, frame_sample):
        a = op(df, decode_fn=None).toPandas()
        b = op(df, decode_fn="auto").toPandas()
        keys = [c for c in a.columns if a[c].dtype.kind in "iuf"]
        a = a.sort_values(keys).reset_index(drop=True)
        b = b.sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="decode_fn"):
        decode_image_features(df, decode_fn=42)
    # explicit callable wins over everything
    own = lambda blob: np.full((4, 4), 0.5, dtype=np.float32)  # noqa: E731
    out = decode_image_features(df, decode_fn=own).toPandas()
    assert np.allclose(out["img_mean"], 0.5)


def test_resolver_prefers_real_factory():
    fake = lambda b: "fake"  # noqa: E731
    real = lambda b: "real"  # noqa: E731
    assert _resolve_decoder(None, lambda: real, fake) is fake
    assert _resolve_decoder("auto", lambda: real, fake) is real
    assert _resolve_decoder("auto", lambda: None, fake) is fake
    assert _resolve_decoder(real, lambda: None, fake) is real


@pytest.mark.real_libs
def test_pil_tier_real_decode(spark):
    """With Pillow installed, 'auto' decodes REAL image bytes: a solid
    8x8 PNG must produce exact mean/std and pixels through every image
    operator — same schemas as the fake path."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    assert pil_image_decoder() is not None

    def png_bytes(val, size=(8, 8)):
        buf = io.BytesIO()
        Image.new("L", size, val).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png_bytes(0)), (2, png_bytes(255)), (3, png_bytes(128, (16, 8)))],
        "id long, media binary",
    )
    out = decode_image_features(df, decode_fn="auto").toPandas().set_index("id")
    assert out.loc[1, "img_mean"] == 0.0 and out.loc[2, "img_mean"] == 1.0
    assert abs(out.loc[3, "img_mean"] - 128 / 255) < 1e-6
    assert out["img_std"].abs().max() < 1e-6  # solid images

    rs = resize_images(df, decode_fn="auto", height=4, width=4).toPandas().set_index("id")
    assert np.allclose(rs.loc[2, "pixels"], 1.0)
    ph = phash_images(df, decode_fn="auto").toPandas()
    assert len(ph) == 3  # solid images hash without error


@pytest.mark.real_libs
def test_soundfile_tier_real_decode(spark):
    """With soundfile installed, 'auto' decodes a real WAV: a pure sine
    has the analytic RMS (1/sqrt(2) of amplitude) and ~2f0/sr ZCR."""
    pytest.importorskip("soundfile")
    import io

    import soundfile as sf

    assert soundfile_audio_decoder() is not None
    sr, f0, amp = 8000, 100, 0.8
    t = np.arange(sr) / sr
    wave = (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    buf = io.BytesIO()
    sf.write(buf, wave, sr, format="WAV")
    df = spark.createDataFrame([(1, buf.getvalue())], "id long, media binary")
    out = audio_features(df, decode_fn="auto").toPandas()
    assert abs(out.loc[0, "rms"] - amp / np.sqrt(2)) < 1e-3
    assert abs(out.loc[0, "zcr"] - 2 * f0 / sr) < 1e-3
