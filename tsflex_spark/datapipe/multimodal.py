"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (image/audio libs are not in this container —
``decode_fn=None`` uses a deterministic fake so the Spark-side plumbing is
fully testable). ``decode_fn="auto"`` upgrades to a real codec when the
library is importable (Pillow for images, soundfile for audio) and falls
back to the fake otherwise; ``decode_fn=None`` is ALWAYS the fake (the
oracle-stable default). The real structure — schema contracts, Arrow
batch shape, ``mapInPandas`` signatures, partition sizing — is
production-shaped:

- media rows are ``(id, media binary, meta struct)``;
- decode/feature-extract run as ``mapInPandas`` (arrow batches, streaming
  iterator — constant memory per task no matter the file sizes);
- batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set it low for large blobs — 10 MB blobs × 10k default batch = OOM);
- outputs are fixed-size float arrays / scalars, never re-encoded blobs,
  so downstream stays columnar.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: 8x8 grayscale derived
    from the blob bytes. Replace with PIL/cv2 in production."""
    if blob is None or len(blob) == 0:
        return np.zeros((8, 8), dtype=np.float32)
    arr = np.frombuffer(blob[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.reshape(8, 8) / 255.0).astype(np.float32)


# --------------------------------------------- optional real-codec tier
def pil_image_decoder() -> Optional[Callable[[bytes], np.ndarray]]:
    """A real Pillow-backed decoder (bytes → float32 grayscale in [0, 1])
    when Pillow is importable, else None. The import happens HERE (driver
    side, once) — the returned closure imports lazily per executor so it
    cloudpickles cleanly."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return None

    def decode(blob: bytes) -> np.ndarray:
        import io

        from PIL import Image

        if blob is None or len(blob) == 0:
            return np.zeros((8, 8), dtype=np.float32)
        img = Image.open(io.BytesIO(blob)).convert("L")
        return (np.asarray(img, dtype=np.float32) / 255.0).astype(np.float32)

    return decode


def soundfile_audio_decoder() -> Optional[Callable[[bytes], np.ndarray]]:
    """A real soundfile-backed decoder (bytes → float32 mono waveform in
    [-1, 1]) when soundfile is importable, else None."""
    try:
        import soundfile  # noqa: F401
    except ImportError:
        return None

    def decode(blob: bytes) -> np.ndarray:
        import io

        import soundfile as sf

        if blob is None or len(blob) == 0:
            return np.zeros(16, dtype=np.float32)
        data, _rate = sf.read(io.BytesIO(blob), dtype="float32", always_2d=True)
        return data.mean(axis=1).astype(np.float32)  # downmix to mono

    return decode


def _resolve_decoder(decode_fn, real_factory, fake):
    """Decoder dispatch shared by every multimodal op:

    - a callable is used as-is (production: pass your own codec);
    - ``"auto"`` upgrades to the real library decoder when the lib is
      importable and falls back to the deterministic fake otherwise;
    - ``None`` is ALWAYS the deterministic fake — the oracle-stable
      default, identical output in every environment (the driver's
      DuckDB gate replays the fake's byte math; a lib-dependent default
      would silently change gate results between environments).
    """
    if callable(decode_fn):
        return decode_fn
    if decode_fn == "auto":
        real = real_factory()
        return real if real is not None else fake
    if decode_fn is None:
        return fake
    raise ValueError(f"decode_fn must be a callable, 'auto', or None; got {decode_fn!r}")


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    decode_fn: Union[Callable[[bytes], "np.ndarray"], str, None] = None,
    batch_size_hint: int = 64,
) -> DataFrame:
    """binary blobs → per-image feature vector (mean/std/histogram-ish).

    ``decode_fn``: bytes → 2-D ndarray. None uses the deterministic fake
    (container has no image libs); pass a real decoder in production.
    """
    decode = _resolve_decoder(decode_fn, pil_image_decoder, _fake_decode)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("img_mean", T.DoubleType()),
            T.StructField("img_std", T.DoubleType()),
            T.StructField("img_vec", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # one arrow batch at a time — bounded memory
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                img = decode(blob)
                # stats in float64 over the float32 pixels: deterministic
                # and bit-matchable by a double-precision SQL oracle
                img64 = np.asarray(img, dtype=np.float64)
                rows.append(
                    {
                        id_col: _id,
                        "img_mean": float(img64.mean()),
                        "img_std": float(img64.std()),
                        "img_vec": img.ravel()[:16].astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, media_col).mapInPandas(run, schema)


def _fake_decode_audio(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: bytes → centered
    float waveform in [-1, 1). Replace with soundfile/librosa in
    production."""
    if blob is None or len(blob) == 0:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
    return (arr - 128.0) / 128.0


def audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    frame_len: int = 32,
    decode_fn: Union[Callable[[bytes], "np.ndarray"], str, None] = None,
) -> DataFrame:
    """Audio blobs → per-clip waveform features: RMS, zero-crossing rate,
    and per-frame RMS envelope (fixed ``frame_len`` sample frames).

    Same production shape as the image path: ``mapInPandas`` over binary,
    streaming Arrow batches, fixed-size numeric outputs (never re-encoded
    blobs). The decode is the deterministic fake (no audio libs in this
    container); pass ``decode_fn`` for a real codec.
    """
    decode = _resolve_decoder(decode_fn, soundfile_audio_decoder, _fake_decode_audio)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
            T.StructField("rms_frames", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                w = np.asarray(decode(blob), dtype=np.float64)
                n = len(w)
                rms = float(np.sqrt((w**2).mean())) if n else 0.0
                zcr = (
                    float((np.signbit(w[1:]) != np.signbit(w[:-1])).mean())
                    if n > 1
                    else 0.0
                )
                n_frames = n // frame_len
                frames = (
                    np.sqrt(
                        (w[: n_frames * frame_len].reshape(n_frames, frame_len) ** 2).mean(1)
                    ).astype(np.float32)
                    if n_frames
                    else np.zeros(0, dtype=np.float32)
                )
                rows.append(
                    {id_col: _id, "rms": rms, "zcr": zcr, "rms_frames": frames.tolist()}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, media_col).mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    height: int = 4,
    width: int = 4,
    decode_fn: Union[Callable[[bytes], "np.ndarray"], str, None] = None,
) -> DataFrame:
    """Resize to ``(height, width)`` via nearest-neighbor index sampling —
    pure numpy (deterministic, no image libs), the standard preprocessing
    step before batching pixels into a training tensor. Output is the
    flattened float array plus the new typed metadata, never a re-encoded
    blob (downstream stays columnar).
    """
    decode = _resolve_decoder(decode_fn, pil_image_decoder, _fake_decode)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pixels", T.ArrayType(T.FloatType())),
            T.StructField("meta", IMAGE_META_SCHEMA),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                img = np.asarray(decode(blob), dtype=np.float32)
                h, w = img.shape[:2]
                ri = (np.arange(height) * h) // height
                ci = (np.arange(width) * w) // width
                small = img[np.ix_(ri, ci)]
                rows.append(
                    {
                        id_col: _id,
                        "pixels": small.ravel().astype(np.float32).tolist(),
                        "meta": {"width": width, "height": height, "format": "raw_f32"},
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, media_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    every_nth: int = 10,
    decode_fn: Union[Callable[[bytes], "np.ndarray"], str, None] = None,
) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame
    ``(id, frame_idx, frame_vec)`` — a 1→N ``mapInPandas`` (UDTF shape).

    The fake treats every 64-byte window of the blob as one "frame".
    No public pure-python video codec exists, so ``"auto"`` stays the
    fake here — a real pipeline passes its own per-frame ``decode_fn``
    (e.g. an av/ffmpeg wrapper yielding frame arrays).
    """
    decode = _resolve_decoder(decode_fn, lambda: None, _fake_decode)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_vec", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                blob = blob or b""
                n_frames = max(len(blob) // 64, 1)
                for k in range(0, n_frames, every_nth):
                    frame = decode(blob[k * 64 : (k + 1) * 64])
                    rows.append(
                        {
                            id_col: _id,
                            "frame_idx": k,
                            "frame_vec": frame.ravel()[:8].astype(np.float32).tolist(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, media_col).mapInPandas(run, schema)


def phash_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    decode_fn: Union[Callable[[bytes], "np.ndarray"], str, None] = None,
) -> DataFrame:
    """64-bit perceptual hashes per image: aHash (pixel vs mean) and
    dHash (horizontal gradient sign) over an 8×(8|9) nearest-neighbor
    downscale — the standard image near-dup fingerprints (visually
    similar images differ in a few bits; recompression/resizing barely
    moves them). Decode is the container fake unless ``decode_fn`` is a
    real decoder; the hash math is the production algorithm.
    """
    decode = _resolve_decoder(decode_fn, pil_image_decoder, _fake_decode)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("ahash", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def _down(img: np.ndarray, h: int, w: int) -> np.ndarray:
        H, W = img.shape[:2]
        ri = (np.arange(h) * H) // h
        ci = (np.arange(w) * W) // w
        return img[np.ix_(ri, ci)].astype(np.float64)

    def _bits_to_i64(bits: np.ndarray) -> int:
        v = 0
        for b in bits.ravel():
            v = (v << 1) | int(b)
        return v - (1 << 64) if v >= (1 << 63) else v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                img = np.asarray(decode(blob), dtype=np.float64)
                a8 = _down(img, 8, 8)
                ah = _bits_to_i64(a8 > a8.mean())
                d9 = _down(img, 8, 9)
                dh = _bits_to_i64(d9[:, 1:] > d9[:, :-1])
                rows.append({id_col: _id, "ahash": ah, "dhash": dh})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, media_col).mapInPandas(run, schema)


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    num_bands: Optional[int] = None,
) -> DataFrame:
    """Image near-dup candidate pairs from 64-bit perceptual hashes:
    band the hash into ``num_bands`` chunks and equi-self-join per band
    (two hashes within ``max_hamming`` bits share at least one identical
    band when ``max_hamming < num_bands`` by pigeonhole — same
    construction as SimHash bucketing; never all-pairs), then verify
    exact hamming distance with ``bit_count(a XOR b)`` in codegen.
    Returns (id_a, id_b, hamming) with id_a < id_b.

    ``num_bands`` defaults to ``max_hamming + 1`` — the minimum that
    makes the pigeonhole recall guarantee hold. An explicit
    ``num_bands <= max_hamming`` raises: such a join silently drops
    pairs whose differing bits land one-per-band.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    if num_bands is None:
        num_bands = max_hamming + 1
    elif num_bands <= max_hamming:
        raise ValueError(
            f"num_bands ({num_bands}) must exceed max_hamming ({max_hamming}): "
            "with <= max_hamming bands a pair can differ one-bit-per-band and "
            "share no band, silently escaping the candidate join"
        )
    num_bands = min(num_bands, 64)
    width = 64 // num_bands
    bands = hashes.select(
        F.col(id_col),
        F.col(hash_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(hash_col), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(num_bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("__ha"), "band", "band_val"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("__hb"), "band", "band_val"
    )
    pairs = (
        a.join(b, on=["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ha", "__hb")
        .distinct()
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("id_a", "id_b", "hamming")
    )


def audio_fingerprints(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    decode_fn: Union[Callable[[bytes], "np.ndarray"], str, None] = None,
) -> DataFrame:
    """64-bit audio fingerprint: the clip resamples (by frame-mean) to a
    64-point RMS energy contour; bit b = 1 iff energy rises from point
    b to b+1 (circular) — the energy-gradient-sign construction
    (a coarse cousin of Chromaprint's gradient bits; robust to gain and
    mild noise, cheap everywhere). Near-dup pairs come from
    ``image_neardup_pairs(hashes, hash_col="afp")`` — the hamming-band
    machinery is modality-agnostic.
    """
    decode = _resolve_decoder(decode_fn, soundfile_audio_decoder, _fake_decode_audio)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("afp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                w = np.asarray(decode(blob), dtype=np.float64)
                if len(w) < 64:
                    w = np.pad(w, (0, 64 - len(w)))
                # 64 equal frames → per-frame RMS energy
                n = (len(w) // 64) * 64
                e = np.sqrt((w[:n].reshape(64, -1) ** 2).mean(1))
                bits = e < np.roll(e, -1)  # rising-energy sign, circular
                v = 0
                for b in bits:
                    v = (v << 1) | int(b)
                v = v - (1 << 64) if v >= (1 << 63) else v
                rows.append({id_col: _id, "afp": v})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, media_col).mapInPandas(run, schema)
