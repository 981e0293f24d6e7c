"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition sizing,
UDF signatures) is real and tested; the codec work is OPPORTUNISTIC —
``_decode_image_impl`` tries a real Pillow decode at call time and raises
``NotImplementedError`` only when no image library is importable (this
container ships none). ``deterministic_fake=True`` selects a library-free
fake that derives features from the payload bytes, so tests and oracles
exercise the full distributed path end to end either way.

Scale notes: payloads stay in executor memory exactly one Arrow batch at a
time (mapInPandas iterator); never groupBy on payload columns; metadata
extraction is pure column expressions so pruning works without touching
payload bytes when the reader projects them out.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, feat array<double>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def binary_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """(id, n_bytes, header_hex, payload_sha256) — metadata without any
    decode; pure column expressions over the binary column."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.octet_length(b).alias("n_bytes"),
        F.hex(F.substring(b, 1, 4)).alias("header_hex"),
        F.sha2(b, 256).alias("payload_sha256"),
    )


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path, active iff an image library is importable in the
    executor's Python (opportunistic — this container ships none, so the
    import guard keeps the distributed plumbing usable either way).
    Feature: decode -> grayscale -> 8 equal row bands -> band mean / 255,
    matching the fake's 8-dim shape."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an image codec library (e.g. Pillow) in "
            "the executor Python; none is installed in this container — "
            "pass deterministic_fake=True for the library-free test path"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        arr = np.asarray(im.convert("L"), dtype=np.float64)
    bands = np.array_split(arr, 8, axis=0)
    return np.array(
        [b.mean() / 255.0 if b.size else 0.0 for b in bands], dtype=np.float64
    )


def _decode_image_impl(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    """Deterministic fake (oracle path) or opportunistic real decode. The
    fake is a deterministic 8-dim feature from the bytes:
    feat[j] = mean of bytes at positions p ≡ j (mod 8), p < 1024, / 255,
    all in float64 — integer byte sums are exact, so the DuckDB oracle
    (avg over the same stride) reproduces it bit-for-bit."""
    if not deterministic_fake:
        return _decode_image_real(payload)
    arr = np.frombuffer(payload[:1024], dtype=np.uint8).astype(np.float64)
    out = np.zeros(8, dtype=np.float64)
    for j in range(8):
        stride = arr[j::8]
        if stride.size:
            out[j] = stride.mean() / 255.0
    return out


def image_features(
    df: DataFrame, id_col: str, bin_col: str, deterministic_fake: bool = False
) -> DataFrame:
    """Distributed feature extraction over binary payloads via mapInPandas
    (one Arrow batch resident per task)."""
    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_impl(bytes(p), deterministic_fake).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feat": feats,
                }
            )

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame, id_col: str, bin_col: str, every_n_bytes: int = 4096,
    deterministic_fake: bool = False,
) -> DataFrame:
    """STUB video frame sampler: emits one row per sampled 'frame'. The
    real path would demux/decode; the fake slices the payload every
    ``every_n_bytes`` so the one-to-many Arrow batch shape is exercised."""
    if not deterministic_fake:
        raise NotImplementedError(
            "video demux requires a codec library (not in this container); "
            "pass deterministic_fake=True for the test path"
        )
    import hashlib

    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_sha = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                for i, s in enumerate(range(0, max(len(p), 1), every_n_bytes)):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_sha.append(hashlib.sha256(p[s : s + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_sha256": out_sha}
            )

    return src.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
