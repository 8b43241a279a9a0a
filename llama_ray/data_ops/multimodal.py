"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with metadata
columns (format, width/height or sample_rate, etc.). Decode /
feature-extract stages are actor-pool ``map_batches`` with small
batch sizes (payloads are wide — a 1 MB image × batch 64 × pool 8 =
512 MB in flight, so the defaults keep batches small and rely on
object-store backpressure).

The actual codec calls are STUBBED (no imaging/audio libraries ship
in this container): ``decode=None`` uses a deterministic fake decoder
so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested; pass a real decode callable when
the libs exist.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray.data as rd


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: payload bytes → pseudo 8x8 grayscale."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8)


class DecodeImages:
    """binary → decoded pixels + shape metadata. Real decoders (PIL /
    cv2) would be imported and initialised here, once per actor."""

    def __init__(self, decode: Optional[Callable[[bytes], np.ndarray]] = None):
        if decode is None:
            decode = _fake_decode_image  # STUB: container has no image libs
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        pixels, heights, widths = [], [], []
        for p in payloads:
            img = self.decode(p)
            pixels.append(img.tobytes())
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        out = batch.drop_columns(["payload"])
        out = out.append_column("pixels", pa.array(pixels, pa.binary()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("width", pa.array(widths, pa.int32()))
        return out


class ImageFeatures:
    """Decoded pixels → cheap feature vector (mean/std/histogram) —
    the shape of a model-inference stage without the model."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for pix, h, w in zip(
            batch.column("pixels").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("width").to_pylist(),
        ):
            img = np.frombuffer(pix, np.uint8).reshape(h, w).astype(np.float64)
            hist, _ = np.histogram(img, bins=8, range=(0, 256))
            feats.append(
                np.concatenate([[img.mean(), img.std()], hist / max(1, img.size)]).astype(
                    np.float32
                )
            )
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def decode_and_featurize_images(
    ds: rd.Dataset,
    *,
    decode: Optional[Callable] = None,
    batch_size: int = 64,
    concurrency=(2, 8),
) -> rd.Dataset:
    """payload binary column → features list<float32> column."""
    decoded = ds.map_batches(
        DecodeImages,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return decoded.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def sample_frames(
    ds: rd.Dataset, *, every_nth: int = 10, frame_col: str = "frame_index"
) -> rd.Dataset:
    """Frame-sampling for video tables: keep every Nth frame row
    (vectorized filter; a table of (video_id, frame_index, payload))."""
    def keep(t: pa.Table) -> pa.Table:
        idx = t.column(frame_col).combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(idx % every_nth == 0))

    return ds.map_batches(keep, batch_format="pyarrow")
