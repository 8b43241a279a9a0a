"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with metadata
columns (format, width/height or sample_rate, etc.). Decode /
feature-extract stages are actor-pool ``map_batches`` with small
batch sizes (payloads are wide — a 1 MB image × batch 64 × pool 8 =
512 MB in flight, so the defaults keep batches small and rely on
object-store backpressure).

Codecs: PPM/PGM (P6/P5) and uncompressed 8/24-bit BMP decode **for
real** in pure numpy (no imaging libraries ship in this container;
these formats need none). Other formats fall back to a deterministic
pseudo-decoder so the plumbing still runs end-to-end — swap in a PIL/
cv2 callable per actor when the libs exist.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray.data as rd


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for formats without a numpy codec:
    payload bytes → pseudo 8x8 grayscale."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8)


def _decode_pnm(payload: bytes) -> np.ndarray:
    """P5 (grayscale) / P6 (RGB, converted to luma) binary PNM."""
    # header: magic, whitespace-separated width height maxval (with
    # '#' comments), one whitespace byte, then the raster
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    if payload[:2] == b"P5":
        return np.frombuffer(payload, np.uint8, count=h * w, offset=pos).reshape(h, w).copy()
    rgb = np.frombuffer(payload, np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)
    return (rgb.astype(np.float64) @ [0.299, 0.587, 0.114]).astype(np.uint8)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 8-bit (index-as-gray) or 24-bit BMP → grayscale."""
    off = int(np.frombuffer(payload, "<u4", count=1, offset=10)[0])
    w = int(np.frombuffer(payload, "<i4", count=1, offset=18)[0])
    h = int(np.frombuffer(payload, "<i4", count=1, offset=22)[0])
    bpp = int(np.frombuffer(payload, "<u2", count=1, offset=28)[0])
    comp = int(np.frombuffer(payload, "<u4", count=1, offset=30)[0])
    if comp != 0 or bpp not in (8, 24):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    raster = np.frombuffer(payload, np.uint8, count=row_bytes * h, offset=off).reshape(
        h, row_bytes
    )
    if bpp == 8:
        img = raster[:, :w].copy()
    else:
        bgr = raster[:, : w * 3].reshape(h, w, 3).astype(np.float64)
        img = (bgr @ [0.114, 0.587, 0.299]).astype(np.uint8)  # BGR order
    return img[::-1].copy() if flip else img


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch by magic bytes: real PNM/BMP numpy decode, pseudo
    fallback otherwise."""
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    return _fake_decode_image(payload)


class DecodeImages:
    """binary → decoded grayscale pixels + shape metadata. The decode
    callable is installed once per actor; default dispatches on magic
    bytes (:func:`decode_image`)."""

    def __init__(self, decode: Optional[Callable[[bytes], np.ndarray]] = None):
        if decode is None:
            decode = decode_image
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


class ResizeImages:
    """Nearest-neighbor resize of decoded grayscale pixels to a fixed
    (h, w) — pure numpy index maps, built once per actor."""

    def __init__(self, height: int, width: int):
        self.h = height
        self.w = width

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_pix = []
        for pix, h, w in zip(
            batch.column("pixels").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("width").to_pylist(),
        ):
            img = np.frombuffer(pix, np.uint8).reshape(h, w)
            ri = (np.arange(self.h) * h // self.h).astype(np.int64)
            ci = (np.arange(self.w) * w // self.w).astype(np.int64)
            out_pix.append(img[ri][:, ci].tobytes())
        n = batch.num_rows
        out = batch.drop_columns(["pixels", "height", "width"])
        out = out.append_column("pixels", pa.array(out_pix, pa.binary()))
        out = out.append_column("height", pa.array(np.full(n, self.h, np.int32)))
        out = out.append_column("width", pa.array(np.full(n, self.w, np.int32)))
        return out


def resize_images(ds: rd.Dataset, height: int, width: int, *, batch_size: int = 64, concurrency=(2, 8)) -> rd.Dataset:
    return ds.map_batches(
        ResizeImages,
        fn_constructor_args=(height, width),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode: RIFF/WAVE PCM (8-bit unsigned / 16-bit
    signed, any channel count — averaged to mono) → (float64 samples
    in [-1, 1], sample_rate). Pure numpy chunk walk; WAV needs no
    codec library."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int(np.frombuffer(payload, "<u4", count=1, offset=pos + 4)[0])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int(np.frombuffer(fmt, "<u2", count=1)[0])
    channels = int(np.frombuffer(fmt, "<u2", count=1, offset=2)[0])
    rate = int(np.frombuffer(fmt, "<u4", count=1, offset=4)[0])
    bits = int(np.frombuffer(fmt, "<u2", count=1, offset=14)[0])
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if bits == 16:
        raw = np.frombuffer(data, "<i2", count=len(data) // 2)
        x = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, np.uint8)
        x = (raw.astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        n = (len(x) // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x, rate


class AudioFeatures:
    """Actor-pool stage: WAV payload column → scalar waveform features
    (duration, RMS energy, zero-crossing rate, peak). Stateful class
    so a model-based featurizer (or a codec for compressed formats)
    loads once per actor in ``__init__``."""

    def __init__(self, decode: Optional[Callable[[bytes], tuple]] = None):
        self.decode = decode or decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        dur = np.empty(len(payloads))
        rms = np.empty(len(payloads))
        zcr = np.empty(len(payloads))
        peak = np.empty(len(payloads))
        rates = np.empty(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            x, rate = self.decode(p)
            rates[i] = rate
            dur[i] = len(x) / rate if rate else 0.0
            if len(x):
                rms[i] = float(np.sqrt(np.mean(x * x)))
                zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                peak[i] = float(np.abs(x).max())
            else:
                rms[i] = zcr[i] = peak[i] = 0.0
        out = batch.drop_columns(["payload"])
        for name, arr in (
            ("sample_rate", rates),
            ("duration_s", dur),
            ("rms", rms),
            ("zcr", zcr),
            ("peak", peak),
        ):
            out = out.append_column(name, pa.array(arr))
        return out


def featurize_audio(
    ds: rd.Dataset, *, batch_size: int = 32, concurrency=(2, 8)
) -> rd.Dataset:
    """WAV payload table → per-clip waveform features (actor pool;
    small batches — audio payloads are wide)."""
    return ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
