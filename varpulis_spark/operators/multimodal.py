"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface (BASELINE.json): a 100 TB training-data pipeline carries
media as `binary` columns with structured metadata; decode / resize /
frame-sample / feature-extract run as Arrow-batched pandas functions over
`mapInPandas`. The decode kernels themselves need codec libraries (PIL /
torchaudio / ffmpeg) that are NOT in this container — they are STUBBED:

- `codec="raw-fake"` (default in tests) decodes a deterministic fake format
  (documented header below) so the Spark-side plumbing — schema, batch
  iteration, partitioning, output shapes — is real and testable end-to-end.
- any other codec raises NotImplementedError at the call site with the
  library that a production deployment would plug in.

Fake format (deterministic, used by the test fixtures):
    bytes 0..2   magic b"FKI"
    byte  3      channels
    bytes 4..7   width  (big-endian u32)
    bytes 8..11  height (big-endian u32)
    bytes 12..   payload (row-major pixel bytes, possibly truncated)

Scale design: all functions are mapInPandas iterators — no driver collect,
no per-row Python UDF dispatch; media bytes never leave the executor. Wide
binary rows make parquet row groups large: pair these with
`spark.sql.files.maxPartitionBytes` tuning and column pruning (select the
metadata struct, not the bytes, whenever the kernel doesn't need payload).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


def make_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Encode a deterministic fake image (test fixture helper)."""
    rng = np.random.RandomState(seed)
    payload = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return b"FKI" + bytes([channels]) + struct.pack(">II", width, height) + payload.tobytes()


def encode_fake_images(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    content_col: str = "content",
) -> DataFrame:
    """Derive a deterministic fake-image binary column from a text table —
    the fixture generator for driver-checkable multimodal queries (no media
    table ships in the test corpus, so the image is a pure function of the
    row: width = 16 + id % 32, height = 16 + 7·id % 32,
    channels = 1 + id % 3, payload = the utf-8 text bytes). Runs as the
    same Arrow-batched mapInPandas shape a real transcoder would."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                w, h, c = 16 + int(i) % 32, 16 + (int(i) * 7) % 32, 1 + int(i) % 3
                bufs.append(
                    b"FKI" + bytes([c]) + struct.pack(">II", w, h)
                    + str(t).encode("utf-8")
                )
            out = pdf.copy()
            out[content_col] = bufs
            yield out

    out_schema = ", ".join(f"{n} {t}" for n, t in df.dtypes) + f", {content_col} binary"
    return df.mapInPandas(run, out_schema)


def _decode_fake(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    if buf[:3] != b"FKI":
        raise ValueError("not a fake image")
    channels = buf[3]
    width, height = struct.unpack(">II", buf[4:12])
    payload = np.frombuffer(buf[12:], dtype=np.uint8)
    want = width * height * channels
    if len(payload) < want:
        payload = np.pad(payload, (0, want - len(payload)))
    return payload[:want].reshape(height, width, channels), width, height, channels


def _require_codec(codec: str) -> None:
    if codec != "raw-fake":
        raise NotImplementedError(
            f"codec {codec!r} needs an image library (PIL/opencv) not present "
            "in this environment; the raw-fake codec exercises the full "
            "Spark plumbing"
        )


def decode_metadata(
    df: DataFrame, content_col: str = "content", codec: str = "raw-fake"
) -> DataFrame:
    """Append an image metadata struct decoded from the binary header."""
    _require_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for buf in pdf[content_col]:
                try:
                    _, w, h, c = _decode_fake(bytes(buf))
                    metas.append((w, h, c, "raw-fake"))
                except (ValueError, struct.error):
                    metas.append((None, None, None, None))
            meta = pd.DataFrame(metas, columns=["width", "height", "channels", "format"])
            out = pdf.drop(columns=[content_col]).reset_index(drop=True)
            yield pd.concat([out, meta], axis=1)

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes if name != content_col
    ) + ", " + IMAGE_META_SCHEMA
    return df.mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    codec: str = "raw-fake",
) -> DataFrame:
    """Nearest-neighbor resize of the binary image column (stub kernel with
    real decode→transform→re-encode batch plumbing)."""
    _require_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bufs = []
            for buf in pdf[content_col]:
                img, w, h, c = _decode_fake(bytes(buf))
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                resized = img[np.ix_(ys, xs)]
                out_bufs.append(
                    b"FKI" + bytes([c]) + struct.pack(">II", width, height) + resized.tobytes()
                )
            pdf = pdf.copy()
            pdf[content_col] = out_bufs
            yield pdf

    return df.mapInPandas(run, df.schema)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    content_col: str = "content",
    codec: str = "raw-fake",
) -> DataFrame:
    """Per-image feature vector (channel/patch means — the deterministic
    stand-in for a real vision-encoder Pandas UDF)."""
    _require_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf[content_col]:
                img, w, h, c = _decode_fake(bytes(buf))
                flat = img.astype(np.float64).ravel()
                chunks = np.array_split(flat, dim)
                feats.append([float(ch.mean()) if len(ch) else 0.0 for ch in chunks])
            out = pdf.drop(columns=[content_col]).reset_index(drop=True)
            out["features"] = feats
            yield out

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes if name != content_col
    ) + ", features array<double>"
    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    frame_bytes: int = 64,
) -> DataFrame:
    """Video frame sampling stub: treat the payload as a sequence of
    fixed-size frames, keep every n-th (one output row per kept frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # row-expansion via index repeat + per-row frame slicing
            # (itertuples beats iterrows ~10x; the heavy column stays bytes)
            bufs = [bytes(b) for b in pdf[content_col]]
            counts = [
                len(range(0, max(1, len(b) // frame_bytes), every_n)) for b in bufs
            ]
            out = pdf.loc[pdf.index.repeat(counts)].reset_index(drop=True)
            frame_idx: list[int] = []
            frames: list[bytes] = []
            for b in bufs:
                for fi in range(0, max(1, len(b) // frame_bytes), every_n):
                    frame_idx.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            out["frame_index"] = frame_idx
            out[content_col] = frames
            yield out

    out_schema = ", ".join(f"{n} {t}" for n, t in df.dtypes) + ", frame_index int"
    return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# audio (fake PCM codec, same plumbing contract as the image ops)
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = "sample_rate int, n_samples int, format string"


def encode_fake_audio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    content_col: str = "audio",
) -> DataFrame:
    """Derive a deterministic fake-audio binary column (the audio leg of
    the fixture family): header b"FKA" + sample_rate (u32 BE, 8000 +
    1000·(id % 5)) + int16-LE PCM synthesized from the utf-8 text bytes
    (sample[i] = (byte[i % len] − 128) · 256 · a decaying envelope) — a
    pure function of the row, so feature kernels verify against numpy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                sr = 8000 + (int(i) % 5) * 1000
                raw = np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8)
                if raw.size == 0:
                    raw = np.zeros(1, dtype=np.uint8)
                n = raw.size * 4  # stretch: 4 samples per text byte
                base = (raw.astype(np.int32) - 128) * 256
                pcm = np.repeat(base, 4)
                env = np.linspace(1.0, 0.25, n)
                samples = (pcm * env).astype("<i2")
                bufs.append(b"FKA" + struct.pack(">I", sr) + samples.tobytes())
            out = pdf.copy()
            out[content_col] = bufs
            yield out

    out_schema = ", ".join(f"{n} {t}" for n, t in df.dtypes) + f", {content_col} binary"
    return df.mapInPandas(run, out_schema)


def _decode_fake_audio(buf: bytes) -> tuple[np.ndarray, int]:
    if buf[:3] != b"FKA":
        raise ValueError("not fake audio")
    (sr,) = struct.unpack(">I", buf[3:7])
    return np.frombuffer(buf[7:], dtype="<i2").astype(np.float64) / 32768.0, sr


def audio_features(
    df: DataFrame,
    content_col: str = "audio",
    frame: int = 1024,
    hop: int = 512,
    codec: str = "raw-fake",
) -> DataFrame:
    """Framed audio features (the torchaudio/librosa slot, stubbed to the
    fake codec): per frame of `frame` samples every `hop`, emit RMS energy
    and zero-crossing rate — one output row per frame (row expansion like
    `sample_frames`). Real codecs raise NotImplementedError naming the
    library; the numpy kernel, batch iteration, and output schema are the
    production shapes."""
    if codec != "raw-fake":
        raise NotImplementedError(
            f"codec {codec!r} needs an audio library (torchaudio/librosa/"
            "soundfile) not present in this environment; the raw-fake codec "
            "exercises the full Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(b) for b in pdf[content_col]]
            counts: list[int] = []
            fidx, srs, rmss, zcrs = [], [], [], []
            for b in bufs:
                x, sr = _decode_fake_audio(b)
                if x.size >= frame:
                    # vectorized framing: stride-tricks windows, one RMS
                    # reduction and one zero-crossing pass per doc (the
                    # per-frame python loop was 6M iterations at sf1 —
                    # 22.8 s; this kernel: 1.5 s)
                    win = np.lib.stride_tricks.sliding_window_view(x, frame)[::hop]
                    rms = np.sqrt(np.mean(win * win, axis=1))
                    zc = (np.signbit(x[1:]) != np.signbit(x[:-1])).astype(np.float64)
                    zwin = np.lib.stride_tricks.sliding_window_view(zc, frame - 1)[::hop]
                    zcr = zwin[: len(rms)].mean(axis=1)
                    n_frames = len(rms)
                else:
                    seg = x if x.size else np.zeros(1)
                    rms = np.array([np.sqrt(np.mean(seg * seg))])
                    zcr = np.array([
                        float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
                        if seg.size > 1 else 0.0
                    ])
                    n_frames = 1
                counts.append(n_frames)
                fidx.append(np.arange(n_frames))
                srs.append(np.full(n_frames, sr, dtype=np.int64))
                rmss.append(rms)
                zcrs.append(zcr)
            out = pdf.drop(columns=[content_col])
            out = out.loc[out.index.repeat(counts)].reset_index(drop=True)
            out["frame_index"] = np.concatenate(fidx) if fidx else []
            out["sample_rate"] = np.concatenate(srs) if srs else []
            out["rms"] = np.concatenate(rmss) if rmss else []
            out["zcr"] = np.concatenate(zcrs) if zcrs else []
            yield out

    out_schema = ", ".join(
        f"{n} {t}" for n, t in df.dtypes if n != content_col
    ) + ", frame_index int, sample_rate int, rms double, zcr double"
    return df.mapInPandas(run, out_schema)
