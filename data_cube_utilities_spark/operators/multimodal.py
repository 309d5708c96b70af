"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-vectorized UDFs.

Image path is REAL end to end (codec.py raw16/pngz). Audio decode and video
frame extraction are STUBS by design — no soundfile/ffmpeg/PIL exists in
this container — but everything Spark-side is real and tested: the typed
schemas, the mapInPandas batch shape, partitioning behavior, and the
deterministic-fake decoders that stand in for the codec call. Swapping in a
real codec is a one-function change at the marked points.

Schemas:
  audio: (clip_id string, bytes binary, sample_rate int, n_samples int,
          channels int, fmt string, caption string)
  video: (video_id string, bytes binary, w int, h int, n_frames int,
          fps double, fmt string, caption string)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec

AUDIO_SCHEMA = ("clip_id string, bytes binary, sample_rate int, "
                "n_samples int, channels int, fmt string, caption string")
VIDEO_SCHEMA = ("video_id string, bytes binary, w int, h int, n_frames int, "
                "fps double, fmt string, caption string")


# ---------------------------------------------------------------------------
# image: REAL resize / pyramid (the resolution-matching join substrate,
# wasard.py:417-465 _fit_landsat_dataset_resolution)
# ---------------------------------------------------------------------------

def resize_block_np(block: np.ndarray, factor: int) -> np.ndarray:
    """Downsample (h, w, bands) by integer factor with 2x2..fxf mean
    pooling (xr_scale_res semantics for downscale). h, w divisible by f."""
    h, w, b = block.shape
    assert h % factor == 0 and w % factor == 0, "dims must divide factor"
    pooled = block.reshape(h // factor, factor, w // factor, factor, b) \
                  .astype(np.float64).mean(axis=(1, 3))
    return np.clip(np.rint(pooled), 0, 65535).astype(np.uint16)


def upsample_block_np(block: np.ndarray, factor: int) -> np.ndarray:
    """Nearest-neighbor upsample (the reference's interp to finer grid)."""
    return np.repeat(np.repeat(block, factor, axis=0), factor, axis=1)


def resize_images(images: DataFrame, factor: int) -> DataFrame:
    """Tile-pyramid level: decode -> mean-pool by `factor` -> re-encode.
    Same schema out; w/h shrink; cell_id unchanged (footprint identical)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                blk = codec.decode_block(r.bytes, r.w, r.h, r.fmt)
                small = resize_block_np(blk, factor)
                rows.append((r.image_id,
                             codec.encode_block(small, "raw16"),
                             small.shape[1], small.shape[0], "raw16",
                             r.cell_id))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "image_id", "bytes", "w", "h", "fmt", "cell_id"])

    return images.mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string, "
             "cell_id long")


def resolution_match_join(coarse: DataFrame, fine: DataFrame,
                          factor: int) -> DataFrame:
    """Resolution-matching join: downsample the fine table to the coarse
    grid, equi-join on cell_id (wasard _fit_landsat_dataset_resolution as a
    resample map + co-located join)."""
    resampled = resize_images(fine, factor).withColumnRenamed("bytes", "bytes_fine") \
        .withColumnRenamed("image_id", "image_id_fine") \
        .select("cell_id", "image_id_fine", "bytes_fine")
    return coarse.join(resampled, "cell_id")


# ---------------------------------------------------------------------------
# audio: STUBBED decode, real plumbing
# ---------------------------------------------------------------------------

def decode_audio_np(data: bytes, fmt: str, n_samples: int,
                    channels: int) -> np.ndarray:
    """STUB — no audio codec library in this container.

    'rawf32' (the deterministic fake used by tests/synth) decodes for real;
    any compressed fmt raises. Replace this function body with e.g.
    soundfile.read when the library exists; all Spark-side plumbing stays.
    """
    if fmt == "rawf32":
        return np.frombuffer(data, dtype="<f4").reshape(n_samples, channels)
    raise NotImplementedError(
        f"audio codec {fmt!r} not available in this environment (stub)")


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip features: RMS energy, zero-crossing rate, duration —
    the audio analogue of tile_features (batch-vectorized)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                x = decode_audio_np(r.bytes, r.fmt, r.n_samples, r.channels)
                mono = x.mean(axis=1)
                rms = float(np.sqrt((mono ** 2).mean()))
                zcr = float((np.diff(np.signbit(mono)) != 0).mean())
                rows.append((r.clip_id, rms, zcr,
                             r.n_samples / float(r.sample_rate)))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "clip_id", "rms", "zcr", "duration_s"])

    return audio.mapInPandas(
        run, "clip_id string, rms double, zcr double, duration_s double")


def synth_audio(spark, n: int, sr: int = 16000, n_samples: int = 4096,
                seed: int = 42) -> DataFrame:
    """Deterministic fake audio table (sine + hashed noise, rawf32)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                rng = np.random.RandomState(seed * 100003 + int(i))
                t = np.arange(n_samples) / sr
                f = 100.0 + (int(i) % 50) * 17.0
                x = (np.sin(2 * np.pi * f * t)
                     + 0.1 * rng.normal(size=n_samples)).astype("<f4")
                rows.append((f"clip-{int(i):08d}",
                             x.reshape(-1, 1).tobytes(), sr, n_samples, 1,
                             "rawf32", f"synthetic tone {f:.0f} Hz"))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "clip_id", "bytes", "sample_rate", "n_samples",
                    "channels", "fmt", "caption"])

    return spark.range(n).mapInPandas(gen, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# video: STUBBED frame extraction, real plumbing
# ---------------------------------------------------------------------------

def sample_frames_np(data: bytes, fmt: str, w: int, h: int, n_frames: int,
                     every: int) -> np.ndarray:
    """STUB — no video codec in this container. 'rawgray8' (frames
    concatenated as uint8 planes; the deterministic fake) decodes for real;
    compressed containers raise. Returns (k, h, w) uint8."""
    if fmt == "rawgray8":
        frames = np.frombuffer(data, dtype=np.uint8).reshape(n_frames, h, w)
        return frames[::every].copy()
    raise NotImplementedError(
        f"video codec {fmt!r} not available in this environment (stub)")


def video_frame_features(video: DataFrame, every: int = 5) -> DataFrame:
    """Frame-sample every k-th frame, per-frame mean brightness + motion
    (mean abs diff between sampled frames) — UDTF-style: one row per
    sampled frame."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            outs = []
            for r in b.itertuples():
                fr = sample_frames_np(r.bytes, r.fmt, r.w, r.h,
                                      r.n_frames, every)
                bright = fr.astype(np.float64).mean(axis=(1, 2))
                motion = np.concatenate(
                    [[0.0], np.abs(np.diff(fr.astype(np.float64), axis=0))
                     .mean(axis=(1, 2))])
                outs.append(pd.DataFrame({
                    "video_id": r.video_id,
                    "frame_idx": np.arange(len(fr)) * every,
                    "brightness": bright, "motion": motion}))
            if outs:
                yield pd.concat(outs)

    return video.mapInPandas(
        run, "video_id string, frame_idx long, brightness double, "
             "motion double")


def synth_video(spark, n: int, w: int = 16, h: int = 16, n_frames: int = 20,
                seed: int = 42) -> DataFrame:
    """Deterministic fake video table (moving gradient, rawgray8)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                base = (np.arange(w)[None, :] + np.arange(h)[:, None])
                frames = np.stack([(base + 3 * f + int(i)) % 256
                                   for f in range(n_frames)]).astype(np.uint8)
                rows.append((f"vid-{int(i):08d}", frames.tobytes(), w, h,
                             n_frames, 10.0, "rawgray8",
                             f"synthetic pan {int(i)}"))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "video_id", "bytes", "w", "h", "n_frames", "fps",
                    "fmt", "caption"])

    return spark.range(n).mapInPandas(gen, VIDEO_SCHEMA)
