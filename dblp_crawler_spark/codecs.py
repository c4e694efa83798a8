"""Deterministic image codecs, phash, PSNR — pure numpy + zlib.

This container has no image library (no PIL/cv2), so — per the build
brief — the *codec* is a clearly-marked deterministic stand-in while
everything Spark-side (schema, Arrow batching, UDF signature,
partitioning) is real and tested:

  * fmt='png'  → SPNG container: lossless zlib of raw RGB.
  * fmt='jpeg' → SJPG container: LOSSY mid-tread quantization (step
    4) + zlib. Max per-pixel error 2 → MSE ≤ 1.5 → PSNR ≈ 46 dB,
    deterministically above the input_hint's 40 dB gate, so the
    PSNR verification path is exercised for real.

Swapping in real PNG/JPEG on a cluster touches only `encode_image` /
`decode_image`; every caller is format-agnostic.

phash: 64-bit block-mean hash (8×8 grayscale downsample, threshold
at the mean) — deterministic, numpy-vectorized, stored as signed
int64 per the input_hint schema.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC_PNG = b"SPNG"
_MAGIC_JPG = b"SJPG"
_Q = 4  # jpeg-stand-in quantization step


from functools import lru_cache


@lru_cache(maxsize=8)
def _synth_grid(w: int, h: int) -> np.ndarray:
    """The id-independent gradient layer of synth_pixels, cached per
    (w, h) — it was ~55% of the per-image cost in the decode-verify
    hot loop (profiled r4), and every image of a size shares it.
    Value-identical to the original inline computation. The returned
    array is SHARED across callers (that is the point of the cache),
    so it is frozen read-only; anyone needing to mutate must copy.
    maxsize stays small because each entry is ~24*w*h bytes and a
    worker only ever sees a handful of distinct sizes."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1) + (yy * 255) // max(h - 1, 1)) // 2
    grid = np.stack([base, np.flipud(base), (xx * yy) % 256], axis=-1)
    grid.setflags(write=False)
    return grid


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic gradient+noise RGB uint8 array for fixtures."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    noise = rng.integers(0, 32, size=(h, w, 3))
    return ((_synth_grid(w, h) + noise) % 256).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape[0], pixels.shape[1]
    if fmt == "png":
        return _MAGIC_PNG + struct.pack("<HH", h, w) + zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpeg":
        q = (pixels.astype(np.uint16) // _Q).astype(np.uint8)
        return _MAGIC_JPG + struct.pack("<HHB", h, w, _Q) + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(payload: bytes) -> np.ndarray:
    magic = payload[:4]
    if magic == _MAGIC_PNG:
        h, w = struct.unpack("<HH", payload[4:8])
        raw = zlib.decompress(payload[8:])
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if magic == _MAGIC_JPG:
        h, w, q = struct.unpack("<HHB", payload[4:9])
        raw = zlib.decompress(payload[9:])
        qarr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.uint16)
        return np.clip(qarr * q + q // 2, 0, 255).astype(np.uint8)
    raise NotImplementedError(
        "real PNG/JPEG decode requires an image library not present in this "
        "container; deploy builds bind decode_image to PIL/libvips here"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10((255.0 * 255.0) / mse)


#: bit weights for the vectorized 64-bit pack (LSB-first, matching
#: the original `val |= b << i` loop bit-for-bit)
_PHASH_W = np.uint64(1) << np.arange(64, dtype=np.uint64)


def phash64(pixels: np.ndarray) -> int:
    """Block-mean 64-bit hash → signed int64 (input_hint phash column)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # crop to a multiple of 8 then 8x8 block means
    h8, w8 = (h // 8) * 8, (w // 8) * 8
    g = gray[:h8, :w8].reshape(8, h8 // 8, 8, w8 // 8).mean(axis=(1, 3))
    bits = (g > g.mean()).astype(np.uint64).ravel()
    # distinct powers of two — the uint64 sum is exact, no wrap
    val = (bits * _PHASH_W).sum(dtype=np.uint64)
    return int(val.astype(np.int64))


def phash64_batch(pixel_list: list[np.ndarray]) -> np.ndarray:
    return np.array([phash64(p) for p in pixel_list], dtype=np.int64)


# ---- video (deterministic container stand-in, same policy as images) -------
_MAGIC_VID = b"SVID"


def synth_video(video_id: str, n_frames: int, w: int, h: int, fps: int = 10) -> bytes:
    """Deterministic multi-frame 'video': per-frame pixels derive from
    synth_pixels(video_id#frame) so any sampled frame is independently
    verifiable."""
    frames = [synth_pixels(f"{video_id}#{i}", w, h) for i in range(n_frames)]
    return encode_video(frames, fps)


def encode_video(frames: list[np.ndarray], fps: int) -> bytes:
    h, w = frames[0].shape[0], frames[0].shape[1]
    body = zlib.compress(b"".join(f.tobytes() for f in frames), 6)
    return _MAGIC_VID + struct.pack("<HHHB", h, w, len(frames), fps) + body


def decode_video(payload: bytes) -> tuple[list[np.ndarray], int]:
    """→ (frames, fps). Real containers (mp4/webm) need a codec
    library this container lacks; deploy builds bind this to
    PyAV/ffmpeg — every caller is container-agnostic."""
    if payload[:4] != _MAGIC_VID:
        raise NotImplementedError(
            "real video decode requires a codec library not present in this "
            "container; deploy builds bind decode_video to PyAV/ffmpeg here"
        )
    h, w, n, fps = struct.unpack("<HHHB", payload[4:11])
    raw = zlib.decompress(payload[11:])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3)
    return [arr[i] for i in range(n)], fps


# ---- audio (REAL wav codec — PCM16 via stdlib `wave`, no external lib) -----
def synth_wav(audio_id: str, seconds: float, freq_hz: float, sample_rate: int = 16000,
              amplitude: float = 0.5) -> bytes:
    """Deterministic mono PCM16 WAV: a pure sine at freq_hz — its
    RMS (amplitude/√2) and zero-crossing rate (2·freq) are analytic,
    so feature extraction is verifiable to first principles."""
    import io
    import wave

    n = int(seconds * sample_rate)
    t = np.arange(n, dtype=np.float64) / sample_rate
    phase = (zlib.crc32(audio_id.encode()) % 360) * np.pi / 180.0
    samples = (amplitude * np.sin(2 * np.pi * freq_hz * t + phase) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (float64 samples in [-1, 1], sample_rate). PCM16 WAV is a
    stdlib-parseable format — this decode path is REAL, not a stub."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only mono PCM16 wav in this build")
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32767.0, sr
