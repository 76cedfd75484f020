"""Deterministic image codec + perceptual hash + PSNR.

The sandbox ships no PIL/opencv, so the codecs here are self-contained,
deterministic stand-ins with the *shape* of real ones (public-knowledge
constructions: zlib-compressed raw RGB for the lossless path, uniform
quantization for the lossy path). The Spark-side plumbing — binary column,
Arrow batch transfer, vectorized decode in mapInPandas — is exactly what a
real libjpeg-backed pipeline would use; only the codec kernel is synthetic.

Formats:
  png  -> b"MLPNG" + w:u16 + h:u16 + zlib(raw RGB)          (lossless)
  jpeg -> b"MLJPG" + w:u16 + h:u16 + q:u8 + zlib(quantized) (lossy, PSNR ~48dB at q=4)

phash: 8x8 mean-pooled grayscale thresholded at its mean -> 64-bit int
(classic average-hash; public construction).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"MLPNG"
MAGIC_JPG = b"MLJPG"
JPEG_Q = 4  # quantization step: MSE≈q^2/12 -> PSNR≈48dB, above the 40dB gate


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8."""
    h, w = pixels.shape[0], pixels.shape[1]
    if fmt == "png":
        return MAGIC_PNG + struct.pack("<HH", w, h) + zlib.compress(pixels.tobytes(), 1)
    if fmt == "jpeg":
        q = JPEG_Q
        quant = ((pixels.astype(np.uint16) // q) * q + q // 2).astype(np.uint8)
        return (
            MAGIC_JPG
            + struct.pack("<HHB", w, h, q)
            + zlib.compress(quant.tobytes(), 1)
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Return (h, w, 3) uint8 pixels."""
    magic = data[:5]
    if magic == MAGIC_PNG:
        w, h = struct.unpack("<HH", data[5:9])
        raw = zlib.decompress(data[9:])
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if magic == MAGIC_JPG:
        w, h, _q = struct.unpack("<HHB", data[5:10])
        raw = zlib.decompress(data[10:])
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    raise ValueError("unknown image magic")


def image_dims(data: bytes) -> tuple[int, int]:
    """(w, h) from the header without decompressing the payload."""
    w, h = struct.unpack("<HH", data[5:9])
    return w, h


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: grayscale -> 8x8 mean pool -> threshold at mean -> 64 bits.
    Returned as signed int64 (Spark LongType)."""
    gray = pixels.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    # mean-pool to 8x8 by integer block sums (pad to multiples of 8)
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
    bh, bw = gray.shape[0] // 8, gray.shape[1] // 8
    pooled = gray.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (pooled > pooled.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for i in range(64):
        val |= bits[i] << np.uint64(63 - i)
    return int(val.astype(np.int64))


def gen_pixels(seed: int, seq: int, w: int, h: int, version: int = 0) -> np.ndarray:
    """Deterministic procedural image: gradient + seeded noise.

    Reproducible from (seed, seq, version) alone so the PSNR/allclose oracle
    can regenerate expected pixels (FIXTURES.md F1)."""
    rng = np.random.Generator(np.random.PCG64(((seed * 1_000_003 + seq) << 8) + version))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.empty((h, w, 3), dtype=np.float32)
    base[..., 0] = (xx / max(w - 1, 1)) * 255.0
    base[..., 1] = (yy / max(h - 1, 1)) * 255.0
    base[..., 2] = ((xx + yy + seq) % 256).astype(np.float32)
    noise = rng.integers(-16, 17, size=(h, w, 3)).astype(np.float32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)
