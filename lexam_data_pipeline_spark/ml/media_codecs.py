"""Real decoders for uncompressed media formats — stdlib + numpy only.

The multimodal operators (ml/multimodal.py) carry media as opaque binary
columns.  Compressed codecs (JPEG/PNG/MP3/H.264) need libraries this
container doesn't ship, so those stay honestly stubbed — but the
*uncompressed* interchange formats are pure byte layout, and decoding
them needs nothing beyond the standard library:

* **WAV (RIFF PCM)** — stdlib ``wave`` + numpy ``frombuffer``: sample
  rate, channel count, duration, RMS loudness, windowed energy
  envelope.  8-bit and 16-bit PCM.
* **PPM (P6)** — 15-line header parse + one ``reshape``: full RGB
  pixel access, nearest-neighbor resize via numpy index sampling,
  channel/quadrant feature extraction.

Everything here is a pure ``bytes → numpy`` function with no Spark
dependency; ml/multimodal.py lifts them into Arrow-batched
``mapInPandas`` stages (registered for by-value pickling so executor
workers need neither this package on sys.path nor any codec library).
"""

from __future__ import annotations

import io
import wave

import numpy as np

# --------------------------------------------------------------------------
# sniffing
# --------------------------------------------------------------------------


def sniff(payload: bytes | None) -> str | None:
    """Detect a decodable uncompressed format, else None."""
    if not payload:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"P6":
        return "ppm"
    return None


# --------------------------------------------------------------------------
# WAV (RIFF PCM)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM samples as float64 in [-1, 1], shape (n_samples, n_channels),
    plus the sample rate."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    return samples.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of :func:`decode_wav` for 16-bit PCM (test fixture maker)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32768.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_features(payload: bytes, n_windows: int = 8) -> list[float]:
    """Audio features: [duration_s, sample_rate/1e5, n_channels, rms,
    peak, then ``n_windows`` per-window RMS energies] — the envelope a
    speech/music classifier consumes."""
    samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    head = [n / rate, rate / 1e5, float(samples.shape[1]), rms, peak]
    windows = []
    for i in range(n_windows):
        seg = mono[i * n // n_windows : (i + 1) * n // n_windows]
        windows.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
    return [float(x) for x in head + windows]


# --------------------------------------------------------------------------
# PPM (P6 binary RGB)
# --------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → uint8 array of shape (height, width, 3)."""
    fields: list[bytes] = []
    pos = 2  # past magic
    while len(fields) < 3:
        # skip whitespace and '#' comment lines between header fields
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        fields.append(payload[pos:end])
        pos = end
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pixels.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize by index sampling — one fancy-index op."""
    h, w, _ = arr.shape
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return arr[rows[:, None], cols[None, :]]


def image_features(arr: np.ndarray) -> list[float]:
    """Image features: [h, w, mean R, G, B, then 4 quadrant luma means]."""
    h, w, _ = arr.shape
    f = arr.astype(np.float64)
    luma = f.mean(axis=2)
    quads = [
        luma[: h // 2 or 1, : w // 2 or 1].mean(),
        luma[: h // 2 or 1, w // 2 :].mean() if w > 1 else 0.0,
        luma[h // 2 :, : w // 2 or 1].mean() if h > 1 else 0.0,
        luma[h // 2 :, w // 2 :].mean() if (h > 1 and w > 1) else 0.0,
    ]
    return [float(x) for x in [h, w, *f.reshape(-1, 3).mean(axis=0), *quads]]


def decode_features(payload: bytes | None) -> list[float] | None:
    """Features for any sniffable payload, else None (caller falls back
    to the stub or raises for compressed formats)."""
    kind = sniff(payload)
    if kind == "wav":
        return wav_features(payload)
    if kind == "ppm":
        return image_features(decode_ppm(payload))
    return None
