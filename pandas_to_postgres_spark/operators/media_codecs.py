"""REAL media decoders — no PIL/ffmpeg needed.

`operators/multimodal.py`'s FAKE_DECODE tier stubs formats whose codec
libraries are not in this container; everything listed here decodes for
REAL in pure stdlib + numpy:

- **WAV** (RIFF PCM)  — stdlib ``wave`` + numpy ``frombuffer``
- **BMP** (24-bit uncompressed) — ``struct`` header parse + numpy reshape
- **PPM** (P6 binary) — 3-token ASCII header + raw RGB bytes
- **PNG** (8-bit RGB/RGBA, non-interlaced) — stdlib ``zlib`` inflate +
  a real unfilter pass for all five PNG filter types (so COMPRESSED
  lossless images decode too; see ``decode_png``)
- **JPEG** (baseline SOF0 AND progressive SOF2; grayscale / 4:4:4 /
  4:2:2 / 4:2:0 — any integer sampling factors) — a full Huffman +
  IDCT decoder and matching encoders in pure numpy
  (``jpeg_codec.py``), validated against hand-assembled T.81
  bitstreams incl. successive-approximation and EOB-run scans;
  16-bit quantization TABLES (Pq=1) decode fine — only arithmetic /
  lossless / 16-bit SAMPLE PRECISION JPEG raises NotImplementedError
  inside the codec rather than decode wrong
- **GIF** (87a/89a) — real LZW (deferred clear, KwKwK, 12-bit growth,
  dictionary-overflow re-clear), global/local palettes, interlace
  reassembly, GIF89a animation with draw-over compositing and
  transparency indices; encoder + decoder validated against a
  hand-assembled bitstream (``tests/test_gif_codec.py``)
- **IMA ADPCM audio** (WAV ``wFormatTag 0x11``, 4 bits/sample) — a real
  compressed-audio encoder/decoder pair: the spec's integer nibble loop
  over the 89-step ladder, RIFF chunk walk done by hand because the
  stdlib ``wave`` module refuses non-PCM; golden-tested against
  hand-stepped nibbles (``tests/test_units.py``)
- **Motion-JPEG AVI video** (``encode_avi_mjpeg``/``decode_avi_frames``)
  — a RIFF chunk walk yields one standalone baseline JPEG per frame,
  decoded by the same ``jpeg_codec``; this makes VIDEO frame sampling
  real (`multimodal.sample_frames`), not a byte-slicing fake

so for these formats the decode step is REAL: actual pixels and samples
come out, get featurized with numpy, and flow through the same
Arrow-batched ``mapInPandas`` plumbing the fake path exercises. The
honest gate stays exactly where it belongs — on formats whose decoders
genuinely are not present.

Scale: same rules as multimodal.py — payloads are decoded WHERE THEY SIT
(map-only, one Arrow batch at a time, bounded by maxPartitionBytes) and
never shuffled; only the small feature rows move.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


# ---------- encoders (test/synthesis helpers — also pure stdlib/numpy) ----

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] → 16-bit mono PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    out = bytearray(header)
    bgr = rgb[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # BMP stores bottom-up
        out += bgr[y].tobytes() + pad
    return bytes(out)


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary P6 PPM bytes."""
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


# ---------- real decoders -------------------------------------------------

def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got width={width}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (bpp={bpp}, comp={comp})")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * abs(h), offset=data_off
    ).reshape(abs(h), row_size)
    bgr = rows[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        bgr = bgr[::-1]  # bottom-up storage → top-down
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → (h, w, 3) uint8 RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ---------- Spark surface -------------------------------------------------

REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        # audio: [duration_s, rms, zero_cross_rate]; image: [h, w, mean_r,
        # mean_g, mean_b] — padded to 5 with zeros for a uniform schema
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def sample_indices(n_frames: int, k: int = 4) -> range:
    """Evenly spaced frame indices, AT MOST ``k`` of them for EVERY
    frame count — ceil-division stride, so the per-payload decode cost
    of the video featurizer is bounded (floor division gave step=1 for
    5-7 frames, decoding up to 7)."""
    if n_frames <= 0:
        return range(0)
    return range(0, n_frames, max(-(-n_frames // k), 1))


def _featurize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, mimes, lens, feats = [], [], [], []
        for doc_id, payload, mime in zip(
            pdf["doc_id"], pdf["payload"], pdf["mime"]
        ):
            b = bytes(payload)
            if mime == "audio/wav":
                samples, rate = decode_wav(b)
                zc = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if len(samples) > 1 else 0.0
                f = [
                    len(samples) / rate,
                    float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
                    zc,
                    0.0,
                    0.0,
                ]
            elif mime == "image/bmp":
                rgb = decode_bmp(b)
                f = [float(rgb.shape[0]), float(rgb.shape[1])] + [
                    float(m) for m in rgb.reshape(-1, 3).mean(axis=0)
                ]
            elif mime == "image/x-portable-pixmap":
                rgb = decode_ppm(b)
                f = [float(rgb.shape[0]), float(rgb.shape[1])] + [
                    float(m) for m in rgb.reshape(-1, 3).mean(axis=0)
                ]
            elif mime == "image/png":
                rgb = decode_png(b)[:, :, :3]
                f = [float(rgb.shape[0]), float(rgb.shape[1])] + [
                    float(m) for m in rgb.reshape(-1, 3).mean(axis=0)
                ]
            elif mime == "image/gif":
                fr = decode_gif(b)
                first = fr[0].reshape(-1, 3).mean(axis=0)
                f = [
                    float(fr.shape[0]),
                    float(fr.shape[1]),
                    float(fr.shape[2]),
                    float(first[0]),
                    float(first[1]),
                ]
            elif mime == "text/gzip":
                txt = decode_gzip_text(b)
                toks = [t for t in txt.split() if t]
                f = [
                    float(len(txt)),
                    float(len(toks)),
                    float(len(set(toks))),
                    0.0,
                    0.0,
                ]
            elif mime == "audio/adpcm":  # IMA ADPCM in WAV (0x11)
                samples, rate = decode_adpcm_ima(b)
                zc = (
                    float(np.mean(np.abs(np.diff(np.signbit(samples)))))
                    if len(samples) > 1
                    else 0.0
                )
                f = [
                    len(samples) / rate,
                    float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
                    zc,
                    0.0,
                    0.0,
                ]
            elif mime == "audio/basic":  # G.711 mu-law
                samples = decode_mulaw(b)
                zc = (
                    float(np.mean(np.abs(np.diff(np.signbit(samples)))))
                    if len(samples) > 1
                    else 0.0
                )
                f = [
                    len(samples) / 8000.0,
                    float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
                    zc,
                    0.0,
                    0.0,
                ]
            elif mime == "image/jpeg":
                from pandas_to_postgres_spark.operators.jpeg_codec import (  # noqa: PLC0415
                    decode_jpeg,
                )

                px = decode_jpeg(b)
                if px.ndim == 2:
                    m = float(px.mean())
                    f = [float(px.shape[0]), float(px.shape[1]), m, m, m]
                else:
                    f = [float(px.shape[0]), float(px.shape[1])] + [
                        float(v) for v in px.reshape(-1, 3).mean(axis=0)
                    ]
            elif mime in ("video/avi", "video/x-msvideo"):
                from pandas_to_postgres_spark.operators.jpeg_codec import (  # noqa: PLC0415
                    decode_jpeg,
                )

                fr = decode_avi_frames(b)
                sampled = [
                    decode_jpeg(fr[i]) for i in sample_indices(len(fr))
                ]
                px0 = sampled[0]
                luma = float(
                    np.mean([p.mean() for p in sampled])
                )
                f = [
                    float(len(fr)),
                    float(px0.shape[0]),
                    float(px0.shape[1]),
                    luma,
                    0.0,
                ]
            else:
                # the honest gate: mp4 etc. need libs absent here
                # (arithmetic/lossless JPEG raises inside jpeg_codec)
                raise NotImplementedError(
                    f"no codec for {mime!r} in this container (PIL/ffmpeg absent)"
                )
            ids.append(doc_id)
            mimes.append(mime)
            lens.append(len(b))
            feats.append([round(x, 6) for x in f])
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "mime": mimes,
                "byte_len": pd.Series(lens, dtype="int64"),
                "feature": feats,
            }
        )


def extract_features_real(media_df: DataFrame) -> DataFrame:
    """(doc_id, payload, mime) → real decoded features via mapInPandas.

    Input needs columns ``doc_id``, ``payload`` (binary), ``mime``
    (string). Decoding is map-only; payloads never shuffle.
    """
    return media_df.select("doc_id", "payload", "mime").mapInPandas(
        _featurize_real, schema=REAL_FEATURE_SCHEMA
    )


def resize_rgb(rgb: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize of a decoded (h, w, 3) RGB array — real
    pixel resampling with numpy indexing alone (bilinear would also be
    pure numpy; nearest keeps the test goldens exact)."""
    h, w, _ = rgb.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return rgb[rows][:, cols]


# ---------- PNG (stdlib zlib — a COMPRESSED format with no codec lib) ----

def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → non-interlaced 8-bit truecolor PNG bytes.

    Pure stdlib: zlib DEFLATE + struct chunk framing + CRC32. Scanlines
    use filter 0 (None) — any PNG reader decodes the output.
    """
    import zlib  # noqa: PLC0415

    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit RGB/RGBA PNG bytes → (h, w, 3|4) uint8.

    A REAL decoder for the most common lossless image format, with no
    imaging library: chunk walk → zlib inflate → per-scanline UNFILTER
    implementing all five PNG filter types (None/Sub/Up/Average/Paeth,
    RFC 2083 §6). Sub uses a per-channel cumulative sum mod 256
    (left-recursion vectorized); Average/Paeth fall back to a per-pixel
    loop (correct for foreign PNGs; our own encoder emits filter 0, so
    the engine's hot path never enters the loop). Interlaced, paletted,
    and 16-bit images raise — honestly out of scope, not silently wrong.
    """
    import zlib  # noqa: PLC0415

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = meta
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced RGB/RGBA PNG supported"
        )
    ch = 3 if color == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 1:  # Sub: per-channel prefix sum mod 256
            rec = np.cumsum(line.reshape(w, ch), axis=0) % 256
            rec = rec.reshape(stride)
        else:  # Average (3) / Paeth (4): left-dependent, per-pixel loop
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = int(prev[x])
                if ft == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) % 256
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch).copy()


# ---------- gzip text + G.711 mu-law audio (compressed, stdlib/numpy) ----

def encode_gzip_text(text: str) -> bytes:
    """UTF-8 text → gzip bytes (mtime pinned to 0 so output is
    deterministic — the default stamps wall-clock into the header)."""
    import gzip  # noqa: PLC0415
    import io as _io  # noqa: PLC0415

    buf = _io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(text.encode("utf-8"))
    return buf.getvalue()


def decode_gzip_text(payload: bytes) -> str:
    """gzip bytes → UTF-8 text — the compressed-text case a real corpus
    actually ships (WARC/.jsonl.gz shards)."""
    import gzip  # noqa: PLC0415

    return gzip.decompress(payload).decode("utf-8")


def encode_mulaw(samples: np.ndarray) -> bytes:
    """float samples in [-1, 1] → G.711 mu-law bytes (ITU-T G.711, the
    8-bit logarithmic telephony codec) — pure numpy companding."""
    x = np.clip(samples, -1.0, 1.0)
    mu = 255.0
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)  # [-1, 1]
    return ((y + 1.0) * 127.5 + 0.5).astype(np.uint8).tobytes()


def decode_mulaw(payload: bytes) -> np.ndarray:
    """G.711 mu-law bytes → float samples in [-1, 1] — a REAL lossy
    compressed audio decode (logarithmic expansion), no codec library."""
    y = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
    mu = 255.0
    return np.sign(y) * ((1.0 + mu) ** np.abs(y) - 1.0) / mu


# ------------------------------------------------------- MJPEG-in-AVI video

def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → minimal RIFF AVI container with
    Motion-JPEG ('MJPG') video: each frame is a standalone baseline JPEG
    ('00dc' chunk, word-aligned) — the classic intra-only format whose
    container is a plain chunk walk and whose frames our own
    `jpeg_codec.encode_jpeg` produces. No ffmpeg anywhere.

    Layout (all little-endian, per the Microsoft AVI RIFF spec):
    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    00dc...)) — no idx1 (optional for sequential readers, and ours is one).
    """
    import struct as _s

    from pandas_to_postgres_spark.operators.jpeg_codec import encode_jpeg

    if not frames:
        raise ValueError("at least one frame required")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + _s.pack("<I", len(body)) + body + pad

    def lst(listtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", listtype + body)

    avih = _s.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0,
        0x10,  # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE (benign)
        len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + _s.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, -1)
        + _s.pack("<4h", 0, 0, w, h)
    )
    strf = _s.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + _s.pack("<I", len(riff_body)) + riff_body


def decode_avi_frames(payload: bytes):
    """RIFF AVI bytes → list of per-frame JPEG byte strings ('00dc'/'00db'
    chunks inside LIST movi, word-aligned walk). Raises on non-AVI RIFF
    or a missing movi list — honest failure, never a silent empty."""
    import struct as _s

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    frames = []

    def walk(start: int, end: int, in_movi: bool):
        p = start
        while p + 8 <= end:
            fourcc = payload[p : p + 4]
            (size,) = _s.unpack("<I", payload[p + 4 : p + 8])
            body_start = p + 8
            body_end = body_start + size
            if fourcc == b"LIST":
                listtype = payload[body_start : body_start + 4]
                walk(body_start + 4, body_end, listtype == b"movi")
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(payload[body_start:body_end])
            p = body_end + (size % 2)  # word alignment

    walk(12, 8 + _s.unpack("<I", payload[4:8])[0], False)
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames


# ---------- GIF (LZW — the container + dictionary codec, pure Python) ----

def _lzw_compress(indices: "np.ndarray", min_code_size: int) -> bytes:
    """GIF-flavor LZW: emit CLEAR first, grow the code width as the
    dictionary fills (max 12 bits), re-CLEAR at 4096 entries, end with
    EOI. Bits pack LSB-first into bytes (the GIF rule)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out_bits: list[int] = []
    acc = 0
    nbits = 0
    buf = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for idx in indices.tolist():
        c = bytes([idx])
        if w + c in table:
            w += c
        else:
            emit(table[w])
            table[w + c] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            elif next_code == 4096:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
            w = c
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_compress` — the deferred-clear GIF LZW
    decoder (codes read LSB-first; the width grows one step BEFORE the
    code that would overflow it, mirroring every real encoder)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out += entry
            prev = entry
            # the decoder's table LAGS the encoder's by one add when a
            # code is read, so it must widen one entry EARLIER than the
            # encoder's size == 2^width rule — the classic LZW off-by-one
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def encode_gif(
    frames, interlace: bool = False, transparent_index: int | None = None
) -> bytes:
    """(h, w, 3) uint8 RGB — or a list of same-shape frames — → GIF
    bytes, pure Python: global palette from the unique colors (≤256
    required; synthesis keeps palettes small), real LZW compression,
    optional interlaced row order, GIF89a graphics-control extensions
    for multi-frame animations / transparency. Any GIF reader decodes
    the output."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w, _ = frames[0].shape
    colors: list[tuple] = []
    lut: dict[tuple, int] = {}
    index_frames = []
    for fr in frames:
        flat = fr.reshape(-1, 3)
        # build in uint16: a >256-color input would otherwise assign
        # out-of-range ints into uint8 (numpy deprecation, soon a hard
        # error) before the palette-size check below can raise
        idx = np.empty(flat.shape[0], dtype=np.uint16)
        for i, px in enumerate(map(tuple, flat)):
            j = lut.get(px)
            if j is None:
                j = lut[px] = len(colors)
                colors.append(px)
            idx[i] = j
        index_frames.append(idx.reshape(h, w))
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    index_frames = [idx.astype(np.uint8) for idx in index_frames]
    size_bits = max(1, (len(colors) - 1).bit_length())
    table_n = 1 << size_bits
    palette = b"".join(
        bytes(colors[i]) if i < len(colors) else b"\x00\x00\x00"
        for i in range(table_n)
    )
    animated = len(frames) > 1
    out = bytearray()
    out += b"GIF89a" if (animated or transparent_index is not None) else b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += palette
    for idx in index_frames:
        if animated or transparent_index is not None:
            flags = 0x01 if transparent_index is not None else 0x00
            out += struct.pack(
                "<BBBBHBB",
                0x21, 0xF9, 4, flags, 5,
                transparent_index or 0, 0,
            )
        interlace_flag = 0x40 if interlace else 0
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, interlace_flag)
        rows = _interlace_order(h) if interlace else range(h)
        seq = np.concatenate([idx[r] for r in rows])
        min_code = max(2, size_bits)
        out.append(min_code)
        comp = _lzw_compress(seq, min_code)
        for i in range(0, len(comp), 255):
            block = comp[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF87a/89a bytes → (n_frames, h, w, 3) uint8 — a REAL decoder for
    the dictionary-coded format: LZW decompression (deferred clear,
    KwKwK case, growing code width), global + local color tables,
    interlaced row reassembly, and GIF89a animation compositing
    (draw-over with transparency indices honored). Raises on anything
    that is not a GIF rather than decoding wrong."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames = []
    transparent: int | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: remember GCE transparency, skip rest
            label = payload[pos]
            pos += 1
            if label == 0xF9:
                sz = payload[pos]
                flags = payload[pos + 1]
                tidx = payload[pos + 4]
                transparent = tidx if (flags & 0x01) else None
                pos += 1 + sz
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ipack = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = global_table
        if ipack & 0x80:
            n = 2 << (ipack & 0x07)
            table = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image block with no color table")
        min_code = payload[pos]
        pos += 1
        comp = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            comp += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decompress(bytes(comp), min_code), dtype=np.uint8
        )[: iw * ih]
        grid = np.empty((ih, iw), dtype=np.uint8)
        rows = _interlace_order(ih) if (ipack & 0x40) else range(ih)
        for src, dst in enumerate(rows):
            grid[dst] = idx[src * iw : (src + 1) * iw]
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = table[grid[mask]]
        else:
            region[:] = table[grid]
        frames.append(canvas.copy())
        transparent = None
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


# ------------------------------------------ IMA ADPCM (WAV format 0x11)

#: ITU/IMA step-size table (89 entries) — the fixed quantizer ladder every
#: IMA ADPCM implementation shares (DVI/IMA spec, also Microsoft WAV 0x11)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(nib: int, pred: int, index: int) -> tuple:
    """One IMA ADPCM step: 4-bit code → (new predictor, new index).
    diff = (step/8) + (step/4)·b0 + (step/2)·b1 + step·b2, sign = b3 —
    integer arithmetic exactly as the spec's reference decoder."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 7]))
    return pred, index


def encode_adpcm_ima(
    samples: np.ndarray, rate: int = 8000, block_align: int = 256
) -> bytes:
    """float samples in [-1, 1] → WAV bytes with IMA ADPCM (wFormatTag
    0x11) mono audio — 4 bits per sample (4:1 vs 16-bit PCM), the
    classic telephony/game codec. Real encoder: per block, a 4-byte
    header (int16 predictor seed + step index) then low-nibble-first
    4-bit codes from the standard quantize-against-the-ladder loop.
    Any IMA-capable WAV reader decodes the output."""
    pcm = np.clip(
        np.asarray(samples, dtype=np.float64) * 32767.0, -32768, 32767
    ).astype(np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    blocks = bytearray()
    pred, index = 0, 0
    n = len(pcm)
    for b0 in range(0, n, spb):
        chunk = pcm[b0 : b0 + spb]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, index, 0)
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEPS[index]
            delta = int(s) - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            pred, index = _ima_decode_nibble(nib, pred, index)
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)  # pad the final byte's high nibble
        for lo, hi in zip(nibs[::2], nibs[1::2]):
            blocks.append(lo | (hi << 4))
        pad = block_align - 4 - len(nibs) // 2
        if pad > 0:
            blocks += b"\x00" * pad
    data = bytes(blocks)
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", n)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_adpcm_ima(payload: bytes) -> Tuple[np.ndarray, int]:
    """WAV/IMA-ADPCM bytes → (float64 mono samples in [-1, 1], rate).
    The stdlib ``wave`` module refuses non-PCM, so this walks the RIFF
    chunks itself (fmt 0x11 + fact + data) and runs the spec's integer
    nibble loop — a REAL compressed-audio decode, no codec library."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, n_samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            n_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 0x11 or ch != 1 or bits != 4:
        raise NotImplementedError(
            f"only mono 4-bit IMA ADPCM (tag=0x{tag:x}, ch={ch}, bits={bits})"
        )
    spb = struct.unpack_from("<H", fmt, 18)[0] if len(fmt) >= 20 else (
        (block_align - 4) * 2 + 1
    )
    out = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        pred, index = struct.unpack_from("<hB", block, 0)
        index = max(0, min(88, index))
        out.append(pred)
        emitted = 1
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                if emitted >= spb:
                    break
                pred, index = _ima_decode_nibble(nib, pred, index)
                out.append(pred)
                emitted += 1
    samples = np.asarray(out, dtype=np.float64)
    if n_samples is not None:
        samples = samples[:n_samples]
    return samples / 32767.0, rate
