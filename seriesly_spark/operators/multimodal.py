"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct alongside. The Spark-side machinery that matters at scale —
schema, Arrow batch shape, ``mapInPandas`` signatures, partition-friendly
layout — is real and tested. The codec layer is REAL for binary PPM (P6)
images, RGB8 PNG (stdlib-zlib inflate + the 5 scanline filters, pure
numpy), baseline JPEG (full DCT/Huffman pipeline, ``operators/jpeg.py``),
and mono 16-bit PCM WAV — no external library — and gated for
everything else: ``decode_image`` dispatches known magics to the
built-in parsers, tries PIL if installed for other formats, and raises
NotImplementedError otherwise (libav etc. are not in this container).
The byte-level metadata/frame/feature extractors below remain
codec-free plumbing.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import round_half_up, scoped_persist

META_SCHEMA = "doc_id long, n_bytes long, width long, height long, n_frames long"


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Serialize an (h, w, 3) uint8 array as binary PPM (P6) — the
    simplest real raster format, writable/parsable without any imaging
    library. Used by tests and the decode gate to manufacture genuine
    image payloads."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Parse a binary PPM (P6) payload to an (h, w, 3) uint8 array.
    Strict: malformed headers/short payloads raise ValueError (callers
    that want degrade-to-null wrap this — the analytics convention is
    explicit, not silent, corruption handling)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # Header = magic, width, height, maxval as whitespace-separated
    # tokens (comments unsupported — this is a data-plane codec, not a
    # general reader), then ONE whitespace byte, then raw RGB.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    raw = payload[pos : pos + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: "np.ndarray", b: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
    """Paeth predictor (PNG spec §9, filter type 4), vectorized: pick
    whichever of left/up/up-left is closest to a + b - c, preferring
    left, then up. int16 intermediates — the predictor is defined on
    exact byte values, not wrapped arithmetic."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out.astype(np.uint8)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(arr: "np.ndarray") -> bytes:
    """Serialize an (h, w, 3) uint8 array as a real PNG (RGB8, not
    interlaced) using only stdlib zlib + numpy — the same
    no-external-library trick as encode_ppm/encode_wav, but exercising
    the full chunk/CRC/deflate/scanline-filter machinery of the spec.
    Row r is filtered with type r % 5, so a round-trip through
    decode_png covers every filter in the bank (None/Sub/Up/Average/
    Paeth), not just the trivial one."""
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = arr.shape
    prior = np.zeros((w, 3), dtype=np.uint8)
    lines = []
    for r in range(h):
        row = arr[r]
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        upleft = np.zeros_like(row)
        upleft[1:] = prior[:-1]
        ft = r % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left  # uint8 wrap-around IS the spec's mod 256
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            avg = (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
            filt = row - avg.astype(np.uint8)
        else:
            filt = row - _paeth(left, prior, upleft)
        lines.append(bytes([ft]) + filt.tobytes())
        prior = row
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, color type 2 (RGB)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """Parse an RGB8 non-interlaced PNG payload to an (h, w, 3) uint8
    array: chunk walk (CRC-checked), zlib inflate of the concatenated
    IDAT stream, then the 5 scanline unfilters over numpy rows. Strict
    like decode_ppm — palettes, alpha, 16-bit, and interlacing raise
    ValueError rather than silently mis-decoding.

    Unfiltering is row-sequential by definition (each row references
    the reconstructed prior row); within a row, None/Up are whole-row
    numpy ops, Sub is a mod-256 prefix sum (cumsum in int64, % 256),
    and only Average/Paeth walk pixels (left-neighbor data dependence
    with a floor/branch — not expressible as a prefix sum)."""
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, meta, idat = len(PNG_SIG), None, []
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        if (zlib.crc32(ctype + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, color, comp, filt, interlace = body[8:13]
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB non-interlaced PNG supported"
                )
            meta = (w, h)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h = meta
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, w, 3), dtype=np.uint8)
    prior = np.zeros((w, 3), dtype=np.uint8)
    for r in range(h):
        ft = raw[r * stride]
        row = np.frombuffer(
            raw[r * stride + 1 : (r + 1) * stride], dtype=np.uint8
        ).reshape(w, 3)
        if ft == 0:
            recon = row.copy()
        elif ft == 1:
            recon = (np.cumsum(row, axis=0, dtype=np.int64) % 256).astype(
                np.uint8
            )
        elif ft == 2:
            recon = row + prior
        elif ft in (3, 4):
            recon = np.zeros_like(row)
            left = np.zeros(3, dtype=np.uint8)
            upleft = np.zeros(3, dtype=np.uint8)
            for c in range(w):
                up = prior[c]
                if ft == 3:
                    pred = (
                        (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    pred = _paeth(left, up, upleft)
                recon[c] = row[c] + pred
                left, upleft = recon[c], up
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = recon
        prior = recon
    return out


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an (h, w, 3) uint8 array. P6 PPM,
    RGB8 PNG and baseline JPEG (grayscale / 4:4:4 / 4:2:0 — see
    ``operators/jpeg.py``) are decoded by built-in pure-numpy parsers;
    other formats dispatch to PIL when available and raise
    NotImplementedError here (this container has no imaging libraries —
    reinstalling PIL makes exotic formats work with no other change)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    try:  # pragma: no cover - PIL absent in this environment
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "only PPM(P6), RGB8 PNG and baseline JPEG decode built-in; "
            "other formats need PIL, which is not available in this "
            "container"
        )


def payload_metadata(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Treat the UTF-8 bytes of ``text_col`` as an opaque payload (stand-in
    for image bytes) and extract deterministic metadata per Arrow batch via
    ``mapInPandas`` — the exact plan shape a real decode/resize/
    frame-sample stage uses (vectorized batches, no per-row Python)."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.encode(text_col, "UTF-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": n % 256,
                    "height": (n // 256) % 256,
                    "n_frames": 1,
                }
            )

    return src.mapInPandas(extract, META_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_id long, frame_len long"


def frame_sample(
    docs: DataFrame,
    frame_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame/chunk sampling over an opaque payload: one output row per
    fixed-size slice (video frame / audio window analogue). The byte
    slicing is real; a codec would replace the slice with a decoded frame.
    Row explosion happens inside the Arrow batch (no per-row Python calls,
    no JVM<->Python chatter per frame)."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.encode(text_col, "UTF-8").alias("payload")
    )

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, lens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), frame_size):
                    frame = b[i : i + frame_size]
                    ids.append(doc_id)
                    fids.append(i // frame_size)
                    lens.append(len(frame))
            yield pd.DataFrame({"doc_id": ids, "frame_id": fids, "frame_len": lens})

    return src.mapInPandas(explode_frames, FRAME_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = "doc_id long, feature array<float>"


def payload_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction plumbing: payload -> fixed-dim float vector via
    mapInPandas (the resize/encode/embed stage shape). The model call is
    STUBBED with a deterministic function of the byte length so the oracle
    can verify the batch plumbing end-to-end; swapping in a real encoder
    changes only the function body."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.encode(text_col, "UTF-8").alias("payload")
    )

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [
                        [float((nb * (i + 1)) % 97) / 97.0 for i in range(EMBED_DIM)]
                        for nb in n
                    ],
                }
            )

    return src.mapInPandas(embed, EMBED_SCHEMA)


IMG_STATS_SCHEMA = (
    "doc_id long, width long, height long, "
    "mean_r double, mean_g double, mean_b double"
)


def image_channel_stats(
    images: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL decode stage: parse each binary image payload (PPM built-in;
    see decode_image) inside Arrow-batched ``mapInPandas`` and emit
    dimensions + per-channel means. Channel means are computed as exact
    integer sums divided once (doubles that are bit-identical to any
    engine summing the same pixels), rounded to 6.

    This is the canonical decode->stats plan at 100 TB: the binary column
    never leaves the executor, one Python worker per core decodes its
    Arrow batches, output is a narrow row per image — no shuffle at all.
    """
    src = images.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                arr = decode_image(bytes(payload))
                h, w, _ = arr.shape
                npx = h * w
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[name].append(
                        round_half_up(
                            int(arr[:, :, ch].sum(dtype=np.int64)) / npx, 6
                        )
                    )
            yield pd.DataFrame(rows)

    return src.mapInPandas(stats, IMG_STATS_SCHEMA)


def resize_nearest(arr: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resize (pure numpy index mapping — the resize
    stage of a decode->resize->encode pipeline, PIL-free). Source pixel
    for output (r, c) = floor(r * h / out_h), floor(c * w / out_w)."""
    h, w, _ = arr.shape
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return arr[ri[:, None], ci[None, :], :]


def encode_wav(samples: "np.ndarray", sample_rate: int = 16_000) -> bytes:
    """Serialize a 1-D int16 array as a mono PCM WAV (RIFF) — like
    encode_ppm, a real container format writable without any audio
    library. Used by tests and the decode gate."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("expected 1-D int16")
    data = samples.tobytes()
    n = len(data)
    hdr = b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")              # PCM
        + (1).to_bytes(2, "little")              # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")              # block align
        + (16).to_bytes(2, "little")             # bits/sample
    )
    return hdr + fmt + b"data" + n.to_bytes(4, "little") + data


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """Parse a mono 16-bit PCM WAV payload to (samples int16, rate).
    Strict like decode_ppm: unsupported codecs/layouts raise ValueError
    (multi-chunk files are walked; only PCM/mono/16-bit is accepted)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            codec = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if (codec, ch, bits) != (1, 1, 16):
                raise ValueError("only PCM mono 16-bit supported")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("truncated WAV data chunk")
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


AUDIO_STATS_SCHEMA = (
    "doc_id long, n_samples long, sample_rate long, "
    "duration_ms double, peak long, rms double"
)


def audio_stats(
    clips: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decode stage (the WAV sibling of image_channel_stats):
    parse PCM payloads inside Arrow-batched ``mapInPandas`` and emit
    duration, peak amplitude, and RMS. RMS uses an exact int64
    sum-of-squares divided once (bit-stable for any engine summing the
    same integers), rounded to 6; duration is exact integer math over
    the sample rate. Binary never leaves the executor; no shuffle."""
    src = clips.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_samples", "sample_rate",
                                    "duration_ms", "peak", "rms")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data, rate = decode_wav(bytes(payload))
                n = len(data)
                sq = int((data.astype(np.int64) ** 2).sum())
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(n)
                rows["sample_rate"].append(rate)
                rows["duration_ms"].append(round_half_up(n * 1000 / rate, 6))
                rows["peak"].append(int(np.abs(data.astype(np.int64)).max()) if n else 0)
                # math.sqrt, not **0.5: pow(x, .5) is not guaranteed to
                # be the correctly-rounded sqrt the SQL side computes.
                rows["rms"].append(
                    round_half_up(math.sqrt(sq / n), 6) if n else 0.0
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(stats, AUDIO_STATS_SCHEMA)


def _dct_matrix(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis matrix (float64): M[k, i] =
    s_k * cos(pi * (2i + 1) * k / (2n)), s_0 = sqrt(1/n), else
    sqrt(2/n). 2-D DCT of A is then M @ A @ M.T."""
    i = np.arange(n)
    m = np.cos(np.pi * (2 * i[None, :] + 1) * i[:, None] / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def phash64(arr: "np.ndarray", hash_size: int = 8) -> int:
    """64-bit perceptual hash of a decoded (h, w, 3) uint8 image — the
    classic DCT pHash (Zauner, "Implementation and Benchmarking of
    Perceptual Image Hash Functions", 2010; same scheme as the public
    imagehash library): grayscale (channel mean), resize to
    (4*hash_size)^2, 2-D DCT-II, keep the top-left hash_size^2
    low-frequency block, threshold each coefficient against the block's
    MEDIAN. Median thresholding makes the hash invariant to global
    brightness/contrast shifts; low-frequency cropping makes it robust
    to small pixel noise — byte-identical images always collide, and
    near-identical ones land within a small Hamming distance."""
    gray = arr.astype(np.float64).mean(axis=2, keepdims=True)
    size = 4 * hash_size
    small = resize_nearest(gray.astype(np.uint8)[:, :, [0, 0, 0]], size, size)
    m = _dct_matrix(size)
    coeffs = (m @ small[:, :, 0].astype(np.float64) @ m.T)[
        :hash_size, :hash_size
    ]
    bits = (coeffs > np.median(coeffs)).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # as signed int64


PHASH_SCHEMA = "doc_id long, phash long, width int, height int"


def image_phash(
    images: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-image 64-bit perceptual hash over binary payloads: decode
    (PPM/PNG built-in, see decode_image) and pHash inside ONE
    Arrow-batched ``mapInPandas`` stage — the multimodal sibling of the
    text dedup fingerprints. Output (doc_id, phash, width, height).

    At 100 TB this is the image-dedup map stage: payloads never leave
    the executor, the emitted row is 28 bytes, and downstream exact
    grouping (identical/near-identical images) or Hamming banding (the
    SimhashIndex machinery works unchanged on phash) shuffles hashes
    only."""
    src = images.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "phash": [], "width": [], "height": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                arr = decode_image(bytes(payload))
                h, w, _ = arr.shape
                rows["doc_id"].append(doc_id)
                rows["phash"].append(phash64(arr))
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return src.mapInPandas(hash_batches, PHASH_SCHEMA)


def phash_dedup(
    images: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Exact perceptual-hash dedup: cluster images whose pHash collides
    (byte-identical images always do; brightness-shifted and lightly
    perturbed copies usually do) and assign every image its cluster
    representative (min id) plus the cluster size. ONE hash-agg shuffle
    on the 8-byte phash after the map-side hashing stage — dedup_exact's
    scale shape with the md5 swapped for a perceptual fingerprint."""
    hashed = scoped_persist(
        image_phash(images, payload_col, id_col), "multimodal.phash"
    )
    reps = hashed.groupBy("phash").agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("cluster_size")
    )
    return hashed.join(reps, "phash").select(
        "doc_id", "rep_id", "cluster_size"
    )


def audio_fingerprint64(samples: "np.ndarray") -> int:
    """64-bit audio fingerprint — the Haitsma-Kalker band-energy scheme
    ("A Highly Robust Audio Fingerprinting System", ISMIR 2002),
    compacted to one word: split the clip into 5 equal frames, measure
    17 band energies per frame (FFT magnitude-squared over contiguous
    bins, DC excluded), and emit bit(f, b) = sign of the TIME-difference
    of adjacent BAND-differences — 4 frame transitions x 16 band
    transitions = 64 bits. Energy ratios are volume-invariant (a gain
    change scales every band by the same factor, preserving all signs),
    so re-encoded / re-leveled copies of a clip land within a tiny
    Hamming ball — the audio analogue of phash64's brightness
    invariance."""
    x = samples.astype(np.float64)
    n = (len(x) // 5) * 5
    if n == 0:
        return 0
    frames = x[:n].reshape(5, -1)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    nbins = spec.shape[1] - 1  # non-DC
    if nbins < 17:
        return 0
    edges = 1 + (np.arange(18) * nbins) // 17
    e = np.add.reduceat(spec[:, 1:], edges[:-1] - 1, axis=1)[:, :17]
    d = e[:, :-1] - e[:, 1:]
    dd = d[1:, :] - d[:-1, :]
    v = 0
    for b in (dd > 0).ravel():
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # as signed int64


AFP_SCHEMA = "doc_id long, afp long, n_samples long, sample_rate long"


def audio_fingerprints(
    clips: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-clip 64-bit audio fingerprint over binary WAV payloads:
    decode (RIFF walker, decode_wav) and fingerprint inside ONE
    Arrow-batched mapInPandas stage — payloads never leave the
    executor; 32 bytes out per clip. Downstream, exact grouping or
    hamming_pairs banding dedups re-leveled/re-encoded copies at
    hash-only shuffle cost."""
    src = clips.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "afp": [], "n_samples": [], "sample_rate": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                samples, rate = decode_wav(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["afp"].append(audio_fingerprint64(samples))
                rows["n_samples"].append(len(samples))
                rows["sample_rate"].append(rate)
            yield pd.DataFrame(rows)

    return src.mapInPandas(fp, AFP_SCHEMA)


def encode_framepack(frames: "list[bytes]") -> bytes:
    """Serialize a frame sequence as a length-prefixed pack: u32 frame
    count, then per frame u32 length + bytes (all big-endian). The
    simplest real multi-frame container — a demuxer stand-in that keeps
    the video path byte-honest without libav (which is not in this
    container). Frames are opaque; pair with encode_ppm/encode_png for
    image frames."""
    out = [len(frames).to_bytes(4, "big")]
    for f in frames:
        out.append(len(f).to_bytes(4, "big"))
        out.append(f)
    return b"".join(out)


def decode_framepack(payload: bytes) -> "list[bytes]":
    """Parse a framepack payload back to its frame list. Strict like the
    other decoders: truncation raises ValueError."""
    if len(payload) < 4:
        raise ValueError("truncated framepack header")
    n = int.from_bytes(payload[:4], "big")
    pos, frames = 4, []
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated framepack length")
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        pos += 4
        body = payload[pos : pos + ln]
        if len(body) != ln:
            raise ValueError("truncated framepack frame")
        frames.append(body)
        pos += ln
    return frames


VIDEO_PHASH_SCHEMA = "doc_id long, frame_id int, phash long"


def video_frame_phashes(
    videos: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame perceptual hashes of framepack video payloads: demux +
    decode + DCT-hash every frame inside ONE Arrow-batched mapInPandas
    stage — the frame explosion happens inside the batch (no per-frame
    JVM<->Python chatter), and what leaves the executor is 20 bytes per
    frame, never pixels. Output (doc_id, frame_id, phash)."""
    src = videos.select(F.col(id_col).alias("doc_id"), F.col(payload_col))

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_id": [], "phash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                for i, frame in enumerate(decode_framepack(bytes(payload))):
                    rows["doc_id"].append(doc_id)
                    rows["frame_id"].append(i)
                    rows["phash"].append(phash64(decode_image(frame)))
            yield pd.DataFrame(rows)

    return src.mapInPandas(hash_frames, VIDEO_PHASH_SCHEMA)


def video_phash_dedup(
    videos: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Video-level near-dup via frame-hash signatures: a video's
    signature is the md5 of its ORDERED frame pHash sequence, so two
    videos collide iff every frame is perceptually identical in order —
    catching re-encoded/re-graded copies (per-frame pHash absorbs
    brightness/contrast shifts) while separating edits that drop,
    reorder, or replace frames. One signature aggregate + one hash-agg
    cluster shuffle; pixels never shuffle."""
    fp = video_frame_phashes(videos, payload_col, id_col)
    sig = fp.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("frame_id", "phash"))
                    ),
                    lambda s: s["phash"].cast("string"),
                ),
            ).cast("binary")
        ).alias("sig"),
        F.count(F.lit(1)).alias("n_frames"),
    )
    sig = scoped_persist(sig, "multimodal.video_sig")
    reps = sig.groupBy("sig").agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("cluster_size")
    )
    return sig.join(reps, "sig").select(
        "doc_id", "n_frames", "rep_id", "cluster_size"
    )
