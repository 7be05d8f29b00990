"""Multimodal columns (SURVEY §2.10): opaque binary payloads + typed
metadata, with Arrow-batched decode/feature-extract plumbing.

Design: media travels as a ``binary`` column beside a metadata struct
(mime, n_bytes, digest). Decode / resize / frame-sample run as
``mapInPandas`` batch iterators — Arrow transfer, bounded batch memory,
schema declared up front — exactly the shape a real image/audio pipeline
needs on a cluster. The actual codecs are NOT in this container, so the
decoder body is a clearly-marked deterministic stub (per the driver
brief): the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, mime string, n_bytes long, digest string, payload binary"
)

DECODED_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, n_channels int"
)


def to_media_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a source column as a multimodal payload: binary bytes + typed
    metadata struct. (Testdata has no real media; text bytes stand in as
    the opaque payload — the column types are what matter.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.when(F.col("source").isin("src0", "src1"), "image/png")
        .when(F.col("source") == "src2", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
        payload.alias("payload"),
    )


def _decode_stub(payload: bytes, mime: str) -> tuple[int, int, int]:
    """STUB decoder — real image/audio libs are not in this container.

    Deterministic fake: derives (width, height, channels) from payload
    length so tests are stable. A production deployment replaces this
    body with PIL/libav decode; the mapInPandas plumbing is unchanged.
    """
    n = len(payload)
    if mime.startswith("image/"):
        return (n % 640 + 1, n % 480 + 1, 3)
    if mime.startswith("audio/"):
        return (n, 1, 1)
    if mime.startswith("video/"):
        return (n % 1920 + 1, n % 1080 + 1, 3)
    raise NotImplementedError(f"no decoder for mime {mime}")


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling — the one-to-MANY multimodal op (decode is 1:1):
    each video payload yields up to ``max_frames`` frame rows via
    mapInPandas. The frame extraction itself is STUBBED (no codecs in
    this container: a frame = a byte slice); the real thing swaps the
    slice for libav keyframe extraction — the batch-iterator plumbing,
    output schema, and row fan-out are what this exercises."""

    def frames(batches):
        import pandas as _pd

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                if not mime.startswith("video/"):
                    continue
                for k in range(min(max(len(payload) // every_n_bytes, 1), max_frames)):
                    ids.append(doc_id)
                    idxs.append(k)
                    blobs.append(bytes(payload[k * every_n_bytes : (k + 1) * every_n_bytes]))
            yield _pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, mime string, n_bytes long, digest string, payload binary"
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize — the 1:1 payload-TRANSFORM multimodal op (decode is 1:1
    payload→metadata, frame-sample is 1:N): each image payload is
    rewritten to a fixed target size, metadata (n_bytes, digest)
    recomputed to stay consistent with the new bytes. The pixel
    resample is STUBBED (no codecs in this container: bytes are tiled /
    truncated to exactly ``width*height*3``); a production deployment
    swaps the body for PIL ``Image.resize`` — the mapInPandas batch
    iterator, the recomputed-metadata contract, and the passthrough of
    non-image rows are what this exercises. Map-only, no shuffle; batch
    memory bounded by spark.sql.execution.arrow.maxRecordsPerBatch."""
    target = width * height * 3

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def stub(payload: bytes) -> bytes:
            # STUB resample — swap for a real decoder+resize in prod
            if len(payload) >= target:
                return bytes(payload[:target])
            reps = target // max(len(payload), 1) + 1
            return bytes((payload * reps)[:target])

        for pdf in batches:
            out_payload = [
                stub(p) if m.startswith("image/") else bytes(p)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) for p in out_payload],
                    "digest": [hashlib.md5(p).hexdigest() for p in out_payload],
                    "payload": out_payload,
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "doc_id long, mime string, embedding array<float>"


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Feature extraction — payload → fixed-``dim`` float embedding, the
    step that bridges opaque media into the engine's similarity /
    clustering / dedup operators (``operators.similarity``,
    ``dedup_semantic_kmeans`` consume exactly this ``array<float>``
    shape). The encoder is a STUBBED deterministic projection (chunked
    byte sums, L2-normalized — numpy over the Arrow batch, no per-row
    Python loops beyond the byte view); production swaps in a CLIP /
    wav2vec ONNX session per batch iterator (load once per partition,
    NOT per row — the reason this is mapInPandas and not a scalar UDF).
    Map-only; output is ~dim*4 bytes/row regardless of payload size, so
    the downstream shuffle (if any) never carries media bytes."""

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def stub(payload: bytes) -> _np.ndarray:
            # STUB encoder — swap for a real model session in prod
            arr = _np.frombuffer(payload, dtype=_np.uint8)
            if arr.size == 0:
                return _np.zeros(dim, dtype=_np.float32)
            pad = (-arr.size) % dim
            arr = _np.pad(arr, (0, pad)).reshape(-1, dim).astype(_np.float64)
            v = arr.sum(axis=0)
            norm = _np.linalg.norm(v)
            return (v / norm if norm > 0 else v).astype(_np.float32)

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "embedding": [stub(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(embed_batches, schema=FEATURES_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``: the batch iterator shape
    a real decoder uses (bounded memory, vectorized transfer, pure
    per-partition map — no shuffle).

    The closure is deliberately self-contained (local imports, stub
    inlined): Python workers deserialize it without needing this package
    on their sys.path, so the catalog entry runs under any driver cwd.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def stub(payload: bytes, mime: str) -> tuple[int, int, int]:
            # STUB decoder (see _decode_stub) — swap for PIL/libav in prod
            n = len(payload)
            if mime.startswith("image/"):
                return (n % 640 + 1, n % 480 + 1, 3)
            if mime.startswith("audio/"):
                return (n, 1, 1)
            if mime.startswith("video/"):
                return (n % 1920 + 1, n % 1080 + 1, 3)
            raise NotImplementedError(f"no decoder for mime {mime}")

        for pdf in batches:
            dims = [stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL PNG codec — pure Python + numpy over the stdlib zlib, no external
# codec libraries (none exist in this container). This replaces the stub
# for image/png: real chunk parse, CRC verification, IDAT inflate, and
# per-scanline unfilter (all five PNG filter types). Scope honestly
# gated: bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA),
# non-interlaced — palette / 16-bit / Adam7 raise NotImplementedError.
#
# Both functions are built inside a factory so their qualnames are
# `<locals>`-scoped: cloudpickle then serializes them BY VALUE into
# mapInPandas closures (a module-level function pickles by REFERENCE and
# fails to unpickle on Python workers that don't have this repo on
# sys.path — same self-containment discipline as operators/bloom.py).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_codec():
    """Build (png_encode, png_decode). See the block comment above for
    why this is a factory and not two module-level defs."""
    import struct
    import zlib

    import numpy as np

    SIG = b"\x89PNG\r\n\x1a\n"
    COLOR_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}
    CHANNELS_OF_COLOR = {0: 1, 4: 2, 2: 3, 6: 4}

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def _shift_left(line: np.ndarray, bpp: int) -> np.ndarray:
        """line's left-neighbor pixel (zeros for the first pixel)."""
        out = np.zeros_like(line)
        out[bpp:] = line[:-bpp]
        return out

    def png_encode(pixels, filters=(0,)) -> bytes:
        """Encode an (h, w) or (h, w, c) uint8 array as a REAL PNG.

        ``filters`` cycles per scanline over PNG filter types 0-4 (None,
        Sub, Up, Average, Paeth) — the default all-None matches most
        minimal encoders; passing range(5) exercises every decode path.
        Filtering is exact per the PNG spec §9: Sub/Average/Paeth
        predict from RECONSTRUCTED (original) bytes, all arithmetic
        mod 256; encoding is fully vectorized per scanline."""
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim == 2:
            px = px[:, :, None]
        h, w, c = px.shape
        if c not in COLOR_OF_CHANNELS:
            raise ValueError(f"unsupported channel count {c}")
        bpp = c
        stride = w * c
        flat = px.reshape(h, stride).astype(np.int32)
        prev = np.zeros(stride, dtype=np.int32)
        parts = []
        for y in range(h):
            line = flat[y]
            ft = filters[y % len(filters)]
            left = _shift_left(line, bpp)
            if ft == 0:
                f = line
            elif ft == 1:
                f = (line - left) % 256
            elif ft == 2:
                f = (line - prev) % 256
            elif ft == 3:
                f = (line - (left + prev) // 2) % 256
            elif ft == 4:
                upleft = _shift_left(prev, bpp)
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                f = (line - pred) % 256
            else:
                raise ValueError(f"bad filter type {ft}")
            parts.append(bytes([ft]) + f.astype(np.uint8).tobytes())
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, COLOR_OF_CHANNELS[c], 0, 0, 0)
        idat = zlib.compress(b"".join(parts), 6)
        return SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")

    def png_decode(payload: bytes):
        """Decode REAL PNG bytes → (width, height, channels, pixels) with
        ``pixels`` an (h, w, c) uint8 array. Verifies every chunk CRC,
        concatenates multiple IDATs, inflates, and unfilters per spec
        §9 (Sub via per-lane cumsum — exactly the mod-256 prefix sum —
        Up vectorized, Average/Paeth left-to-right per pixel since each
        reconstruction feeds the next prediction)."""
        if bytes(payload[:8]) != SIG:
            raise ValueError("not a PNG (bad signature)")
        pos, ihdr, idat = 8, None, []
        while pos + 12 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = bytes(payload[pos + 4 : pos + 8])
            data = bytes(payload[pos + 8 : pos + 8 + length])
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"bad CRC in {ctype!r} chunk")
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        w, h, depth, color, comp, filt, interlace = ihdr
        if depth != 8 or interlace != 0 or color not in CHANNELS_OF_COLOR:
            raise NotImplementedError(
                f"unsupported PNG (depth={depth}, color={color}, "
                f"interlace={interlace}): only 8-bit non-interlaced "
                "gray/RGB/gray+alpha/RGBA"
            )
        c = CHANNELS_OF_COLOR[color]
        bpp, stride = c, w * c
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != h * (stride + 1):
            raise ValueError("IDAT length mismatch")
        recon = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            off = y * (stride + 1)
            ft = raw[off]
            line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
            if ft == 0:
                cur = line
            elif ft == 1:
                cur = (
                    np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.int64) % 256
                ).astype(np.int32).reshape(-1)
            elif ft == 2:
                cur = (line + prev) % 256
            elif ft == 3:
                cur = np.empty(stride, dtype=np.int32)
                zero = np.zeros(bpp, dtype=np.int32)
                for x in range(0, stride, bpp):
                    left = cur[x - bpp : x] if x else zero
                    cur[x : x + bpp] = (
                        line[x : x + bpp] + (left + prev[x : x + bpp]) // 2
                    ) % 256
            elif ft == 4:
                cur = np.empty(stride, dtype=np.int32)
                zero = np.zeros(bpp, dtype=np.int32)
                for x in range(0, stride, bpp):
                    a = cur[x - bpp : x] if x else zero
                    b = prev[x : x + bpp]
                    cc = prev[x - bpp : x] if x else zero
                    p = a + b - cc
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
                    cur[x : x + bpp] = (line[x : x + bpp] + pred) % 256
            else:
                raise ValueError(f"bad filter type {ft} on scanline {y}")
            recon[y] = cur.astype(np.uint8)
            prev = cur
        return w, h, c, recon.reshape(h, w, c)

    return png_encode, png_decode


png_encode, png_decode = _png_codec()


def _wav_codec():
    """Build (wav_encode, wav_decode) — REAL RIFF/WAVE PCM16 codec, pure
    Python + numpy over struct. Same factory-for-by-value-pickling
    discipline as ``_png_codec``. Scope honestly gated: PCM (format
    code 1), 16-bit samples — float/ADPCM/extensible raise
    NotImplementedError."""
    import struct

    import numpy as np

    def wav_encode(samples, sample_rate: int = 16000) -> bytes:
        """Encode an (n,) or (n, channels) int16 array as a REAL WAV
        file: RIFF container, canonical 16-byte PCM ``fmt `` chunk,
        interleaved little-endian ``data`` chunk."""
        s = np.asarray(samples, dtype="<i2")
        if s.ndim == 1:
            s = s[:, None]
        n, c = s.shape
        data = s.reshape(-1).tobytes()
        block = c * 2
        fmt = struct.pack("<HHIIHH", 1, c, sample_rate, sample_rate * block, block, 16)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def wav_decode(payload: bytes):
        """Decode REAL WAV bytes → (sample_rate, channels, samples) with
        ``samples`` an (n, channels) int16 array. Walks RIFF sub-chunks
        (word-aligned per spec, unknown chunks skipped), validates the
        declared sizes, requires PCM16."""
        b = bytes(payload)
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a WAV (bad RIFF/WAVE header)")
        (riff_size,) = struct.unpack("<I", b[4:8])
        if riff_size + 8 > len(b):
            raise ValueError("truncated WAV (RIFF size exceeds payload)")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            chunk = b[pos + 8 : pos + 8 + size]
            if len(chunk) != size:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", chunk[:16])
            elif cid == b"data":
                data = chunk
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        code, channels, rate, byte_rate, block, bits = fmt
        if code != 1 or bits != 16:
            raise NotImplementedError(
                f"unsupported WAV (format={code}, bits={bits}): only PCM16"
            )
        if block != channels * 2 or byte_rate != rate * block:
            raise ValueError("inconsistent fmt chunk")
        if len(data) % block:
            raise ValueError("data chunk not a whole number of frames")
        samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
        return rate, channels, samples

    return wav_encode, wav_decode


wav_encode, wav_decode = _wav_codec()


def _sniffer():
    """Build ``sniff_header(payload) -> dict`` — container-format
    detection + dimensions/rate from HEADER BYTES ONLY (no inflate, no
    sample read): the cheap metadata pass a 100 TB media lake runs over
    everything before deciding what to fully decode. Real parsers for
    PNG (IHDR), JPEG (marker walk to SOF0/1/2), GIF (logical screen
    descriptor), WAV (fmt chunk). Unknown formats classify as
    ``unknown`` rather than raising — a sniff must be total. Same
    by-value factory discipline as the codecs."""
    import struct

    def sniff_header(payload: bytes) -> dict:
        b = bytes(payload[:4096])
        out = {
            "detected": "unknown",
            "width": None,
            "height": None,
            "n_channels": None,
            "sample_rate": None,
        }
        try:
            if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
                w, h, depth, color = struct.unpack(">IIBB", b[16:26])
                out.update(
                    detected="png",
                    width=w,
                    height=h,
                    n_channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color),
                )
            elif b[:2] == b"\xff\xd8":  # JPEG SOI; walk markers to a SOF
                pos = 2
                while pos + 4 <= len(b):
                    if b[pos] != 0xFF:
                        break
                    marker = b[pos + 1]
                    if marker in (0xC0, 0xC1, 0xC2):  # baseline/ext/progressive SOF
                        h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
                        out.update(
                            detected="jpeg", width=w, height=h, n_channels=b[pos + 9]
                        )
                        break
                    if marker == 0xD9 or marker == 0xDA:  # EOI / scan data begins
                        break
                    (seg,) = struct.unpack(">H", b[pos + 2 : pos + 4])
                    pos += 2 + seg
            elif b[:6] in (b"GIF87a", b"GIF89a"):
                w, h = struct.unpack("<HH", b[6:10])
                out.update(detected="gif", width=w, height=h)
            elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                pos = 12
                while pos + 8 <= len(b):
                    cid = b[pos : pos + 4]
                    (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                    if cid == b"fmt " and size >= 16:
                        _, ch, rate = struct.unpack("<HHI", b[pos + 8 : pos + 16])
                        out.update(detected="wav", n_channels=ch, sample_rate=rate)
                        break
                    pos += 8 + size + (size & 1)
        except (struct.error, IndexError):
            pass  # truncated header: whatever was parsed so far stands
        return out

    return sniff_header


sniff_header = _sniffer()

SNIFFED_SCHEMA = (
    "doc_id long, detected string, width int, height int, "
    "n_channels int, sample_rate int"
)


def sniff_media(media: DataFrame) -> DataFrame:
    """Header-only metadata extraction over the payload column — one row
    per input row regardless of format (``detected='unknown'`` for
    unparseable bytes, so downstream routing is a plain filter). Reads
    at most 4 KiB per payload; map-only mapInPandas, no shuffle."""
    sniff = sniff_header

    def sniff_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            metas = [sniff(bytes(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "detected": [m["detected"] for m in metas],
                    "width": _pd.array([m["width"] for m in metas], dtype="Int32"),
                    "height": _pd.array([m["height"] for m in metas], dtype="Int32"),
                    "n_channels": _pd.array(
                        [m["n_channels"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": _pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                }
            )

    return media.mapInPandas(sniff_batches, schema=SNIFFED_SCHEMA)

PNG_DECODED_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, mean_px double, std_px double"
)


def decode_png_media(media: DataFrame) -> DataFrame:
    """REAL decode over the multimodal payload column: rows whose mime is
    ``image/png`` are parsed with the full pure-Python codec (CRC check,
    inflate, unfilter) into dimensions + pixel statistics; non-PNG rows
    are dropped (a production pipeline unions per-mime decoders, each
    map-only). Arrow-batched mapInPandas, 1:1 on PNG rows, no shuffle;
    the codec travels by value inside the closure (see ``_png_codec``)."""
    decode = png_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, ws, hs, cs, means, stds = [], [], [], [], [], []
            for doc_id, mime, payload in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                if mime != "image/png":
                    continue
                w, h, c, px = decode(bytes(payload))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                means.append(float(px.mean()))
                stds.append(float(px.std()))
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "n_channels": cs,
                    "mean_px": means,
                    "std_px": stds,
                }
            )

    return media.mapInPandas(decode_batches, schema=PNG_DECODED_SCHEMA)


WAV_DECODED_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double"
)


def decode_wav_media(media: DataFrame) -> DataFrame:
    """REAL decode over the multimodal payload column for ``audio/wav``
    rows: full RIFF parse into rate/channels/length plus signal stats
    (duration, RMS amplitude — the audio analog of the PNG pixel stats).
    Non-WAV rows are dropped; Arrow-batched map-only mapInPandas, codec
    shipped by value (see ``_wav_codec``)."""
    decode = wav_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, rates, chans, ns, durs, rmss = [], [], [], [], [], []
            for doc_id, mime, payload in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                if mime != "audio/wav":
                    continue
                rate, c, samples = decode(bytes(payload))
                ids.append(doc_id)
                rates.append(rate)
                chans.append(c)
                ns.append(samples.shape[0])
                durs.append(samples.shape[0] / rate)
                rmss.append(
                    float(_np.sqrt(_np.mean(samples.astype(_np.float64) ** 2)))
                    if samples.size
                    else 0.0
                )
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": rates,
                    "n_channels": chans,
                    "n_samples": ns,
                    "duration_s": durs,
                    "rms": rmss,
                }
            )

    return media.mapInPandas(decode_batches, schema=WAV_DECODED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, rms double, "
    "zero_crossing_rate double, spectral_centroid_hz double, "
    "spectral_bandwidth_hz double, peak_freq_hz double"
)


def audio_features_media(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over ``audio/wav`` payloads — the
    non-stub upgrade of the feature-extract stage (SURVEY §2.10
    multimodal: decode / feature-extract / resize / frame-sample). Per
    clip, on the mono mix: RMS, zero-crossing rate (sign flips per
    second — the classic voiced/unvoiced & noisiness proxy), spectral
    centroid and bandwidth (magnitude-weighted mean/std of the rfft
    bins, Hz), and the peak-magnitude frequency. All numpy batch math
    (one rfft per clip — O(n log n)); Arrow-batched map-only
    mapInPandas; decoder ships by value. Deterministic: pure functions
    of the payload. Non-WAV rows are dropped, matching
    ``decode_wav_media``; a clip shorter than 2 samples yields zeroed
    spectral features rather than NaN.

    Scale: per-row CPU ∝ clip length; zero shuffle. At 100 TB the only
    knob that matters is scan split granularity (pair with ``fan_out``
    on single-row-group inputs, same as the decode entries)."""
    decode = wav_decode

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        rows: dict[str, list] = None  # set per batch

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "rms",
                "zero_crossing_rate", "spectral_centroid_hz",
                "spectral_bandwidth_hz", "peak_freq_hz",
            )}
            for doc_id, mime, payload in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                if mime != "audio/wav":
                    continue
                rate, _c, samples = decode(bytes(payload))
                x = samples.astype(_np.float64).mean(axis=1)  # mono mix
                n = x.size
                rms = float(_np.sqrt(_np.mean(x**2))) if n else 0.0
                if n >= 2:
                    flips = int(_np.count_nonzero(_np.signbit(x[1:]) != _np.signbit(x[:-1])))
                    zcr = flips / ((n - 1) / rate)  # crossings per second
                    mag = _np.abs(_np.fft.rfft(x))
                    freqs = _np.fft.rfftfreq(n, d=1.0 / rate)
                    tot = mag.sum()
                    if tot > 0:
                        centroid = float((freqs * mag).sum() / tot)
                        bandwidth = float(
                            _np.sqrt(((freqs - centroid) ** 2 * mag).sum() / tot)
                        )
                        peak = float(freqs[int(mag.argmax())])
                    else:
                        centroid = bandwidth = peak = 0.0
                else:
                    zcr = centroid = bandwidth = peak = 0.0
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["rms"].append(rms)
                rows["zero_crossing_rate"].append(zcr)
                rows["spectral_centroid_hz"].append(centroid)
                rows["spectral_bandwidth_hz"].append(bandwidth)
                rows["peak_freq_hz"].append(peak)
            yield _pd.DataFrame(rows)

    return media.mapInPandas(feature_batches, schema=AUDIO_FEATURES_SCHEMA)
