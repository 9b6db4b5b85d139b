"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata
structs, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs (PIL/ffmpeg absent by design), so
the *decode* step is stubbed: if a real codec were importable we'd raise
``NotImplementedError`` to force an explicit integration; without one we
compute deterministic byte-level features. Everything Spark-side — schema,
binary encoding, batch iteration, output struct — is real and tested; a
production deployment swaps ``_decode_one`` only.

Scale notes: mapInPandas streams Arrow record batches (no driver collect,
no per-row Python); binary payloads stay opaque to the JVM so there is no
serialization amplification; partition count follows the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor (stable contract for downstream)
FEATURE_SCHEMA = "doc_id bigint, byte_len int, first_byte int, checksum bigint, decode_status string"


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, blob: binary, meta: struct) — the canonical
    multimodal layout: payload opaque, metadata typed and prunable."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.struct(
            F.col("source"), F.col("n_chars"), F.lit("text/plain").alias("mime")
        ).alias("meta"),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(blob: bytes) -> tuple[int, int, int, str] | None:
    """Real PNG decode with the stdlib only: IHDR header parse + zlib
    inflate of the IDAT stream. Features come from the DECODED pixel bytes
    (scanline-filtered, but real image data), not the container bytes."""
    import struct
    import zlib

    if not blob.startswith(_PNG_MAGIC):
        return None
    try:
        pos, idat = len(_PNG_MAGIC), []
        width = height = None
        while pos + 8 <= len(blob):
            (length,), ctype = struct.unpack(">I", blob[pos : pos + 4]), blob[pos + 4 : pos + 8]
            chunk = blob[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                width, height = struct.unpack(">II", chunk[:8])
            elif ctype == b"IDAT":
                idat.append(chunk)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if width is None or not idat:
            return None
        pixels = zlib.decompress(b"".join(idat))
        return len(pixels), pixels[0], sum(pixels) % 997, f"png:{width}x{height}"
    except Exception:
        return None  # corrupt container -> byte-level fallback below


def _decode_wav(blob: bytes) -> tuple[int, int, int, str] | None:
    """Real WAV decode via the stdlib ``wave`` module: features from the
    decoded PCM frames."""
    import io
    import wave

    if not blob.startswith(b"RIFF") or blob[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(blob)) as w:
            frames = w.readframes(w.getnframes())
            rate = w.getframerate()
        if not frames:
            return None
        return len(frames), frames[0], sum(frames) % 997, f"wav:{rate}hz"
    except Exception:
        return None


def _decode_one(blob: bytes) -> tuple[int, int, int, str]:
    """Decode a binary payload into (byte_len, first_byte, checksum, status).

    PNG and WAV payloads are REALLY decoded (stdlib struct/zlib/wave — no
    third-party codecs in this container): features come from decompressed
    pixel / PCM bytes and the status carries decoded metadata
    (``png:WxH`` / ``wav:RATEhz``). Any other payload falls back to
    deterministic byte-level features with status ``stub`` — the seam where
    a production deployment plugs PIL / pyav for JPEG/MP4 and friends."""
    if not blob:
        return 0, -1, 0, "empty"
    decoded = _decode_png(blob) or _decode_wav(blob)
    if decoded is not None:
        return decoded
    checksum = sum(blob) % 997
    return len(blob), blob[0], checksum, "stub"


def extract_features(with_blob: DataFrame) -> DataFrame:
    """(doc_id, blob, ...) -> FEATURE_SCHEMA rows via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_one(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "checksum": [f[2] for f in feats],
                    "decode_status": [f[3] for f in feats],
                }
            )

    return with_blob.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, resized_blob binary, decode_status string"
)


def resize_images(with_blob: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image-resize stage over binary payloads (mapInPandas).

    STUB decode (no codecs in this container): a real deployment replaces
    the body with ``PIL.Image.open(...).resize((width, height))``; here the
    "resized" payload is a deterministic truncation/padding of the source
    bytes to width*height so the Spark-side contract — binary in, binary +
    typed dims out, Arrow batching, partition preservation — is real and
    testable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            out_blob, status = [], []
            for b in pdf["blob"]:
                raw = bytes(b) if b is not None else b""
                if not raw:
                    out_blob.append(b"")
                    status.append("empty")
                    continue
                resized = (raw * (target // len(raw) + 1))[:target]
                out_blob.append(resized)
                status.append("stub")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized_blob": out_blob,
                    "decode_status": status,
                }
            )

    return with_blob.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_blob binary"


def sample_frames(with_blob: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling stage: one input payload -> n_frames rows
    (mapInPandas fan-out — the row-multiplying shape real frame extraction
    has). STUB: frames are deterministic equal-length slices of the payload;
    a real deployment decodes with pyav/ffmpeg and samples timestamps."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(b) if b is not None else b""
                if not raw:
                    continue
                step = max(len(raw) // n_frames, 1)
                for i in range(min(n_frames, len(raw))):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    blobs.append(raw[i * step : i * step + step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_blob": blobs})

    return with_blob.mapInPandas(batches, FRAME_SCHEMA)
