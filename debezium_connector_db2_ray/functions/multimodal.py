"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride through the engine as ``binary`` columns with metadata
columns alongside. Two decoders share the actor-pool signature:
``RealDecoder`` genuinely parses container headers for the formats that need
no codec library (PPM/PGM, BMP, RIFF/WAVE) and raises on formats that would
need PIL/pyav (absent in this container — the production hook swaps them in
behind the same signature); ``FakeDecoder`` produces deterministic payload
features so the plumbing is SQL-oracle-checkable end to end.

Scale notes: binary payloads make rows wide — callers should use small
``batch_size`` (e.g. 64) and ``batch_format="pyarrow"`` end-to-end (binary
columns do not survive pandas round-trips unscathed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def pack_text_as_media(batch: pa.Table) -> pa.Table:
    """Test fixture stage: wrap utf-8 text bytes as an opaque media payload
    (the engine treats payloads as opaque, so any bytes pin the plumbing)."""
    texts = batch["text"].to_pylist()
    payloads = [(t or "").encode() for t in texts]
    kinds = ["image", "audio", "video"]
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kinds[int(i) % 3] for i in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic REAL media fixtures from doc ids: PPM (doc_id%5==0),
    BMP (==1), WAV (==2), PNG (==3) or GIF (==4) payloads with true,
    well-formed containers (PNG carries CRC-valid IHDR/IDAT/IEND chunks)
    whose dimensions are pure functions of doc_id — so a SQL oracle can
    recompute what RealDecoder must parse back out (decode inverts
    encode)."""
    import struct
    import zlib

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads, kinds = [], []

    def png_chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    for i in ids:
        m = int(i) % 5
        if m == 3:
            w, h = int(i) % 40 + 1, int(i) % 30 + 1
            color_type = 2 if int(i) % 2 == 0 else 6  # RGB | RGBA
            nch = 3 if color_type == 2 else 4
            ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
            raw = bytes((w * nch + 1) * h)  # filter byte 0 + zero scanline
            payloads.append(
                b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
                + png_chunk(b"IDAT", zlib.compress(raw))
                + png_chunk(b"IEND", b"")
            )
            kinds.append("image")
            continue
        if m == 4:
            w, h = int(i) % 20 + 1, int(i) % 15 + 1
            payloads.append(
                b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"
            )
            kinds.append("image")
            continue
        if m == 0:
            w, h = int(i) % 32 + 1, int(i) % 24 + 1
            payloads.append(
                b"P6\n%d %d\n255\n" % (w, h) + bytes(w * h * 3)
            )
            kinds.append("image")
        elif m == 1:
            w, h = int(i) % 64 + 1, int(i) % 48 + 1
            row = (w * 3 + 3) & ~3  # BMP rows pad to 4 bytes
            data = bytes(row * h)
            header = struct.pack(
                "<2sIHHIIiiHHIIiiII",
                b"BM", 54 + len(data), 0, 0, 54, 40, w, h, 1, 24, 0,
                len(data), 2835, 2835, 0, 0,
            )
            payloads.append(header + data)
            kinds.append("image")
        else:
            channels = 1 + int(i) % 2
            sample_rate, bits = 8000, 16
            block = channels * bits // 8
            n_samples = int(i) % 500 + 1
            data = bytes(n_samples * block)
            header = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, channels,
                sample_rate, sample_rate * block, block, bits, b"data",
                len(data),
            )
            payloads.append(header + data)
            kinds.append("audio")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class RealDecoder:
    """Dependency-free REAL decoder (actor-pool stage) for the container
    formats parseable in pure numpy/stdlib: PPM/PGM (P6/P5), BMP, PNG
    (IHDR, CRC-verified) and GIF images, RIFF/WAVE audio. Parses ACTUAL
    header bytes — width/height/channels from the image container,
    channels/sample-rate/duration from the WAV fmt/data chunks — so decode
    genuinely inverts whatever encoder wrote the payload. Formats that
    need codec libraries (JPEG/MP3/MP4) raise
    ValueError; the production hook swaps PIL/pyav in behind the same actor
    signature. (Reference analog in spirit: typed payload fidelity,
    DatatypesFromSnapshotIT.java:70-140.)"""

    def __init__(self, strict: bool = True):
        self.strict = strict  # False: unknown formats yield nulls, not errors

    @staticmethod
    def _parse(p: bytes) -> dict:
        import struct

        if len(p) >= 2 and p[:2] in (b"P6", b"P5"):
            # PPM/PGM: magic, then whitespace-separated w h maxval
            # (with optional '#' comment lines)
            toks, i, tok = [], 2, b""
            while i < len(p) and len(toks) < 3:
                c = p[i:i + 1]
                if c == b"#":
                    while i < len(p) and p[i:i + 1] != b"\n":
                        i += 1
                elif c in b" \t\r\n":
                    if tok:
                        toks.append(int(tok))
                        tok = b""
                else:
                    tok += c
                i += 1
            if len(toks) < 3:
                raise ValueError("truncated PPM header")
            return {"format": "ppm", "width": toks[0], "height": toks[1],
                    "channels": 3 if p[:2] == b"P6" else 1}
        if len(p) >= 54 and p[:2] == b"BM":
            w, h = struct.unpack_from("<ii", p, 18)
            bpp = struct.unpack_from("<H", p, 28)[0]
            return {"format": "bmp", "width": w, "height": abs(h),
                    "channels": max(1, bpp // 8)}
        if len(p) >= 33 and p[:8] == b"\x89PNG\r\n\x1a\n":
            import zlib

            ln, tag = struct.unpack_from(">I4s", p, 8)
            if tag != b"IHDR" or ln != 13:
                raise ValueError("PNG missing IHDR")
            crc = struct.unpack_from(">I", p, 16 + ln)[0]
            if crc != zlib.crc32(p[12:16 + ln]):
                raise ValueError("PNG IHDR CRC mismatch")
            w, h, _depth, color_type = struct.unpack_from(">IIBB", p, 16)
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            if nch is None:
                raise ValueError(f"PNG bad color type {color_type}")
            return {"format": "png", "width": w, "height": h,
                    "channels": nch}
        if len(p) >= 13 and p[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", p, 6)
            return {"format": "gif", "width": w, "height": h,
                    "channels": 3}
        if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            o, channels, rate, byte_rate, data_size = 12, None, None, None, None
            while o + 8 <= len(p):
                cid = p[o:o + 4]
                size = struct.unpack_from("<I", p, o + 4)[0]
                if cid == b"fmt ":
                    channels, rate = struct.unpack_from("<HI", p, o + 10)
                    byte_rate = struct.unpack_from("<I", p, o + 16)[0]
                elif cid == b"data":
                    data_size = size
                o += 8 + size + (size & 1)  # chunks are word-aligned
            if channels is None or data_size is None or not byte_rate:
                raise ValueError("truncated WAV")
            return {"format": "wav", "channels": channels,
                    "sample_rate": rate,
                    "duration_ms": data_size * 1000 // byte_rate}
        raise ValueError(f"unrecognized media container (head={p[:8]!r})")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        cols = {k: [] for k in ("format", "width", "height", "channels",
                                "sample_rate", "duration_ms")}
        for p in payloads:
            try:
                meta = self._parse(p or b"")
            except ValueError:
                if self.strict:
                    raise
                meta = {"format": None}
            for k in cols:
                cols[k].append(meta.get(k))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "format": pa.array(cols["format"], pa.string()),
                "width": pa.array(cols["width"], pa.int32()),
                "height": pa.array(cols["height"], pa.int32()),
                "channels": pa.array(cols["channels"], pa.int32()),
                "sample_rate": pa.array(cols["sample_rate"], pa.int32()),
                "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
                "n_bytes": batch["n_bytes"],
            }
        )


class FakeDecoder:
    """Deterministic stand-in decoder (actor-pool stage): derives pseudo
    width/height/duration + an md5 payload digest from the payload bytes.
    Shapes and dtypes match what a real decoder stage would emit; every
    feature is a pure function of the payload so the whole stage is
    SQL-expressible and the gate oracle-checks it end to end."""

    def __init__(self, target_size: tuple[int, int] = (64, 64)):
        self.target = target_size  # "resize" parameters, fixed per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        payloads = batch["payload"].to_pylist()
        md5s = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        n = np.fromiter((len(p or b"") for p in payloads), dtype=np.int64,
                        count=len(payloads))
        width = (n % 1920 + 1).astype(np.int32)
        height = (n % 1080 + 1).astype(np.int32)
        duration_ms = (n * 10).astype(np.int64)
        # "resized" feature vector: 8 deterministic bytes sampled from payload
        feats = np.zeros((len(payloads), 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            b = np.frombuffer(p or b"\x00", dtype=np.uint8)
            idx = np.linspace(0, len(b) - 1, 8).astype(int)
            feats[i] = b[idx] / 255.0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(n),
                "payload_md5": pa.array(md5s, pa.string()),
                "width": pa.array(width),
                "height": pa.array(height),
                "duration_ms": pa.array(duration_ms),
                "feature": pa.array(list(feats), pa.list_(pa.float32(), 8)),
            }
        )


def decode_media(ds, *, decoder=FakeDecoder, concurrency: int = 2,
                 batch_size: int = 64, **decoder_kwargs):
    """The multimodal feature-extraction stage: actor pool, small batches
    (binary payloads are wide), zero-copy Arrow in/out."""
    return ds.map_batches(
        decoder,
        fn_constructor_kwargs=decoder_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
