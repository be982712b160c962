"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride through the engine as ``binary`` columns with metadata
columns alongside. The decode/resize/frame-sample kernels would use PIL /
torchaudio / pyav — none of which exist in this container — so the decode
step is STUBBED: ``RealDecoder`` raises NotImplementedError (the honest
production hook), ``FakeDecoder`` produces deterministic features so the
Ray-side plumbing (actor signature, schema, batch size, output layout) is real
and tested.

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


class RealDecoder:
    """Production decode hook — requires PIL/torchaudio/pyav, absent here."""

    def __init__(self, kind: str = "image"):
        self.kind = kind

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "media decoding requires PIL/torchaudio/pyav, not available in "
            "this container; use FakeDecoder for plumbing tests"
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
