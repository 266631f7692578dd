"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool map_batches stages.

The image/audio decode libraries are not present in this container, so the
DECODE KERNEL is stubbed (SURVEY.md environment constraints): a real
deployment sets ``MediaFeatureExtractor(strict=True)`` and implements
``_decode_real`` (raises NotImplementedError here); the default path uses a
deterministic fake decoder over the raw bytes so the Ray-side plumbing —
schema, broadcast-free actor state, small batch sizes for wide binary rows,
output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.gen import hash_u64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("media_type", pa.string()),   # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

_TYPES = ("image", "audio", "video")


def synth_media_batch(batch: pa.Table, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for a documents batch (pure fn of doc_id)."""
    ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    h = hash_u64(ids, 921)
    # int(x) first: np.uint64 % python-int silently promotes to float64 and
    # loses low bits above 2^53 — integer mod is the defined behavior
    mtypes = [_TYPES[int(x) % 3] for x in h]
    payloads = []
    for i, seed in zip(ids, h):
        # payload = repeated splitmix stream — deterministic, incompressible-ish
        words = hash_u64(np.arange(payload_bytes // 8), 922 + int(i) % 1024)
        payloads.append(words.tobytes())
    w = (64 + (h % np.uint64(1024))).astype(np.int32)
    ht = (64 + ((h >> np.uint64(16)) % np.uint64(1024))).astype(np.int32)
    dur = ((h >> np.uint64(32)) % np.uint64(600_000)).astype(np.int32)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(mtypes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(ht, pa.int32()),
            "duration_ms": pa.array(dur, pa.int32()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode → feature-extract one media batch.

    ``__init__`` loads the (stubbed) model once per actor. Use a SMALL
    ``batch_size`` (e.g. 64) when payloads are large so
    batch × concurrency fits worker heaps (SURVEY.md memory guidance).
    """

    N_FEATURES = 4

    def __init__(self, strict: bool = False):
        self.strict = strict
        # real path would load decoders/models here, once per actor:
        # self.model = load_model(...)

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; deploy with strict=True after implementing"
        )

    def _decode_fake(self, payload: bytes, media_type: str) -> np.ndarray:
        """Deterministic stand-in features: byte-stream statistics."""
        b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        if len(b) == 0:
            return np.zeros(self.N_FEATURES)
        return np.array([b.mean(), b.std(), float(b[:64].sum() % 997), float(len(b))])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        decode = self._decode_real if self.strict else self._decode_fake
        feats = np.stack([decode(p, m) for p, m in zip(payloads, mtypes)])
        cols = {
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
        for j in range(self.N_FEATURES):
            cols[f"feat_{j}"] = pa.array(feats[:, j], pa.float64())
        return pa.table(cols)


def media_features(docs_ds, concurrency=(1, 4), batch_size: int = 64):
    """documents → synth media → actor-pool feature extraction."""
    media = docs_ds.map_batches(synth_media_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool resize stage (image payloads). The real pixel resample is
    stubbed like the decoder (no imaging libs offline); the REAL parts are
    the plumbing a production stage needs: per-actor setup, small batches
    for wide binary rows, metadata recomputation, payload size budget."""

    def __init__(self, target_w: int = 224, target_h: int = 224, strict: bool = False):
        self.tw, self.th, self.strict = target_w, target_h, strict

    def _resize_real(self, payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError("pixel resample needs an imaging library")

    def _resize_fake(self, payload: bytes, w: int, h: int) -> bytes:
        # deterministic byte-domain stand-in: sample the payload down/up to
        # the byte budget implied by the target size (1 byte per pixel)
        budget = self.tw * self.th // 64  # keep fixtures small
        b = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(budget, dtype=np.int64) * max(len(b), 1)) // max(budget, 1)
        return b[np.clip(idx, 0, len(b) - 1)].tobytes() if len(b) else b""

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self._resize_real if self.strict else self._resize_fake
        out_payload = []
        for p, mt, w, h in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist(),
                               batch["width"].to_pylist(), batch["height"].to_pylist()):
            out_payload.append(fn(p, w, h) if mt == "image" else p)
        t = batch.drop_columns(["payload", "width", "height"])
        return (
            t.append_column("payload", pa.array(out_payload, pa.binary()))
            .append_column("width", pa.array(np.full(batch.num_rows, self.tw, np.int32), pa.int32()))
            .append_column("height", pa.array(np.full(batch.num_rows, self.th, np.int32), pa.int32()))
        )


def sample_frames(batch: pa.Table, n_frames: int = 4, frame_bytes: int = 256) -> pa.Table:
    """Deterministic frame sampling for video payloads: each video row emits
    ``n_frames`` rows with evenly-spaced byte windows as the frame payloads
    (a real deployment decodes at evenly-spaced timestamps; the fan-out
    shape, schema, and determinism are what the pipeline relies on)."""
    out_doc, out_frame, out_off, out_payload = [], [], [], []
    for doc, mt, p, dur in zip(batch["doc_id"].to_pylist(), batch["media_type"].to_pylist(),
                               batch["payload"].to_pylist(), batch["duration_ms"].to_pylist()):
        if mt != "video" or not p:
            continue
        for f in range(n_frames):
            off = (f * max(len(p) - frame_bytes, 0)) // max(n_frames - 1, 1)
            out_doc.append(doc)
            out_frame.append(f)
            out_off.append(int((f * dur) // max(n_frames - 1, 1)))
            out_payload.append(p[off : off + frame_bytes])
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "frame": pa.array(out_frame, pa.int32()),
            "ts_ms": pa.array(out_off, pa.int32()),
            "frame_payload": pa.array(out_payload, pa.binary()),
        }
    )
