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
    mtypes = [_TYPES[int(x % 3)] for x in h]
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
