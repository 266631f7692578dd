"""Zero-copy Arrow list-column → numpy matrix view (the `_emb_matrix`
idiom, shared): flatten() reads the child values buffer (no per-row
as_py()), reshape assumes fixed-width rows (embeddings / pc / centroid
vectors all are)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_matrix(col: pa.Array | pa.ChunkedArray, dtype=np.float64) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0), dtype=dtype)
    flat = np.asarray(col.flatten(), dtype=dtype)
    return flat.reshape(len(col), -1)


def binary_matrix(col: pa.Array | pa.ChunkedArray, dtype=np.float64) -> np.ndarray:
    """Fixed-width binary-blob column → (n, dim) numpy matrix straight off
    the Arrow data buffer — replaces the ``np.frombuffer(b"".join(
    to_pylist()))`` idiom, which materialized one Python bytes object per
    row plus a full concat copy. Blobs must all have the same byte width
    (the vector-as-blob join carrier guarantees it). Zero-copy when the
    segments are contiguous in the buffer (the common case after Arrow's
    take/combine_chunks re-materializes values in order); one vectorized
    gather otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if pa.types.is_large_binary(col.type):
        off_dtype = np.int64
    else:
        col = col.cast(pa.binary())
        off_dtype = np.int32
    raw = np.frombuffer(col.buffers()[1], dtype=off_dtype)
    o = col.offset
    starts = raw[o : o + n].astype(np.int64)
    ends = raw[o + 1 : o + 1 + n].astype(np.int64)
    widths = ends - starts
    w = int(widths[0])
    if w % np.dtype(dtype).itemsize or not (widths == w).all():
        raise ValueError("binary_matrix requires equal-width blobs")
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    if int(starts[0]) + n * w == int(ends[-1]) and (ends[:-1] == starts[1:]).all():
        flat = data[int(starts[0]) : int(ends[-1])]
    else:
        flat = data[(starts[:, None] + np.arange(w)).ravel()]
    return flat.view(dtype).reshape(n, -1)
