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
