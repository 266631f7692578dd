"""Spatial join: point-in-polygon after a salted, skew-aware hash shuffle on
cell id (SURVEY.md J3; BASELINE.json north_rule).

Shape:
1. driver builds a ``PolygonIndex`` from the small admin_polygons table —
   per polygon: flattened edge arrays + a cover set of res-5 hex cells
   (conservative bbox cover, ``hexgrid.cells_in_bbox``); candidates per
   cell are pre-sorted by (level desc, admin_id asc) = the frozen
   "finest admin wins" semi-join rule. ``ray.put`` once → every worker
   reads one object-store copy (no per-batch reship).
2. a cheap pre-pass histogram (``groupby(h3_r5).count()``) finds hot cells;
   ``salt_map[cell] = S`` splits them (salt = url-hash % S). Cold cells get
   salt 0 — the polygon side needs no replication because it is broadcast.
3. ``repartition(P, keys=["h3_r5", "salt"], sort=True)`` (hash shuffle) →
   ``map_batches(PIPBlock, batch_size=None)``: each block is a run of
   (cell, salt) groups; the kernel slices per distinct cell and tests only
   that cell's candidate polygons — vectorized numpy, no per-row Python.

Output: PAGE_ADMIN rows (url, admin_id, h3_r7) — pages inside no admin
polygon are dropped (semi-join semantics, row counts audited).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cellmath import hexgrid
from ..cellmath.pip import PolygonEdges, points_in_polygon
from ..fixtures.gen import hash_u64

PIP_RES = 5  # cover/shuffle resolution (SURVEY.md §5.3)


#: max cover cells per polygon; large polygons get coarser cover resolutions
COVER_CAP = 1024


class PolygonIndex:
    """Adaptive multi-res cover index: each polygon is covered at the
    FINEST res (≤ PIP_RES) whose bbox cover stays under ``cover_cap``
    cells, so a continent-sized polygon costs ~cover_cap coarse cells
    instead of ~10⁶ fine ones (bounded index size = bounded broadcast +
    O(1) lookups at any polygon scale). Lookup walks the point cell's
    parent chain (pure arithmetic) through the populated resolutions."""

    def __init__(self, admin_table: pa.Table, cover_cap: int = COVER_CAP):
        self.admin_ids = np.asarray(admin_table["admin_id"].to_pylist(), dtype=np.int64)
        self.levels = np.asarray(admin_table["level"].to_pylist(), dtype=np.int64)
        self.edges: list[PolygonEdges] = []
        by_res: dict[int, dict[int, list[int]]] = {}
        rings_col = admin_table["rings"].to_pylist()
        bbox_col = admin_table["bbox"].to_pylist()
        for i, (rings, bbox) in enumerate(zip(rings_col, bbox_col)):
            arrs = [np.array([[p["lat"], p["lon"]] for p in ring], dtype=np.float64) for ring in rings]
            self.edges.append(PolygonEdges(arrs))
            for res in range(PIP_RES, -1, -1):
                cover = hexgrid.cells_in_bbox(
                    bbox["minlat"], bbox["minlon"], bbox["maxlat"], bbox["maxlon"], res
                )
                if len(cover) <= cover_cap or res == 0:
                    d = by_res.setdefault(res, {})
                    for c in cover:
                        d.setdefault(int(c), []).append(i)
                    break
        # frozen candidate order: level desc, admin_id asc (applied after merge)
        self.by_res: dict[int, dict[int, np.ndarray]] = {
            res: {c: np.array(v, dtype=np.int64) for c, v in d.items()} for res, d in by_res.items()
        }
        self.resolutions = sorted(self.by_res, reverse=True)

    def candidates(self, cell_r5: int) -> np.ndarray | None:
        """Merged candidate polygon indices for one res-5 point cell, in the
        frozen (level desc, admin_id asc) order; None if no polygon near."""
        found: list[np.ndarray] = []
        cell = np.array([cell_r5], dtype=np.uint64)
        cur = PIP_RES
        for res in self.resolutions:
            if res < cur:
                cell = hexgrid.cell_to_parent(cell, res)
                cur = res
            hit = self.by_res[res].get(int(cell[0]))
            if hit is not None:
                found.append(hit)
        if not found:
            return None
        arr = np.unique(np.concatenate(found))
        order = np.lexsort((self.admin_ids[arr], -self.levels[arr]))
        return arr[order]


def compute_salt_map(cell_counts: dict[int, int], hot_threshold: int, max_salt: int = 16) -> dict[int, int]:
    """cells with > hot_threshold rows get salt fan-out ceil(count/threshold)."""
    out = {}
    for cell, cnt in cell_counts.items():
        if cnt > hot_threshold:
            out[cell] = int(min(max_salt, -(-cnt // hot_threshold)))
    return out


def add_salt(batch: pa.Table, salt_map: dict[int, int]) -> pa.Table:
    """Deterministic per-row salt: url-hash % S for hot cells, else 0.

    Salt rule v2 (round-4): the url hash is the repo's vectorized FNV-1a
    kernel straight off the Arrow string buffers — v1 used a per-row Python
    ``zlib.crc32`` loop, which ran exactly on the skewed batches the salt
    exists for. Salt values only ROUTE rows (PIPBlock re-groups by cell
    inside each block), so changing the rule cannot change any output —
    pinned by tests/test_pipelines.py::test_salted_pip_join_identical."""
    cells = np.asarray(batch[f"h3_r{PIP_RES}"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    salt = np.zeros(len(cells), dtype=np.uint8)
    if salt_map:
        # vectorize over the (few) hot cells present in this batch
        from ..functions.strhash import fnv1a_arrow

        h = None
        for cell, s in salt_map.items():
            mask = cells == np.uint64(cell)
            if mask.any():
                if h is None:
                    h = fnv1a_arrow(batch["url"])
                salt[mask] = (h[mask] % np.uint64(s)).astype(np.uint8)
    return batch.append_column("salt", pa.array(salt, type=pa.uint8()))


class PIPBlock:
    """Actor-pool callable: polygon index loaded ONCE per actor (S3 state).

    Construct with the ``ray.put`` object ref of a PolygonIndex (or the
    index itself in local/test use).
    """

    def __init__(self, index_ref):
        import ray

        self.index: PolygonIndex = (
            ray.get(index_ref) if not isinstance(index_ref, PolygonIndex) else index_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        cells = np.asarray(batch[f"h3_r{PIP_RES}"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        lat = np.asarray(batch["lat"].to_numpy(zero_copy_only=False))
        lon = np.asarray(batch["lon"].to_numpy(zero_copy_only=False))
        admin_out = np.full(len(cells), -1, dtype=np.int64)
        for cell in np.unique(cells):
            cand = idx.candidates(int(cell))
            if cand is None:
                continue
            rows = np.nonzero(cells == cell)[0]
            unassigned = rows
            for pi in cand:
                if unassigned.size == 0:
                    break
                hit = points_in_polygon(lat[unassigned], lon[unassigned], idx.edges[pi])
                admin_out[unassigned[hit]] = idx.admin_ids[pi]
                unassigned = unassigned[~hit]
        keep = pa.array(admin_out >= 0)
        sub = batch.filter(keep)
        return pa.table(
            {
                "url": sub["url"],
                "admin_id": pa.array(admin_out[admin_out >= 0], type=pa.int64()),
                "h3_r7": sub["h3_r7"].cast(pa.uint64()),
            }
        )
