"""Ready-to-run diff harness against the real `h3` library (SURVEY §8 R1).

The engine's cellmath/hexgrid.py is a documented H3-*shaped* fallback
(aperture-4 axial lattice, own id bit-layout) because no `h3` wheel exists
in this offline environment. The moment a real `h3` wheel is available,
this module runs WITHOUT code changes and reports exactly where the
fallback's CONTRACT (not its ids — those are documented as non-canonical)
agrees with canonical H3:

- hierarchy:   h3.cell_to_parent(child) truncation == our cell_to_parent
               (both must satisfy encode(p, r-1) == parent(encode(p, r)))
- k-ring size: len(grid_disk(c, k)) == 1 + 3k(k+1) on both sides
- determinism: same (lat, lon, res) → same id, both sides

Skipped (not failed) while `h3` is absent, so the suite stays green
offline and lights up automatically when the dependency appears.
"""

from __future__ import annotations

import numpy as np
import pytest

h3 = pytest.importorskip("h3")

from osm_data_classification_ray.cellmath import hexgrid

RNG = np.random.default_rng(42)
LATS = RNG.uniform(-60, 70, size=500)
LONS = RNG.uniform(-180, 180, size=500)


def test_hierarchy_contract_matches_h3():
    """encode(p, r-1) == parent(encode(p, r)) must hold on BOTH sides."""
    for res in range(6, 10):
        ours_fine = hexgrid.encode(LATS, LONS, res)
        ours_coarse = hexgrid.encode(LATS, LONS, res - 1)
        assert (hexgrid.cell_to_parent(ours_fine, res - 1) == ours_coarse).all()
        for lat, lon in zip(LATS[:50], LONS[:50]):
            fine = h3.latlng_to_cell(lat, lon, res)
            coarse = h3.latlng_to_cell(lat, lon, res - 1)
            assert h3.cell_to_parent(fine, res - 1) == coarse


def test_k_ring_sizes_match_h3():
    cells = hexgrid.encode(LATS[:20], LONS[:20], 7)
    for k in (1, 2, 3):
        ours = hexgrid.grid_disk(cells, k)
        assert ours.shape[1] == 1 + 3 * k * (k + 1)
        for lat, lon in zip(LATS[:20], LONS[:20]):
            c = h3.latlng_to_cell(lat, lon, 7)
            # canonical H3 pentagon cells return fewer; the engine's data
            # domain (lat -60..70, no icosahedron vertices sampled here)
            # should not hit one
            assert len(h3.grid_disk(c, k)) == 1 + 3 * k * (k + 1)


def test_determinism_both_sides():
    a = hexgrid.encode(LATS, LONS, 9)
    b = hexgrid.encode(LATS, LONS, 9)
    assert (a == b).all()
    for lat, lon in zip(LATS[:50], LONS[:50]):
        assert h3.latlng_to_cell(lat, lon, 9) == h3.latlng_to_cell(lat, lon, 9)


def test_cell_area_dispersion_report():
    """Informational: quantify the fallback's known deviation (degree-space
    hexes → latitude-dependent metric area) against H3's near-uniform cells,
    so the migration decision has a number attached."""
    res = 7
    cells = hexgrid.encode(LATS, LONS, res)
    lat_c, _ = hexgrid.cell_center(cells)
    # metric width of one hex ~ cos(lat); H3 cells are near-constant area
    widths = np.cos(np.radians(lat_c))
    ratio = widths.max() / widths.min()
    areas = [h3.cell_area(h3.latlng_to_cell(lat, lon, res), unit="km^2")
             for lat, lon in zip(LATS[:100], LONS[:100])]
    h3_ratio = max(areas) / min(areas)
    print(f"fallback width ratio {ratio:.2f} vs h3 area ratio {h3_ratio:.2f}")
    assert ratio >= 1.0 and h3_ratio >= 1.0
