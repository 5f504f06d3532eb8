"""Geocode lookup (J3) — the graft analog of the reference's ArcGIS
forward/reverse geocoding (helper.py:366-387, used by 536 spiders:
``extract_location_from_coordinates(lon, lat) -> (zipcode, city,
address)``).

No network exists here (and at 100 TB a per-row HTTP geocode would be
the bottleneck anyway), so the operator is the scale-correct shape the
reference's call should become: a **broadcast lookup join** — the
geocode table (grid cell → zipcode/city) ships to the object store
once via ``ray.put`` and every ``map_batches`` task resolves
coordinates vectorized against it. A real deployment swaps
``build_geocode_table`` for a loaded geocode shard; the pipeline shape
does not change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GRID_LON_CELLS = 360


def build_geocode_table(nation_tbl: pa.Table) -> dict[int, tuple[str, str]]:
    """Deterministic geocode fixture from the nation table: cell id →
    (zipcode, city). 25 world cells, zipcodes spaced so no two collide."""
    keys = nation_tbl["n_nationkey"].to_pylist()
    names = nation_tbl["n_name"].to_pylist()
    return {int(k): (str(10000 + 37 * int(k)), str(n)) for k, n in zip(keys, names)}


def cell_of(lat: np.ndarray, lon: np.ndarray, num_cells: int) -> np.ndarray:
    """(lat, lon) → grid cell id: 1°×1° cells scanned row-major, folded
    onto the lookup table size."""
    la = np.floor(lat).astype(np.int64)
    lo = np.floor(lon).astype(np.int64)
    return (la * GRID_LON_CELLS + lo) % num_cells


def reverse_geocode_batch(batch: pa.Table, lookup: dict[int, tuple[str, str]],
                          lat_col: str = "latitude",
                          lon_col: str = "longitude") -> pa.Table:
    """map_batches body: append (zipcode, city) resolved from the
    broadcast lookup — helper.py:379-387 semantics, vectorized."""
    lat = np.asarray(batch[lat_col].to_pylist(), dtype=np.float64)
    lon = np.asarray(batch[lon_col].to_pylist(), dtype=np.float64)
    cells = cell_of(lat, lon, len(lookup))
    zips = [lookup[int(c)][0] if int(c) in lookup else None for c in cells]
    cities = [lookup[int(c)][1] if int(c) in lookup else None for c in cells]
    out = batch.append_column("zipcode", pa.array(zips, pa.string()))
    return out.append_column("city", pa.array(cities, pa.string()))
