"""Hann tile windows — the 9 positional variants of the reference's
edge-artifact suppression, re-derived from the published semantics.

Reference behavior (studied, not copied — /root/reference/geo_inference/
geo_dask.py:52-182 and tests/test_geo_dask.py:65-121):

* base window: 2-D separable periodic Hann, ``w[i] = 0.5 - 0.5*cos(2*pi*i/P)``
  (scipy ``hann(M=P, sym=False)`` equivalent), outer product.
* edge variants: the center row/col is tiled outward so the window is flat
  (= center value) on the side touching the raster boundary.
* corner variants: additionally a ``step x step`` block of ones on the
  outermost corner, so boundary pixels keep full weight.
* position classification: the patch grid's LAST row/col of patches is
  dead (the reference zeroes patches whose input lacks right/bottom ghost
  pixels, geo_dask.py:193-199), so index ``n-2`` is treated as the edge —
  the reference's ``>= num_chunks - 2`` conditions (geo_dask.py:58-182),
  replicated here in the same order.
"""

from __future__ import annotations

import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window: 0.5 - 0.5*cos(2*pi*k/n), k = 0..n-1."""
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)


def base_window(patch: int) -> np.ndarray:
    w = hann_periodic(patch)
    return w[:, None] * w[None, :]


def _flat_top(w: np.ndarray, step: int) -> np.ndarray:
    return np.vstack([np.tile(w[step:step + 1, :], (step, 1)), w[step:, :]])


def _flat_bottom(w: np.ndarray, step: int) -> np.ndarray:
    return np.vstack([w[:step, :], np.tile(w[step:step + 1, :], (step, 1))])


def _flat_left(w: np.ndarray, step: int) -> np.ndarray:
    return np.hstack([np.tile(w[:, step:step + 1], (1, step)), w[:, step:]])


def _flat_right(w: np.ndarray, step: int) -> np.ndarray:
    return np.hstack([w[:, :step], np.tile(w[:, step:step + 1], (1, step))])


def tile_window(pos: str, patch: int) -> np.ndarray:
    """Window variant for a patch position.

    pos in {'ul','u','ur','l','c','r','bl','b','br'} (u = touching the top
    raster edge, l = left, etc.).
    """
    step = patch >> 1
    w = base_window(patch)
    if pos == "c":
        return w
    u, b = _flat_top(w, step), _flat_bottom(w, step)
    lf, r = _flat_left(w, step), _flat_right(w, step)
    ones = np.ones((step, step))
    if pos == "u":
        return u
    if pos == "b":
        return b
    if pos == "l":
        return lf
    if pos == "r":
        return r
    if pos == "ul":
        return np.block([[ones, u[:step, step:]],
                         [lf[step:, :step], lf[step:, step:]]])
    if pos == "ur":
        return np.block([[u[:step, :step], ones],
                         [r[step:, :step], r[step:, step:]]])
    if pos == "bl":
        return np.block([[lf[:step, :step], lf[:step, step:]],
                         [ones, b[step:, step:]]])
    if pos == "br":
        return np.block([[r[:step, :step], r[:step, step:]],
                         [b[step:, :step], ones]])
    raise ValueError(pos)


def classify_position(iy: int, ix: int, ny: int, nx: int) -> str:
    """Patch-grid location -> window position, replicating the reference's
    condition order (geo_dask.py:58-182; note the asymmetric ``>= n-2``:
    the dead last row/col makes index n-2 the effective edge)."""
    if ix >= nx - 2 and iy == 0:
        return "ur"
    if ix >= nx - 2 and 0 < iy < ny - 2:
        return "r"
    if ix >= nx - 2 and iy >= ny - 2:
        return "br"
    if iy >= ny - 2 and 0 < ix < nx - 2:
        return "b"
    if iy >= ny - 2 and ix == 0:
        return "bl"
    if iy == 0 and ix == 0:
        return "ul"
    if ix == 0 and 0 < iy < ny:
        return "l"
    if 0 < ix < nx - 2 and iy == 0:
        return "u"
    return "c"


def window_for_location(iy: int, ix: int, ny: int, nx: int,
                        patch: int) -> np.ndarray:
    return tile_window(classify_position(iy, ix, ny, nx), patch)


def all_windows(patch: int) -> dict[str, np.ndarray]:
    return {p: tile_window(p, patch)
            for p in ("ul", "u", "ur", "l", "c", "r", "bl", "b", "br")}
