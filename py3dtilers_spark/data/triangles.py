"""Triangle overlay fixtures for the general-ring PIP path (J1 general).

The round-1 engine verified only the rectangle fast path of the reference's
central spatial join (group.py:161-199); these triangles exercise the real
ray-cast + Morton-cell-prefilter path with an exact DuckDB oracle: a point is
strictly inside a CCW triangle iff all three edge cross-products are > 0 — a
pure sign test DuckDB evaluates on the same double literals.

Vertex doubles are computed ONCE here (import time) and shared verbatim by
both sides: the Spark query gets numpy rings, the oracle SQL gets repr()
literals (repr round-trips doubles exactly, so both engines test identical
geometry). 12 small triangles tile the feature extent; 4 large ones overlap
them so first-match-wins (min polygon_id) is exercised.
"""
from __future__ import annotations

import math

import numpy as np

X0, Y0 = 1843000.0, 5173000.0


def _tri(cx: float, cy: float, r: float, rot: float):
    pts = []
    for k in range(3):  # CCW in standard orientation
        a = rot + k * (2.0 * math.pi / 3.0)
        pts.extend((cx + r * math.cos(a), cy + r * math.sin(a)))
    return tuple(pts)


def _make():
    tris = []
    for i in range(12):
        tris.append(
            _tri(
                X0 + (i % 4) * 2500.0 + 1250.0,
                Y0 + (i // 4) * 3300.0 + 1650.0,
                900.0 + 150.0 * (i % 3),
                0.7 * i + 0.3,
            )
        )
    for j in range(4):
        tris.append(
            _tri(
                X0 + 2500.0 + (j % 2) * 5000.0,
                Y0 + 3300.0 + (j // 2) * 3300.0,
                2600.0,
                1.1 * j + 0.5,
            )
        )
    return tris


TRIANGLES = _make()  # (ax, ay, bx, by, cx, cy) per polygon_id


def triangle_rings() -> list[np.ndarray]:
    return [
        np.array([[ax, ay], [bx, by], [cx, cy]], dtype=np.float64)
        for ax, ay, bx, by, cx, cy in TRIANGLES
    ]


def triangles_cte() -> str:
    rows = ",\n    ".join(
        "(%d, %r, %r, %r, %r, %r, %r)" % (i, *t) for i, t in enumerate(TRIANGLES)
    )
    return (
        "tri AS (SELECT * FROM (VALUES\n    "
        + rows
        + ") AS t(polygon_id, ax, ay, bx, by, cx, cy))"
    )
