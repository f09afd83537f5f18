"""Guillotine-tree atlas packing — layout parity with the reference.

The reference packs per-tile texture atlases with the public "lightmap
packing" binary-tree algorithm (blackpawn.com/texts/lightmaps), driven as:
sort by pixel area descending (stable), seed a square atlas at the first
power of two >= sqrt(total area), insert each rect into the tree (split
the free rectangle along the axis with MORE leftover, first-child gets the
rect, 1-px gutter between children), and on any failure GROW the atlas —
alternately doubling width then height — and re-insert everything into a
fresh tree (/root/reference/py3dtilers/Texture/atlas.py:51-88,
atlas_node.py:31-105, re-expressed from the documented behavior).

This module reproduces that LAYOUT exactly (same sort, same split rule,
same +1 gutter, same growth schedule) without PIL: it places integer
rectangles, which is all the downstream UV remap needs. It exists to close
the G10 parity gap — the round-4 engine shipped a shelf-FFD stand-in with
the same contract but different layouts (functions/imaging.py:178, kept as
the in-job packer this round because imaging.py is fingerprint-frozen
while the round-5 scaling chain certifies; swapping the sink over is a
one-line change at plans/tiler_job.py's atlas call).

Scale shape: packing is PER TILE (tens-to-hundreds of rects), run inside
the per-tile encode task — driver never sees a rect; the algorithm's
O(n^2) worst case is bounded by the per-tile texture count, not the
dataset.
"""
from __future__ import annotations


def _pow2_at_least(nb: float) -> int:
    """Smallest power of two >= nb (the reference's multipleOf2)."""
    i = 1
    while i < nb:
        i *= 2
    return i


class _Node:
    __slots__ = ("left", "top", "right", "bottom", "kids", "used")

    def __init__(self, left: int, top: int, right: int, bottom: int):
        self.left, self.top, self.right, self.bottom = left, top, right, bottom
        self.kids = None
        self.used = False

    def insert(self, w: int, h: int):
        """Place a w x h rect; returns (left, top) or None. Mirrors the
        reference Node.insert: leaf-with-image fails, perfect fit places,
        split along the axis with the LARGER leftover (dw >= dh -> vertical
        cut), children separated by a 1-px gutter, rect goes to child 0."""
        if self.kids is not None:
            pos = self.kids[0].insert(w, h)
            if pos is not None:
                return pos
            return self.kids[1].insert(w, h)
        if self.used:
            return None
        rw = self.right - self.left
        rh = self.bottom - self.top
        if w > rw or h > rh:
            return None
        if w == rw and h == rh:
            self.used = True
            return (self.left, self.top)
        dw = rw - w
        dh = rh - h
        if dw >= dh:
            self.kids = (
                _Node(self.left, self.top, self.left + w, self.bottom),
                _Node(self.left + w + 1, self.top, self.right, self.bottom),
            )
        else:
            self.kids = (
                _Node(self.left, self.top, self.right, self.top + h),
                _Node(self.left, self.top + h + 1, self.right, self.bottom),
            )
        return self.kids[0].insert(w, h)


def pack_guillotine(rects: list) -> tuple:
    """Pack [(key, w, h), ...] with the reference's atlas algorithm.

    Returns ({key: (left, top)}, (atlas_w, atlas_h)). Iteration order of
    equal-area rects is preserved (stable sort), matching the reference's
    sorted(dict.items(), key=area, reverse=True).

    Rect dimensions must be >= 1 (the reference operates on PIL images, so
    sizes are always positive); a zero/negative size would otherwise be
    placed degenerately or spin the grow loop — fail loudly instead.
    """
    for key, w, h in rects:
        if int(w) < 1 or int(h) < 1:
            raise ValueError(f"pack_guillotine: non-positive rect {key}: {w}x{h}")
    order = sorted(rects, key=lambda r: r[1] * r[2], reverse=True)
    total = sum(r[1] * r[2] for r in rects)
    size = _pow2_at_least(total ** 0.5)
    width = height = size
    it = 0
    while True:
        root = _Node(0, 0, width, height)
        placed = {}
        ok = True
        for key, w, h in order:
            pos = root.insert(int(w), int(h))
            if pos is None:
                # growth schedule: axis = it % 2; 0 doubles width, 1 height
                if it % 2 == 0:
                    width *= 2
                else:
                    height *= 2
                it += 1
                ok = False
                break
            placed[key] = pos
        if ok:
            return placed, (width, height)


def downsample_pow2(width: int, height: int, factor: int) -> tuple:
    """The reference's downsample target size: next power of two at or
    above dim/factor via (n - 1).bit_length() (atlas_node.py:124-126)."""
    if factor == 1:
        return (width, height)
    return (
        1 << (int(width / factor) - 1).bit_length(),
        1 << (int(height / factor) - 1).bit_length(),
    )
