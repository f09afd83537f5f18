"""Guillotine atlas packing (functions/atlas_guillotine.py) — layout parity
with the reference algorithm (blackpawn lightmap tree, atlas.py:51-88 +
atlas_node.py:31-105). Pure Python — no Spark."""
import numpy as np

from py3dtilers_spark.functions.atlas_guillotine import (
    _pow2_at_least,
    downsample_pow2,
    pack_guillotine,
)


def test_pow2_seed_matches_reference_rule():
    assert _pow2_at_least(1) == 1
    assert _pow2_at_least(4) == 4       # exact power stays
    assert _pow2_at_least(4.1) == 8
    assert _pow2_at_least(5.657) == 8   # sqrt(32)


def test_single_perfect_fit():
    placed, size = pack_guillotine([("a", 4, 4)])
    assert placed == {"a": (0, 0)} and size == (4, 4)


def test_two_rects_hand_traced():
    """Two 4x4 rects: seed 8x8 fails (the 1-px gutter shrinks the second
    child to 3 wide), growth doubles WIDTH first (axis = it%2), and the
    second rect lands at x=5 — the gutter column x=4 stays empty. Traced
    by hand against the reference insert/grow rules."""
    placed, size = pack_guillotine([("a", 4, 4), ("b", 4, 4)])
    assert size == (16, 8)
    assert placed["a"] == (0, 0)
    assert placed["b"] == (5, 0)


def test_sort_is_area_desc_stable():
    """Bigger rect packs first regardless of input order; equal areas keep
    input order (reference: stable sorted(..., reverse=True))."""
    placed, _ = pack_guillotine([("small", 2, 2), ("big", 6, 6)])
    assert placed["big"] == (0, 0)
    p1, _ = pack_guillotine([("x", 3, 4), ("y", 4, 3), ("z", 2, 6)])
    p2, _ = pack_guillotine([("x", 3, 4), ("y", 4, 3), ("z", 2, 6)])
    assert p1 == p2  # deterministic


def _no_overlap(placed, sizes):
    boxes = [
        (placed[k][0], placed[k][1], placed[k][0] + w, placed[k][1] + h)
        for k, w, h in sizes
    ]
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            if a[0] < b[2] and b[0] < a[2] and a[1] < b[3] and b[1] < a[3]:
                return False
    return True


def test_randomized_invariants():
    """All rects placed, none overlap, all inside the atlas, atlas dims are
    the seed times pow2 growth factors — across many random instances."""
    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(1, 30))
        sizes = [
            (f"r{i}", int(rng.integers(1, 120)), int(rng.integers(1, 120)))
            for i in range(n)
        ]
        placed, (aw, ah) = pack_guillotine(sizes)
        assert set(placed) == {k for k, _, _ in sizes}
        assert _no_overlap(placed, sizes)
        for k, w, h in sizes:
            x, y = placed[k]
            assert 0 <= x and 0 <= y and x + w <= aw and y + h <= ah
        assert aw & (aw - 1) == 0 and ah & (ah - 1) == 0  # pow2 x pow2


def test_reference_twin_parity_randomized():
    """Functional transliteration of the reference's recursive insert/grow
    (written independently of the engine's iterative class) must produce
    the IDENTICAL layout on random instances — guards every quirk: split
    axis choice, +1 gutter, growth alternation, fresh-tree retries."""

    def twin_insert(node, w, h):
        # node = [l, t, r, b, kids, used]
        if node[4] is not None:
            return twin_insert(node[4][0], w, h) or twin_insert(node[4][1], w, h)
        if node[5]:
            return None
        rw, rh = node[2] - node[0], node[3] - node[1]
        if w > rw or h > rh:
            return None
        if w == rw and h == rh:
            node[5] = True
            return (node[0], node[1])
        if (rw - w) >= (rh - h):
            node[4] = ([node[0], node[1], node[0] + w, node[3], None, False],
                       [node[0] + w + 1, node[1], node[2], node[3], None, False])
        else:
            node[4] = ([node[0], node[1], node[2], node[1] + h, None, False],
                       [node[0], node[1] + h + 1, node[2], node[3], None, False])
        return twin_insert(node[4][0], w, h)

    def twin_pack(rects):
        order = sorted(rects, key=lambda r: r[1] * r[2], reverse=True)
        s = 1
        while s < (sum(r[1] * r[2] for r in rects) ** 0.5):
            s *= 2
        wdt = hgt = s
        it = 0
        while True:
            root = [0, 0, wdt, hgt, None, False]
            out = {}
            for key, w, h in order:
                pos = twin_insert(root, w, h)
                if pos is None:
                    if it % 2 == 0:
                        wdt *= 2
                    else:
                        hgt *= 2
                    it += 1
                    out = None
                    break
                out[key] = pos
            if out is not None:
                return out, (wdt, hgt)

    rng = np.random.default_rng(23)
    for trial in range(30):
        n = int(rng.integers(1, 25))
        sizes = [
            (f"r{i}", int(rng.integers(1, 100)), int(rng.integers(1, 100)))
            for i in range(n)
        ]
        assert pack_guillotine(sizes) == twin_pack(sizes)


def test_downsample_pow2_rule():
    assert downsample_pow2(1024, 512, 1) == (1024, 512)
    assert downsample_pow2(1024, 512, 2) == (512, 256)
    assert downsample_pow2(1000, 300, 2) == (512, 256)  # next pow2 >= 150


def test_rejects_non_positive_rects():
    import pytest

    from py3dtilers_spark.functions.atlas_guillotine import pack_guillotine

    with pytest.raises(ValueError, match="non-positive"):
        pack_guillotine([("a", 4, 4), ("b", 0, 3)])
    with pytest.raises(ValueError, match="non-positive"):
        pack_guillotine([("a", -2, 4)])
