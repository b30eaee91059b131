"""Wide (8-ary) BVH collapse for the in-kernel block walk (ops/walk.py).

The binary SAH tree (accel/bvh.py, semantics of the reference's bvh.ts) is
collapsed into an 8-wide hierarchy whose leaves are subtree-aligned
clusters of <= LEAF_SLOTS triangles. The device tables are laid out for
the walk kernel's vector shapes (rays on sublanes, children/triangles on
lanes):

* ``meta`` (Nn, 8) int32 — child slot encoding: > 0 interior child (wide
  node id), < 0 leaf (group ``g = -m - 1``), == 0 empty (its box is NaN so
  no ray ever enters; node 0 is the root and is never anyone's child).
* ``boxes`` (Nn * 64, 8) f32 — per (node, ray-direction octant) an 8-row
  slab at ``(n*8 + oct) * 8``: row k = the k-th child IN PUSH ORDER, its
  bounds on lanes 0..5 (minx..maxz); empty-child rows hold NaN. Push order
  is far-to-near along the octant's sign vector so the LIFO stack pops
  nearest-first (octant bit a = 1 when the block's majority d[a] < 0).
  Replicating the slab per octant keeps the kernel's per-child entry
  distances ctn[k] directly in push order — the scalar core then does ONE
  table read per child instead of three (measured scalar-read-bound).
* ``order`` (Nn, 64) int32 — the child META at each push slot:
  ``order[n, oct*8 + k]`` is the k-th pushed child's meta value (same
  encoding as ``meta``; 0 = empty slot).
* ``tris`` (Ng * group_rows(sub), lanes) f32 with
  ``lanes = max(leaf_slots, 128)`` — per leaf group a slab covering
  ``leaf_slots`` triangle slots on lanes: rows 0-8 = [v0, e1, e2]
  components, row 9 = the GLOBAL triangle index (exact in f32 below 2^24;
  -1 on padding slots), rows 16..16+sub = the sub-cluster AABBs (sub c at
  row 16 + c, 8-aligned base, bounds on lanes 0..5) gating
  Moller-Trumbore per
  (leaf_slots/sub)-tri sub-cluster. SUB=16 (8-slot sub-clusters) measured
  best on the 103k-tri sweep (halves MT tests/ray vs SUB=8 for ~5% more
  gate work; the packed-bitmask gates make sub granularity nearly free).

Reference counterpart: the per-thread binary stack walk of pt.wgsl:248-296.
The wide collapse and slab layout have no reference equivalent — they are
what makes an ordered hierarchical traversal expressible in TPU vector
units (a per-ray binary walk measures ~0.09 Mrays/s on TPU; see
ops/intersect.py::closest_hit_bvh).
"""

from __future__ import annotations

import dataclasses

import numpy as np

WIDTH = 8
OCTANTS = 8  # per-ray-direction-sign slab replicas (always 8: 3 sign bits)
LEAF_SLOTS = 128  # triangle slots per leaf group (one slab of lanes)
SUB = 16  # sub-clusters per leaf group, the MT gating unit
MAX_STACK = 512  # walk-kernel DFS stack entries (ops/walk.py scratch)
# pops=2: two stack entries per loop iteration under ONE scalar<->vector
# sync point. Measured (round 3, within one process each): glass 11.8k
# tris / 48 nodes: 58.7 ms vs 84.9 at pops=1 (+42%); 103k tris / 356
# nodes: two later same-process A/Bs on real in-pipeline bounce rays both
# ranked pops=2 >= pops=1, so pops=2 is now unconditional. pops>=4
# REJECTED by measurement on both scene classes (0.9-2.9 Mrays/s vs
# 2.0-4.6 — the fused-sync win is eaten by the longer serialized body).


def pops_for_tree(num_wide_nodes: int) -> int:
    """Stack entries the walk kernel pops per loop iteration — shared by
    the build-time stack-depth guard and the runtime kernel selection
    (ops/intersect.py) so the guarantee matches the use. Unconditionally 2
    since the round-3 bounce-ray A/Bs (see module comment); the node-count
    parameter stays so a future size-dependent rule keeps both sites in
    sync."""
    return 2


class WideBVHDepthError(ValueError):
    """Wide tree too deep for the walk kernel's DFS stack bound."""


def _check_stack_depth(wmeta: np.ndarray) -> None:
    """The walk kernel's SMEM stack holds MAX_STACK entries; a K-pop DFS
    (K = pops_for_tree at this node count, matching the runtime selection
    in ops/intersect.py) leaves at most (WIDTH-1)*K lingering entries per
    interior level plus the WIDTH*K pushes in flight, so the wide-tree
    depth bounds the worst case. Fixpoint sweep: each pass propagates
    child depths one level (tree-depth passes, vectorized)."""
    nn = wmeta.shape[0]
    width = wmeta.shape[1]
    kids = np.clip(wmeta, 0, None)  # (nn, width); 0 is never a real child
    interior = wmeta > 0
    depth = np.ones(nn, np.int64)
    max_need = MAX_STACK // (width - 1) + 2
    for _ in range(max_need + 1):
        kd = np.where(interior, depth[kids], 0).max(axis=1)
        new = np.maximum(depth, 1 + np.where(kd > 0, kd, 0))
        if (new == depth).all():
            break
        depth = new
    pops = pops_for_tree(nn)
    need = pops * (int(depth[0]) * (width - 1) + width)
    if need > MAX_STACK:
        raise WideBVHDepthError(
            f"wide-BVH depth {int(depth[0])} needs a {need}-entry DFS "
            f"stack > MAX_STACK={MAX_STACK} at pops={pops}; this tree "
            "is pathologically deep (degenerate SAH spine) — "
            "pack_device_scene catches this and falls back to the pair "
            "dispatch (ops/pairs.py)"
        )


def group_rows(sub: int) -> int:
    # Rows 0-9 (components + index) padded to 16, then ``sub`` sub-box
    # rows padded to a sublane tile: the sub-box slab must start at an
    # 8-ALIGNED row (Mosaic requires provable sublane alignment for the
    # walk kernel's dynamic (sub, 8) load).
    return 16 + -(-sub // 8) * 8


@dataclasses.dataclass
class WideBVH:
    meta: np.ndarray  # (Nn, width) int32
    order: np.ndarray  # (Nn, 8*width) int32: per-octant ordered child metas
    boxes: np.ndarray  # (Nn * 8*width, 8) f32: per-octant ordered slabs
    tris: np.ndarray  # (Ng * group_rows, max(leaf_slots, 128)) f32
    leaf_slots: int = LEAF_SLOTS
    sub: int = SUB
    width: int = WIDTH

    @property
    def num_nodes(self) -> int:
        return int(self.meta.shape[0])

    @property
    def num_groups(self) -> int:
        return int(self.tris.shape[0]) // group_rows(self.sub)


def _subtree_counts(meta: np.ndarray):
    from wgpu_path_tracing_tpu.accel.bvh import subtree_ranges

    lo, hi = subtree_ranges(meta)
    return lo, hi


def build_wide_bvh(
    aabb_min: np.ndarray,
    aabb_max: np.ndarray,
    meta: np.ndarray,
    tri_isect: np.ndarray,
    leaf_slots: int = LEAF_SLOTS,
    sub: int = SUB,
    prefer_native: bool = True,
    pack: str = "ffd",
    width: int = WIDTH,
) -> WideBVH:
    """Collapse the binary BVH into the walk kernel's wide tables.

    ``width`` is the interior fan-out (children per wide node): 8 is
    production (the C++ twin implements it); 16 halves interior visits
    at 2x the per-visit slab work and 2x the scalar pushes — NumPy-only
    experimental path for on-chip A/Bs (TODO.md 16-ary item).

    ``tri_isect``: (T, 9) [v0, e1, e2] rows in BVH (DFS) triangle order —
    leaf groups copy them into lane-major slabs. Uses the native C++
    collapse (accel/cbvh/wide_collapse.cpp, bit-identical by test) when
    the toolchain is available, the NumPy path below otherwise.

    ``pack`` selects how small sibling subtrees share leaf groups:
    "none" = one subtree per group (round-2 behavior; 59.8% mean fill on
    the 103k Cornell), "ffd" = first-fit-decreasing bin-pack on subtree
    boundaries (94.9/128 mean fill), "slice" = concatenate smalls in DFS
    order and cut at exact leaf_slots boundaries (~100% fill, boxes from
    the sliced tris themselves). Incoherent bounce unions visit nearly
    every group, so group count is directly the dominant traversal cost.
    """
    t = int(tri_isect.shape[0])
    grows = group_rows(sub)
    # The C++ twin implements "none" and the production "ffd" (bit-identical
    # by tests/test_walk.py); "slice" (non-default, measured a wash) stays
    # NumPy-only.
    if (t > 0 and prefer_native and pack in ("none", "ffd")
            and width == WIDTH):
        from wgpu_path_tracing_tpu.accel.native import (
            build_wide_native,
            native_available,
        )

        if native_available():
            wm, wo, wb, wt = build_wide_native(
                aabb_min, aabb_max, meta, tri_isect, leaf_slots, sub, grows,
                pack=pack,
            )
            _check_stack_depth(wm)
            return WideBVH(meta=wm, order=wo, boxes=wb, tris=wt,
                           leaf_slots=leaf_slots, sub=sub)
    if t == 0:
        # Degenerate: one node, all children empty.
        m = np.zeros((1, width), np.int32)
        b = np.full((OCTANTS * width, 8), np.nan, np.float32)
        tris = np.zeros((grows, max(leaf_slots, 128)), np.float32)
        tris[9, :] = -1.0
        order = np.zeros((1, OCTANTS * width), np.int32)
        return WideBVH(meta=m, order=order, boxes=b, tris=tris,
                       leaf_slots=leaf_slots, sub=sub, width=width)

    lo, hi = _subtree_counts(meta)
    is_leaf = meta[:, 3] > 0

    wide_meta: list[np.ndarray] = []
    wide_boxes: list[np.ndarray] = []
    # Per leaf group: list of (lo, count) tri ranges (a group may pack
    # several small sibling subtrees — see _pack_bins).
    groups: list[list[tuple[int, int]]] = []

    def count(b: int) -> int:
        return int(hi[b] - lo[b])

    def emit_group(glo: int, gcnt: int) -> int:
        gid = len(groups)
        groups.append([(glo, gcnt)])
        return -(gid + 1)

    def emit_group_multi(members: list[int]) -> int:
        gid = len(groups)
        groups.append(
            [(int(lo[e]), count(e)) for e in sorted(members, key=lambda e: lo[e])]
        )
        return -(gid + 1)

    def emit_group_ranges(ranges: list[tuple[int, int]]) -> int:
        gid = len(groups)
        groups.append(list(ranges))
        return -(gid + 1)

    def alloc_node() -> int:
        wide_meta.append(np.zeros(width, np.int32))
        wide_boxes.append(np.full((width, 6), np.nan, np.float32))
        return len(wide_meta) - 1

    def _pack_bins(smalls: list[int]) -> list[list[int]]:
        """First-fit-decreasing bin-pack of small subtrees into
        leaf_slots-capacity groups. Input order breaks count ties, so the
        result is deterministic (the C++ twin mirrors this exactly).

        Without packing every small sibling became its own group and the
        103k-tri Cornell measured 59.8% mean leaf fill (1344 groups vs the
        804 a perfect pack would need); incoherent bounce-ray unions visit
        nearly every group, so group count is directly proportional to the
        dominant traversal cost."""
        order = sorted(range(len(smalls)), key=lambda i: (-count(smalls[i]), i))
        bins: list[list[int]] = []
        room: list[int] = []
        for i in order:
            e = smalls[i]
            c = count(e)
            placed = False
            for k in range(len(bins)):
                if room[k] >= c:
                    bins[k].append(e)
                    room[k] -= c
                    placed = True
                    break
            if not placed:
                bins.append([e])
                room.append(leaf_slots - c)
        return bins

    def build(b: int) -> int:
        """Wide node for binary subtree b (count(b) may exceed leaf_slots,
        or b may be an oversized binary leaf)."""
        nid = alloc_node()
        if is_leaf[b] and count(b) > leaf_slots:
            # Oversized binary leaf: chunk it. Chunks share b's box.
            chunks = [
                (base, min(leaf_slots, int(hi[b]) - base))
                for base in range(int(lo[b]), int(hi[b]), leaf_slots)
            ]
            slots: list[tuple[int, np.ndarray]] = []
            for base, cnt in chunks[: width - 1]:
                slots.append((emit_group(base, cnt), _box_of(b)))
            rest = chunks[width - 1 :]
            if len(rest) == 1:
                slots.append((emit_group(*rest[0]), _box_of(b)))
            elif rest:
                # Too many chunks for one node: chain via a pseudo subtree.
                slots.append((build_chunks(rest, b), _box_of(b)))
            _fill(nid, slots)
            return nid

        # Collect sub-roots by repeatedly expanding the largest
        # still-oversized interior element; an expansion is kept while the
        # packed slot demand (oversized elems + bin-packed smalls) fits
        # the node. Packing frees slots, so nodes expand deeper AND
        # groups pack fuller than the one-subtree-per-slot rule.
        elems = [b]

        def slot_demand(es: list[int]) -> int:
            smalls = [e for e in es if count(e) <= leaf_slots]
            overs = len(es) - len(smalls)
            if pack == "slice":
                total = sum(count(e) for e in smalls)
                return overs + -(-total // leaf_slots)
            if pack == "ffd":
                return overs + len(_pack_bins(smalls))
            return overs + len(smalls)

        while True:
            cand = [
                e for e in elems if not is_leaf[e] and count(e) > leaf_slots
            ]
            if not cand:
                break
            e = max(cand, key=count)
            trial = list(elems)
            i = trial.index(e)
            trial[i : i + 1] = [int(meta[e, 0]), int(meta[e, 1])]
            if slot_demand(trial) > width:
                break
            elems = trial

        smalls = [e for e in elems if count(e) <= leaf_slots]
        slots = []
        if pack == "slice" and smalls:
            # Concatenate the smalls' tri ranges in DFS order and cut at
            # exact leaf_slots boundaries (subtrees split mid-range; group
            # boxes computed from the sliced tris below).
            runs = [(int(lo[e]), count(e)) for e in
                    sorted(smalls, key=lambda e: lo[e])]
            cur: list[tuple[int, int]] = []
            room = leaf_slots
            for glo, gcnt in runs:
                while gcnt > 0:
                    take = min(room, gcnt)
                    cur.append((glo, take))
                    glo += take
                    gcnt -= take
                    room -= take
                    if room == 0:
                        slots.append(
                            (emit_group_ranges(cur), _box_of_ranges(cur))
                        )
                        cur, room = [], leaf_slots
            if cur:
                slots.append((emit_group_ranges(cur), _box_of_ranges(cur)))
        elif pack == "ffd":
            for members in _pack_bins(smalls):
                box = _union_box(members)
                if len(members) == 1:
                    slots.append(
                        (emit_group(int(lo[members[0]]), count(members[0])),
                         box)
                    )
                else:
                    slots.append((emit_group_multi(members), box))
        else:
            # pack="none": one subtree per slot, INTERLEAVED in elems
            # order — the C++ twin's pack=0 branch emits groups and
            # recursions in a single pass over elems, and group/node ids
            # are allocation-order, so a smalls-first pass here would
            # renumber both whenever an oversized elem precedes a small
            # one (first seen on a 50k-tri scene; bit-identity test).
            for e in elems:
                if count(e) <= leaf_slots:
                    slots.append(
                        (emit_group(int(lo[e]), count(e)), _box_of(e))
                    )
                else:
                    slots.append((build(e), _box_of(e)))
            _fill(nid, slots)
            return nid
        for e in elems:
            if count(e) > leaf_slots:
                slots.append((build(e), _box_of(e)))
        _fill(nid, slots)
        return nid

    def build_chunks(chunks: list[tuple[int, int]], box_node: int) -> int:
        nid = alloc_node()
        slots = []
        for base, cnt in chunks[: width - 1]:
            slots.append((emit_group(base, cnt), _box_of(box_node)))
        rest = chunks[width - 1 :]
        if len(rest) == 1:
            slots.append((emit_group(*rest[0]), _box_of(box_node)))
        elif rest:
            slots.append((build_chunks(rest, box_node), _box_of(box_node)))
        _fill(nid, slots)
        return nid

    def _box_of(b: int) -> np.ndarray:
        return np.concatenate([aabb_min[b], aabb_max[b]]).astype(np.float32)

    def _union_box(members: list[int]) -> np.ndarray:
        mins = aabb_min[members].min(axis=0)
        maxs = aabb_max[members].max(axis=0)
        return np.concatenate([mins, maxs]).astype(np.float32)

    _tri_f = np.asarray(tri_isect, np.float32)

    def _box_of_ranges(ranges: list[tuple[int, int]]) -> np.ndarray:
        rows = np.concatenate(
            [_tri_f[glo : glo + c] for glo, c in ranges], axis=0
        )
        v0 = rows[:, 0:3]
        allv = np.concatenate([v0, v0 + rows[:, 3:6], v0 + rows[:, 6:9]])
        return np.concatenate(
            [allv.min(axis=0), allv.max(axis=0)]
        ).astype(np.float32)

    def _fill(nid: int, slots: list[tuple[int, np.ndarray]]) -> None:
        assert len(slots) <= width
        for c, (m, box) in enumerate(slots):
            wide_meta[nid][c] = m
            wide_boxes[nid][c] = box

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        root = build(0)
    finally:
        sys.setrecursionlimit(old_limit)
    assert root == 0

    nn = len(wide_meta)
    meta_arr = np.stack(wide_meta).astype(np.int32)  # (Nn, width)
    boxes_arr = np.zeros((nn * OCTANTS * width, 8), np.float32)
    order_arr = np.zeros((nn, OCTANTS * width), np.int32)
    for n in range(nn):
        wb = wide_boxes[n]  # (width, 6) child-major, NaN on empty slots
        center = (wb[:, 0:3] + wb[:, 3:6]) * 0.5  # NaN on empties
        for oct_ in range(OCTANTS):
            sign = np.where(
                [oct_ & 1, oct_ & 2, oct_ & 4], -1.0, 1.0
            )  # ray-direction signs for this octant
            key = center @ sign
            key = np.where(np.isnan(key), -np.inf, key)  # empties last
            # Push order far-to-near along the ray: descending center.sign.
            perm = np.argsort(-key, kind="stable")
            order_arr[n, oct_ * width : (oct_ + 1) * width] = meta_arr[
                n, perm
            ]
            r0 = (n * OCTANTS + oct_) * width
            boxes_arr[r0 : r0 + width, 0:6] = wb[perm]

    # Leaf slabs: lane width = max(leaf_slots, 128) (tiles stay full
    # 128-lane multiples; slots beyond gcnt pad with rejecting rows).
    ng = len(groups)
    lanes = max(leaf_slots, 128)
    tris = np.zeros((ng * grows, lanes), np.float32)
    tri = np.asarray(tri_isect, np.float32)
    sub_w = leaf_slots // sub
    for g, ranges in enumerate(groups):
        r0 = g * grows
        rows = np.concatenate(
            [tri[glo : glo + gcnt] for glo, gcnt in ranges], axis=0
        )  # (cnt, 9)
        gcnt = rows.shape[0]
        tris[r0 : r0 + 9, :gcnt] = rows.T
        tris[r0 + 9, :gcnt] = np.concatenate(
            [np.arange(glo, glo + gcnt_, dtype=np.float32)
             for glo, gcnt_ in ranges]
        )
        tris[r0 + 9, gcnt:] = -1.0
        # Sub-cluster AABBs from triangle vertices (v0, v0+e1, v0+e2):
        # sub s at row r0 + 16 + s, bounds on lanes 0..5.
        for s in range(sub):
            a, b2 = s * sub_w, min((s + 1) * sub_w, gcnt)
            if a >= gcnt:
                tris[r0 + 16 + s, 0:6] = np.nan
                continue
            v0 = rows[a:b2, 0:3]
            v1 = v0 + rows[a:b2, 3:6]
            v2 = v0 + rows[a:b2, 6:9]
            allv = np.concatenate([v0, v1, v2], axis=0)
            tris[r0 + 16 + s, 0:3] = allv.min(axis=0)
            tris[r0 + 16 + s, 3:6] = allv.max(axis=0)

    _check_stack_depth(meta_arr)
    return WideBVH(meta=meta_arr, order=order_arr, boxes=boxes_arr,
                   tris=tris, leaf_slots=leaf_slots, sub=sub, width=width)
