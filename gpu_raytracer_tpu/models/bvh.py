"""BVH: flattened node model + host-side builder.

Node semantics match the reference `BvhNode`
(/root/reference/shared/src/lib.rs:152-161): AABB bounds, left/right child
indices with a leaf sentinel, and a contiguous (start, count) range of
triangle indices. The reference builds with an external crate's parallel
builder at 1 triangle per leaf (/root/reference/src/bvh.rs:125-151) and a
chunked strategy above 100k triangles (bvh.rs:154-189); we build a binned-SAH
tree in vectorised NumPy (an optional native C++ builder lives in csrc/), and
**reorder the triangles into leaf order** so that device-side leaf tests are
contiguous reads instead of gathers — the indirection list
(`triangle_indices`, bvh.rs:366-369) becomes the identity and is folded away.

Device-side sentinel: the reference uses 0xFFFFFFFF (u32); we use -1 (int32).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .geometry import triangle_aabbs

LEAF = -1  # child sentinel (reference: 0xFFFFFFFF, shared/src/lib.rs:157-158)


@pytree_dataclass(meta_fields=("leaf_align", "max_leaf", "depth"))
class Bvh:
    node_min: jnp.ndarray   # [N,3] f32
    node_max: jnp.ndarray   # [N,3] f32
    left: jnp.ndarray       # [N] i32, -1 if leaf
    right: jnp.ndarray      # [N] i32, -1 if leaf
    tri_start: jnp.ndarray  # [N] i32: first triangle (in leaf-ordered arrays)
    tri_count: jnp.ndarray  # [N] i32: triangles in leaf (0 for internal)
    # Threaded (stackless) traversal links: on AABB hit continue at
    # hit_link (= left child, or the miss target for leaves), on AABB miss
    # jump to miss_link (next-sibling-or-ancestor's-sibling); -1 = done.
    # The TPU-native replacement for the reference's 64-deep per-thread
    # stack (shader/src/bvh.rs:35-38) — pure gathers, zero scatters.
    hit_link: jnp.ndarray   # [N] i32
    miss_link: jnp.ndarray  # [N] i32
    # Static (jit-cache-key) leaf alignment: every leaf's triangle range
    # starts at a multiple of this and is padded to it (see align_leaves).
    # 1 = unaligned; 8 enables the packed-row Pallas traversal kernel.
    leaf_align: int = 1
    # Static upper bound on triangles per leaf — the unroll bound device
    # traversals MUST cover (a smaller static leaf_size would silently skip
    # triangles in fuller leaves).
    max_leaf: int = 4
    # Optional wide overlay (collapse4, width w = 4 or 8 from
    # config.bvh_width): each wide node holds up to w children with their
    # bounds, so one traversal step does w slab tests — the per-step scalar
    # overhead (node fetch switch, stack ops, loop bookkeeping) amortises
    # w-fold and the node table shrinks ~(w-1)x. None when not built
    # (traversals then use the binary tree); device refit overlays
    # (ops/lbvh.py) are always width 4.
    q_child: jnp.ndarray | None = None   # [Q,w] i32: wide id | tri_start | -1
    q_leafc: jnp.ndarray | None = None   # [Q,w] i32 leaf tri count (0=internal/empty)
    q_min: jnp.ndarray | None = None     # [Q,w,3] f32
    q_max: jnp.ndarray | None = None     # [Q,w,3] f32
    q_axis: jnp.ndarray | None = None    # [Q] i32 child sort axis
    # BINARY node id behind each quad slot (-1 empty): lets a topology
    # refit re-derive q_min/q_max by gathering refreshed binary bounds.
    q_src: jnp.ndarray | None = None     # [Q,4] i32
    # Static max tree depth (bounds the refit sweep count; 64 default).
    depth: int = 64

    @property
    def has_wide(self) -> bool:
        return self.q_child is not None

    @property
    def num_nodes(self) -> int:
        return self.left.shape[0]

    @staticmethod
    def single_leaf(num_triangles: int) -> "Bvh":
        """Degenerate one-node BVH covering everything (brute-force in a box)."""
        big = np.float32(3.0e38)
        return Bvh(
            node_min=jnp.asarray([[-big] * 3], jnp.float32),
            node_max=jnp.asarray([[big] * 3], jnp.float32),
            left=jnp.asarray([LEAF], jnp.int32),
            right=jnp.asarray([LEAF], jnp.int32),
            tri_start=jnp.asarray([0], jnp.int32),
            tri_count=jnp.asarray([num_triangles], jnp.int32),
            hit_link=jnp.asarray([-1], jnp.int32),
            miss_link=jnp.asarray([-1], jnp.int32),
        )


def compute_links(left: np.ndarray, right: np.ndarray):
    """Thread the tree for stackless traversal (left-first DFS order — the
    same visit order as the reference's push-right-then-left stack,
    shader/src/bvh.rs:74-83). Returns (hit_link, miss_link)."""
    n = left.shape[0]
    miss = np.full(n, -1, np.int32)
    stack = [(0, -1)]
    while stack:
        node, succ = stack.pop()
        miss[node] = succ
        l, r = int(left[node]), int(right[node])
        if l >= 0:
            stack.append((r, succ))
            stack.append((l, r))
    hit = np.where(left >= 0, left, miss).astype(np.int32)
    return hit, miss


class BvhBuildResult:
    """Host-side build output (NumPy)."""

    def __init__(self, node_min, node_max, left, right, tri_start, tri_count,
                 tri_order, max_depth, leaf_align: int = 1):
        self.node_min = node_min
        self.node_max = node_max
        self.left = left
        self.right = right
        self.tri_start = tri_start
        self.tri_count = tri_count
        self.tri_order = tri_order      # [T] slot -> original id (-1 = pad)
        self.max_depth = max_depth
        self.leaf_align = leaf_align

    def to_device(self, wide: bool = True, width: int = 4) -> Bvh:
        hit_link, miss_link = compute_links(self.left, self.right)
        leaf_counts = np.asarray(self.tri_count)[np.asarray(self.left) < 0]
        max_leaf = int(leaf_counts.max()) if leaf_counts.size else 0
        quad = {}
        if wide and self.left.shape[0] > 1:
            # pack_node4_rows folds the child-sort axis into leaf counts as
            # lc + 16*axis — the wide overlay needs every leaf count < 16.
            assert max_leaf < 16, \
                f"wide overlay requires leaf counts < 16 (got {max_leaf})"
            assert width in (4, 8), f"wide overlay width must be 4 or 8"
            from .bvh_native import collapse4_native
            out = collapse4_native(self.left, self.right, self.tri_start,
                                   self.tri_count, self.node_min,
                                   self.node_max, width=width)
            qc, ql, qmn, qmx, qax, qsrc = out if out is not None else \
                collapse4(self.left, self.right, self.tri_start,
                          self.tri_count, self.node_min, self.node_max,
                          width=width)
            quad = dict(q_child=jnp.asarray(qc), q_leafc=jnp.asarray(ql),
                        q_min=jnp.asarray(qmn), q_max=jnp.asarray(qmx),
                        q_axis=jnp.asarray(qax), q_src=jnp.asarray(qsrc))
        return Bvh(
            node_min=jnp.asarray(self.node_min),
            node_max=jnp.asarray(self.node_max),
            left=jnp.asarray(self.left),
            right=jnp.asarray(self.right),
            tri_start=jnp.asarray(self.tri_start),
            tri_count=jnp.asarray(self.tri_count),
            hit_link=jnp.asarray(hit_link),
            miss_link=jnp.asarray(miss_link),
            leaf_align=self.leaf_align,
            max_leaf=max(max_leaf, 1),
            depth=max(self.max_depth + 2, 8),
            **quad,
        )


def collapse4(left, right, tri_start, tri_count, node_min, node_max,
              width: int = 4):
    """Collapse a binary BVH into a `width`-wide overlay → NumPy
    (q_child, q_leafc, q_min, q_max, q_axis).

    Each wide node replaces a binary internal node by up to `width`
    descendants, grown greedily by splitting the candidate with the largest
    surface area (the standard SAH-greedy collapse). Children are stored
    sorted by centroid along the parent's longest axis; traversal visits
    them in forward or reverse order by the packet's majority direction
    sign — the wide analogue of the binary ordered kernel's near-child-first
    trick. Empty slots get child -1 / count 0 and inert point bounds."""
    FAR = 1e30
    is_leaf = left < 0
    ext = node_max - node_min
    d = np.maximum(ext, 0.0)
    sa = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

    q_child, q_leafc, q_min, q_max, q_axis, q_src = [], [], [], [], [], []

    def emit(slots, axis):
        ch = np.full(width, -1, np.int64)
        lc = np.zeros(width, np.int64)
        mn = np.full((width, 3), FAR, np.float32)
        mx = np.full((width, 3), FAR, np.float32)
        srcs = np.full(width, -1, np.int64)
        for i, (c, l, lo, hi, s) in enumerate(slots):
            ch[i], lc[i], mn[i], mx[i], srcs[i] = c, l, lo, hi, s
        q_child.append(ch)
        q_leafc.append(lc)
        q_min.append(mn)
        q_max.append(mx)
        q_axis.append(axis)
        q_src.append(srcs)

    if is_leaf[0]:
        emit([(int(tri_start[0]), max(int(tri_count[0]), 0),
               node_min[0], node_max[0], 0)] if tri_count[0] > 0 else [], 0)
    else:
        qid = {0: 0}
        queue = [0]
        i = 0
        while i < len(queue):
            b = queue[i]
            i += 1
            cand = [int(left[b]), int(right[b])]
            while len(cand) < width:
                grow, grow_sa = -1, -1.0
                for j, c in enumerate(cand):
                    if not is_leaf[c] and sa[c] > grow_sa:
                        grow, grow_sa = j, float(sa[c])
                if grow < 0:
                    break
                c = cand.pop(grow)
                cand += [int(left[c]), int(right[c])]
            ax = int(np.argmax(ext[b]))
            cand.sort(key=lambda c: float(node_min[c, ax] + node_max[c, ax]))
            slots = []
            for c in cand:
                if is_leaf[c]:
                    if tri_count[c] > 0:  # empty leaves are inert — drop
                        slots.append((int(tri_start[c]), int(tri_count[c]),
                                      node_min[c], node_max[c], c))
                else:
                    q = qid.get(c)
                    if q is None:
                        q = qid[c] = len(qid)
                        queue.append(c)
                    slots.append((q, 0, node_min[c], node_max[c], c))
            emit(slots, ax)

    return (np.stack(q_child).astype(np.int32),
            np.stack(q_leafc).astype(np.int32),
            np.stack(q_min), np.stack(q_max),
            np.asarray(q_axis, np.int32),
            np.stack(q_src).astype(np.int32))


def align_leaves(res: "BvhBuildResult", align: int = 8) -> "BvhBuildResult":
    """Pack leaf triangle ranges into whole `align`-slot rows of the Pallas
    triangle table (ops/pallas/traverse.py), first-fit in traversal order.

    A leaf never straddles a row (count <= align by construction), but
    leaves smaller than a row SHARE rows: the kernel's leaf test covers the
    winner row's full `align` slots, and slots belonging to a neighbouring
    leaf hold real scene triangles — testing them is conservative extra
    work, never a correctness issue (strict-< closest-hit and any-hit are
    insensitive to extra true candidates). Only genuinely unused tail slots
    pad with degenerates (tri_order -1 → zero-edge, can never hit).
    Measured on a 1.2M-triangle SAH build this cuts the packed-slot
    expansion from +59% (one row per leaf) to +7%, which is the difference
    between fitting the 100 MB VMEM table budget and falling off the fused
    path. DFS/tie order of real triangles is unchanged."""
    leaf_nodes = np.nonzero(res.left < 0)[0]
    starts = res.tri_start[leaf_nodes]
    counts = res.tri_count[leaf_nodes]
    if counts.size and int(counts.max()) > align:
        # The Pallas leaf test covers exactly ONE `align`-slot row per leaf;
        # a bigger leaf could not be row-packed without silently dropping
        # triangles. Builders cap leaf_size at the alignment (prepare_scene);
        # reject loudly rather than corrupt the packing.
        raise ValueError(
            f"align_leaves: leaf with {int(counts.max())} triangles exceeds "
            f"align={align}; build the BVH with leaf_size <= {align}")
    # First-fit-DECREASING bin packing into `align`-slot rows, tracked with
    # per-remaining-capacity buckets (O(L)): big leaves open rows, small
    # ones fill the gaps — near-optimal occupancy. Secondary key keeps the
    # traversal (tri_start) order among equal sizes for locality.
    by = np.lexsort((starts, -counts))
    rows: list[list] = []            # row -> list of (node, offset)
    used: list[int] = []             # row -> slots used
    by_rem: list[list[int]] = [[] for _ in range(align + 1)]  # rem -> rows
    for li in by:
        node = int(leaf_nodes[li])
        c = int(counts[li])
        if c == 0:
            continue
        r = -1
        for rem in range(c, align + 1):
            while by_rem[rem] and used[by_rem[rem][-1]] != align - rem:
                by_rem[rem].pop()    # stale entry
            if by_rem[rem]:
                r = by_rem[rem].pop()
                break
        if r < 0:
            r = len(rows)
            rows.append([])
            used.append(0)
        rows[r].append((node, used[r]))
        used[r] += c
        by_rem[align - used[r]].append(r)

    new_order: list[np.ndarray] = []
    new_start = res.tri_start.copy()
    cur = 0
    for r, members in enumerate(rows):
        for node, off in members:
            s = int(res.tri_start[node])
            c = int(res.tri_count[node])
            new_start[node] = cur + off
            new_order.append(res.tri_order[s:s + c])
        pad = align - used[r]
        if pad:
            new_order.append(np.full(pad, -1, np.int64))
        cur += align
    # empty leaves point at a valid (all-pad) tail row
    empties = leaf_nodes[counts == 0]
    if empties.size:
        new_start[empties] = cur
        new_order.append(np.full(align, -1, np.int64))
        cur += align
    order = (np.concatenate(new_order) if new_order
             else np.zeros((0,), np.int64))
    return BvhBuildResult(res.node_min, res.node_max, res.left, res.right,
                          new_start, res.tri_count, order, res.max_depth,
                          leaf_align=align)


_SAH_BINS = 16


def build_bvh(vertices: np.ndarray, indices: np.ndarray, leaf_size: int = 4,
              use_native: bool = True) -> BvhBuildResult:
    """Binned-SAH top-down build. Returns flattened nodes + triangle order.

    Root is node 0 (same invariant the reference's conversion establishes,
    /root/reference/src/bvh.rs:282-290).
    """
    vertices = np.asarray(vertices, np.float32)
    indices = np.asarray(indices, np.uint32)
    T = indices.shape[0]
    if T == 0:
        r = Bvh.single_leaf(0)
        return BvhBuildResult(
            np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
            np.asarray([LEAF], np.int32), np.asarray([LEAF], np.int32),
            np.asarray([0], np.int32), np.asarray([0], np.int32),
            np.zeros((0,), np.int64), 1)

    if use_native:
        try:
            from .bvh_native import build_bvh_native
            out = build_bvh_native(vertices, indices, leaf_size)
            if out is not None:
                return out
        except Exception:
            pass  # fall back to the NumPy builder

    tmin, tmax = triangle_aabbs(vertices, indices)
    centroid = 0.5 * (tmin + tmax)

    order = np.arange(T, dtype=np.int64)
    # Pre-size output arrays: every leaf holds >=1 triangle, so a binary
    # tree has at most T leaves and 2T-1 nodes total.
    cap = max(2 * T + 2, 16)
    node_min = np.zeros((cap, 3), np.float32)
    node_max = np.zeros((cap, 3), np.float32)
    left = np.full(cap, LEAF, np.int32)
    right = np.full(cap, LEAF, np.int32)
    tri_start = np.zeros(cap, np.int32)
    tri_count = np.zeros(cap, np.int32)
    n_nodes = 1  # node 0 = root
    max_depth = 1

    # Explicit stack of (node_idx, lo, hi, depth) over ranges of `order`.
    stack = [(0, 0, T, 1)]
    while stack:
        node, lo, hi, depth = stack.pop()
        max_depth = max(max_depth, depth)
        ids = order[lo:hi]
        bmin = tmin[ids].min(axis=0)
        bmax = tmax[ids].max(axis=0)
        node_min[node] = bmin
        node_max[node] = bmax
        count = hi - lo
        if count <= leaf_size:
            tri_start[node] = lo
            tri_count[node] = count
            continue

        cen = centroid[ids]
        cmin, cmax = cen.min(axis=0), cen.max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        if extent[axis] <= 0.0:
            # All centroids identical: split in the middle by index.
            mid = lo + count // 2
        else:
            # Binned SAH along the widest centroid axis.
            scale = _SAH_BINS * (1.0 - 1e-6) / extent[axis]
            bins = ((cen[:, axis] - cmin[axis]) * scale).astype(np.int32)
            bins = np.clip(bins, 0, _SAH_BINS - 1)
            bin_cnt = np.bincount(bins, minlength=_SAH_BINS)
            bin_min = np.full((_SAH_BINS, 3), np.inf, np.float32)
            bin_max = np.full((_SAH_BINS, 3), -np.inf, np.float32)
            for a in range(3):
                np.minimum.at(bin_min[:, a], bins, tmin[ids][:, a])
                np.maximum.at(bin_max[:, a], bins, tmax[ids][:, a])
            # Prefix/suffix sweeps for SAH cost of the B-1 split planes.
            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(bin_cnt)
            rcnt = count - lcnt

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])

            cost = area(lmin, lmax)[:-1] * lcnt[:-1] + area(rmin[1:], rmax[1:]) * rcnt[:-1]
            cost = np.where((lcnt[:-1] == 0) | (rcnt[:-1] == 0), np.inf, cost)
            best = int(np.argmin(cost))
            if not np.isfinite(cost[best]):
                mid = lo + count // 2
            else:
                go_left = bins <= best
                sel = np.concatenate([ids[go_left], ids[~go_left]])
                order[lo:hi] = sel
                mid = lo + int(np.count_nonzero(go_left))
                if mid == lo or mid == hi:
                    mid = lo + count // 2

        if mid == lo or mid == hi:  # degenerate guard
            mid = lo + count // 2
        l_idx, r_idx = n_nodes, n_nodes + 1
        n_nodes += 2
        if n_nodes > cap:
            raise RuntimeError("BVH node capacity exceeded")
        left[node] = l_idx
        right[node] = r_idx
        stack.append((r_idx, mid, hi, depth + 1))
        stack.append((l_idx, lo, mid, depth + 1))

    return BvhBuildResult(
        node_min[:n_nodes].copy(), node_max[:n_nodes].copy(),
        left[:n_nodes].copy(), right[:n_nodes].copy(),
        tri_start[:n_nodes].copy(), tri_count[:n_nodes].copy(),
        order, max_depth,
    )


def validate_bvh(res: BvhBuildResult, num_triangles: int,
                 allow_refs: bool = False) -> None:
    """Property checks (SURVEY.md §4): every triangle reachable, parent
    bounds contain child bounds, leaf ranges disjoint-contiguous. Spatial
    (SBVH) builds duplicate triangle REFERENCES across leaves —
    `allow_refs=True` checks coverage instead of exactly-once."""
    seen = np.zeros(num_triangles, bool)
    stack = [0]
    while stack:
        n = stack.pop()
        if res.left[n] == LEAF:
            s, c = res.tri_start[n], res.tri_count[n]
            ids = res.tri_order[s:s + c]
            if not allow_refs:
                assert not seen[ids].any(), "triangle in two leaves"
            seen[ids] = True
        else:
            for ch in (res.left[n], res.right[n]):
                assert (res.node_min[ch] >= res.node_min[n] - 1e-6).all()
                assert (res.node_max[ch] <= res.node_max[n] + 1e-6).all()
                stack.append(int(ch))
    assert seen.all(), "unreachable triangle"


def build_bvh_spatial(vertices: np.ndarray, indices: np.ndarray,
                      leaf_size: int = 8, bins: int = 16,
                      alpha: float = 1e-5,
                      max_dup: float = 1.35) -> BvhBuildResult:
    """SBVH-style top-down build with CHOPPED spatial splits (Stich et al.
    2009, binned variant): at each node the binned-SAH object split competes
    with a spatial split that bins the CLIPPED reference boxes along the
    widest axis; straddling triangles are referenced in BOTH children with
    their boxes clipped at the plane. Spatial splits are only evaluated when
    the object split's child boxes overlap (SA(L∩R)/SA(root) > alpha) and
    total references stay under `max_dup`·T.

    Returns a BvhBuildResult whose `tri_order` may reference a triangle
    MORE THAN ONCE (every downstream consumer — _expand_triangles,
    align_leaves, collapse4, refit — gathers by id and is duplication-safe;
    closest-hit/any-hit correctness is unaffected, duplicates only add
    candidate tests). Tighter clipped bounds cut node overlap on content
    with large triangles spanning many cells — fewer traversal steps on
    every bounce for the same geometry."""
    vertices = np.asarray(vertices, np.float32)
    indices = np.asarray(indices, np.uint32)
    T = indices.shape[0]
    if T == 0:
        return build_bvh(vertices, indices, leaf_size)
    tmin, tmax = triangle_aabbs(vertices, indices)

    max_refs = int(T * max_dup) + 64
    rtri = np.empty(max_refs, np.int64)
    rmin = np.empty((max_refs, 3), np.float32)
    rmax = np.empty((max_refs, 3), np.float32)
    rtri[:T] = np.arange(T)
    rmin[:T] = tmin
    rmax[:T] = tmax
    n_refs = T

    cap = 2 * max_refs + 2
    node_min = np.zeros((cap, 3), np.float32)
    node_max = np.zeros((cap, 3), np.float32)
    left = np.full(cap, LEAF, np.int32)
    right = np.full(cap, LEAF, np.int32)
    tri_start = np.zeros(cap, np.int32)
    tri_count = np.zeros(cap, np.int32)
    out_order = np.empty(max_refs, np.int64)
    out_n = 0
    n_nodes = 1
    max_depth = 1

    def sa(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    root_sa = max(sa(tmin.min(0), tmax.max(0)), 1e-30)

    stack = [(0, np.arange(T, dtype=np.int64), 1)]
    while stack:
        node, ids, depth = stack.pop()
        max_depth = max(max_depth, depth)
        bmin = rmin[ids].min(axis=0)
        bmax = rmax[ids].max(axis=0)
        node_min[node] = bmin
        node_max[node] = bmax
        count = ids.shape[0]
        if count <= leaf_size:
            tri_start[node] = out_n
            tri_count[node] = count
            out_order[out_n:out_n + count] = rtri[ids]
            out_n += count
            continue

        # ---- object split: binned SAH on reference centroids ----
        cen = 0.5 * (rmin[ids] + rmax[ids])
        cmin, cmax = cen.min(axis=0), cen.max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        obj_mask = None
        obj_cost = np.inf
        obj_overlap = np.inf
        if extent[axis] > 0.0:
            scale = bins * (1.0 - 1e-6) / extent[axis]
            b = np.clip(((cen[:, axis] - cmin[axis]) * scale).astype(np.int32),
                        0, bins - 1)
            bin_cnt = np.bincount(b, minlength=bins)
            bin_min = np.full((bins, 3), np.inf, np.float32)
            bin_max = np.full((bins, 3), -np.inf, np.float32)
            for a in range(3):
                np.minimum.at(bin_min[:, a], b, rmin[ids][:, a])
                np.maximum.at(bin_max[:, a], b, rmax[ids][:, a])
            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            gmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            gmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(bin_cnt)
            rcnt = count - lcnt

            def areas(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                              + d[:, 2] * d[:, 0])

            cost = (areas(lmin, lmax)[:-1] * lcnt[:-1]
                    + areas(gmin[1:], gmax[1:]) * rcnt[:-1])
            cost = np.where((lcnt[:-1] == 0) | (rcnt[:-1] == 0), np.inf,
                            cost)
            best = int(np.argmin(cost))
            if np.isfinite(cost[best]):
                obj_cost = float(cost[best])
                obj_mask = b <= best
                omn = np.maximum(lmin[best], gmin[best + 1])
                omx = np.minimum(lmax[best], gmax[best + 1])
                obj_overlap = sa(omn, omx) if (omx > omn).all() else 0.0

        # ---- spatial split: chopped binning along the widest NODE axis,
        # evaluated only when the object split leaves overlapping children
        # and the duplication budget has headroom ----
        sp_cost = np.inf
        sp_plane = 0.0
        sp_axis = int(np.argmax(bmax - bmin))
        headroom = max_refs - n_refs - count
        if (headroom > 0 and (not np.isfinite(obj_cost)
                              or obj_overlap / root_sa > alpha)
                and bmax[sp_axis] - bmin[sp_axis] > 0.0):
            ext = bmax[sp_axis] - bmin[sp_axis]
            inv = bins / ext
            lo = rmin[ids][:, sp_axis]
            hi = rmax[ids][:, sp_axis]
            eb = np.clip(((lo - bmin[sp_axis]) * inv).astype(np.int32),
                         0, bins - 1)
            xb = np.clip(((hi - bmin[sp_axis]) * inv - 1e-9).astype(np.int32),
                         0, bins - 1)
            xb = np.maximum(xb, eb)
            edges = bmin[sp_axis] + np.arange(bins + 1) * (ext / bins)
            sbin_min = np.full((bins, 3), np.inf, np.float32)
            sbin_max = np.full((bins, 3), -np.inf, np.float32)
            for bi in range(bins):
                m = (eb <= bi) & (xb >= bi)
                if not m.any():
                    continue
                cm = rmin[ids][m].copy()
                cM = rmax[ids][m].copy()
                cm[:, sp_axis] = np.maximum(cm[:, sp_axis], edges[bi])
                cM[:, sp_axis] = np.minimum(cM[:, sp_axis], edges[bi + 1])
                sbin_min[bi] = np.minimum(sbin_min[bi], cm.min(axis=0))
                sbin_max[bi] = np.maximum(sbin_max[bi], cM.max(axis=0))
            ecnt = np.bincount(eb, minlength=bins)
            xcnt = np.bincount(xb, minlength=bins)
            slmin = np.minimum.accumulate(sbin_min, axis=0)
            slmax = np.maximum.accumulate(sbin_max, axis=0)
            srmin = np.minimum.accumulate(sbin_min[::-1], axis=0)[::-1]
            srmax = np.maximum.accumulate(sbin_max[::-1], axis=0)[::-1]
            nl = np.cumsum(ecnt)                 # refs entering at <= i
            nr = count - np.cumsum(xcnt)         # refs exiting after i

            def areas2(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                              + d[:, 2] * d[:, 0])

            scost = (areas2(slmin, slmax)[:-1] * nl[:-1]
                     + areas2(srmin[1:], srmax[1:]) * nr[:-1])
            dup = nl[:-1] + nr[:-1] - count      # straddler copies per plane
            scost = np.where((nl[:-1] == 0) | (nr[:-1] == 0)
                             | (dup > headroom), np.inf, scost)
            sbest = int(np.argmin(scost))
            if np.isfinite(scost[sbest]):
                sp_cost = float(scost[sbest])
                sp_plane = float(edges[sbest + 1])

        # ---- apply the cheaper split ----
        if sp_cost < obj_cost:
            lo = rmin[ids][:, sp_axis]
            hi = rmax[ids][:, sp_axis]
            left_only = hi <= sp_plane
            # & ~left_only: an axis-flat ref lying exactly ON the plane
            # (lo == hi == sp_plane) satisfies both masks — without the
            # exclusion it would land in BOTH children as the SAME mutable
            # ref record (aliased clips, ref-count overflow)
            right_only = (lo >= sp_plane) & ~left_only
            strad = ~(left_only | right_only)
            n_l = int(left_only.sum() + strad.sum())
            n_r = int(right_only.sum() + strad.sum())
            if n_l == 0 or n_r == 0 or (n_l >= count and n_r >= count):
                # degenerate (incl. every ref straddling: children would
                # both equal the parent and recurse forever): median split.
                # Decided BEFORE any mutation — clipping rmax first and
                # then discarding the right-side copies would leave leaf
                # boxes that under-cover their triangles (silent misses).
                lids, rids = ids[: count // 2], ids[count // 2:]
            else:
                sid = ids[strad]
                # left keeps the straddler refs, clipped at the plane...
                rmax[sid, sp_axis] = sp_plane
                # ...the right side gets fresh clipped COPIES
                k = sid.shape[0]
                new_ids = np.arange(n_refs, n_refs + k, dtype=np.int64)
                rtri[new_ids] = rtri[sid]
                rmin[new_ids] = rmin[sid]
                rmin[new_ids, sp_axis] = sp_plane
                rmax[new_ids] = rmax[sid]
                # rmax[sid] was clipped above; `hi` is a pre-clip copy
                # (fancy indexing), so the right box recovers its original
                # high edge
                rmax[new_ids, sp_axis] = hi[strad]
                n_refs += k
                lids = np.concatenate([ids[left_only], sid])
                rids = np.concatenate([ids[right_only], new_ids])
        elif obj_mask is not None:
            lids, rids = ids[obj_mask], ids[~obj_mask]
            if lids.size == 0 or rids.size == 0:
                lids, rids = ids[: count // 2], ids[count // 2:]
        else:
            lids, rids = ids[: count // 2], ids[count // 2:]

        l_idx, r_idx = n_nodes, n_nodes + 1
        n_nodes += 2
        if n_nodes > cap:
            raise RuntimeError("SBVH node capacity exceeded")
        left[node] = l_idx
        right[node] = r_idx
        stack.append((r_idx, rids, depth + 1))
        stack.append((l_idx, lids, depth + 1))

    return BvhBuildResult(
        node_min[:n_nodes].copy(), node_max[:n_nodes].copy(),
        left[:n_nodes].copy(), right[:n_nodes].copy(),
        tri_start[:n_nodes].copy(), tri_count[:n_nodes].copy(),
        out_order[:out_n].copy(), max_depth,
    )
