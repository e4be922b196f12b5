"""Structured-rectangle fast path for the subdomain gather/scatter.

On structured grids with uniform block partitions, every overlapping
subdomain is an axis-aligned rectangle of the dof grid.  The general
``gather_subdomain`` / ``scatter_add_subdomain`` (precond/extract.py) move
those dofs through 1-D gathers and gather-dual scatter maps, which on this
TPU backend execute element-at-a-time (~14 ns/element — CLAUDE.md round-3
rules): ~3 ms + ~8 ms per two-level apply at the 384^2/256 bench shape,
i.e. ~90% of the warm GMRES iteration.

This module re-lays every subdomain out on a uniform (h, w) canvas anchored
on a regular pitch grid, which turns both directions into pure layout
transforms (pad / slice / reshape / transpose + one row-permutation of the
batch) that run at HBM bandwidth — no gathers or scatters at all:

* gather:  pad the global vector to the (ny_p, nx_p) canvas grid; for each
  of the g_r*g_c parity groups (whose tiles are disjoint by construction),
  slice the group window, reshape (a, G_r, b, G_c) -> transpose ->
  (a*b, h*w); one row-permutation puts the batch back in subdomain order.
* scatter: exact inverse — row-permute, reshape, zero-pad each tile to the
  group window, and add the g_r*g_c static pads into the canvas.

The reference's per-rank copyOwnerToAll / addOwnerCopyToOwnerCopy
(dune/ddm/schwarz.hh:122-142) become these layout transforms; the general
index-map path remains as the fallback for unstructured partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class RectMeta:
    """Host-side static description of a uniform rect-canvas layout.

    All fields are Python ints/tuples — device code built from a RectMeta
    traces to static slices/reshapes only.
    """

    ny: int  # dof grid rows
    nx: int  # dof grid cols
    h: int   # canvas rows per subdomain (max rect height)
    w: int   # canvas cols per subdomain
    n_pad: int  # padded local size (>= h*w)
    m_r: int  # canvas margin (padded grid row of dof row 0)
    m_c: int
    ny_p: int  # padded grid dims
    nx_p: int
    g_r: int  # group strides (parity-grouping factors)
    g_c: int
    pitch_r: int  # anchor pitch of consecutive rect rows/cols
    pitch_c: int
    n_pr: int  # rect grid dims (subdomain grid)
    n_pc: int
    base_r: int  # anchor of rect-row 0, in padded-grid coords
    base_c: int
    # per-group (a, b, org_r, org_c, ks): tile counts, window origin
    # (padded-grid coords) and the subdomain ids tiled row-major
    groups: tuple
    perm: tuple  # inverse permutation: X_groups[perm[k]] is subdomain k

    # common canvas protocol (shared with boxnd.BoxMeta): row-major dof grid
    # dims and canvas tile dims, slowest..fastest
    @property
    def dims(self) -> tuple:
        return (self.ny, self.nx)

    @property
    def tile(self) -> tuple:
        return (self.h, self.w)


def detect_rect_layout(topo, dof_grid, pad_to: int = 8) -> RectMeta | None:
    """Host: check that every subdomain of ``topo`` is an axis-aligned
    rectangle of the (ny, nx) dof grid on a uniform anchor pitch; returns
    the canvas layout, or None (-> general path).

    Purely data-driven: works for any element type / numbering whose
    subdomain dof sets happen to be row-major rect scans.
    """
    ny, nx = int(dof_grid[0]), int(dof_grid[1])
    if ny * nx != topo.n_glob or topo.n_sub < 2:
        return None
    rects = np.zeros((topo.n_sub, 4), dtype=np.int64)  # r0, c0, h, w
    for k in range(topo.n_sub):
        ids = topo.sub2glob[k][topo.valid[k]].astype(np.int64)
        if ids.size == 0 or np.any(np.diff(ids) <= 0):
            return None
        r, c = np.divmod(ids, nx)
        r0, r1 = int(r[0]), int(r[-1])
        c0, c1 = int(c.min()), int(c.max())
        h, w = r1 - r0 + 1, c1 - c0 + 1
        if h * w != ids.size:
            return None
        expect = (np.arange(r0, r1 + 1)[:, None] * nx
                  + np.arange(c0, c1 + 1)[None, :]).reshape(-1)
        if not np.array_equal(ids, expect):
            return None
        rects[k] = (r0, c0, h, w)
    h_max = int(rects[:, 2].max())
    w_max = int(rects[:, 3].max())
    # anchors: clipped-at-low rects sit at the END of their canvas window
    # (so anchors stay on the uniform pitch grid); all others at the start
    anch_r = np.where(
        (rects[:, 0] == 0) & (rects[:, 2] < h_max),
        rects[:, 0] + rects[:, 2] - h_max, rects[:, 0])
    anch_c = np.where(
        (rects[:, 1] == 0) & (rects[:, 3] < w_max),
        rects[:, 1] + rects[:, 3] - w_max, rects[:, 1])

    rvals = np.unique(anch_r)
    cvals = np.unique(anch_c)
    n_pr, n_pc = rvals.size, cvals.size
    if n_pr * n_pc != topo.n_sub:
        return None
    pitch_r = int(rvals[1] - rvals[0]) if n_pr > 1 else h_max
    pitch_c = int(cvals[1] - cvals[0]) if n_pc > 1 else w_max
    if pitch_r <= 0 or pitch_c <= 0:
        return None
    if not (np.array_equal(np.diff(rvals), np.full(n_pr - 1, pitch_r))
            and np.array_equal(np.diff(cvals), np.full(n_pc - 1, pitch_c))):
        return None
    gr = np.searchsorted(rvals, anch_r)
    gc = np.searchsorted(cvals, anch_c)
    if np.any(rvals[gr] != anch_r) or np.any(cvals[gc] != anch_c):
        return None
    # the subdomain grid must be dense (every (gr, gc) exactly once)
    if len({(int(a), int(b)) for a, b in zip(gr, gc)}) != topo.n_sub:
        return None

    g_r = -(-h_max // pitch_r)  # group stride: tiles G_r = g_r*pitch_r >= h
    g_c = -(-w_max // pitch_c)
    G_r, G_c = g_r * pitch_r, g_c * pitch_c
    m_r = int(max(0, -rvals[0]))
    m_c = int(max(0, -cvals[0]))
    ny_p = max(ny + m_r, int(rvals[-1]) + m_r + G_r)
    nx_p = max(nx + m_c, int(cvals[-1]) + m_c + G_c)

    groups = []
    order = []
    for u in range(g_r):
        for v in range(g_c):
            rs = np.arange(u, n_pr, g_r)
            cs = np.arange(v, n_pc, g_c)
            if rs.size == 0 or cs.size == 0:
                continue
            # subdomain ids tiled row-major over (rs, cs)
            lut = np.full((n_pr, n_pc), -1, dtype=np.int64)
            lut[gr, gc] = np.arange(topo.n_sub)
            ks = lut[np.ix_(rs, cs)].reshape(-1)
            assert np.all(ks >= 0)
            org_r = int(rvals[rs[0]]) + m_r
            org_c = int(cvals[cs[0]]) + m_c
            groups.append((int(rs.size), int(cs.size), org_r, org_c,
                           tuple(int(x) for x in ks)))
            order.append(ks)
    order = np.concatenate(order)
    perm = np.argsort(order)
    n_pad = int(-(-(h_max * w_max) // pad_to) * pad_to)
    return RectMeta(
        ny=ny, nx=nx, h=h_max, w=w_max, n_pad=n_pad, m_r=m_r, m_c=m_c,
        ny_p=int(ny_p), nx_p=int(nx_p), g_r=g_r, g_c=g_c,
        pitch_r=pitch_r, pitch_c=pitch_c, n_pr=n_pr, n_pc=n_pc,
        base_r=int(rvals[0]) + m_r, base_c=int(cvals[0]) + m_c,
        groups=tuple(groups), perm=tuple(int(x) for x in perm),
    )


def rect_local_slots(topo, meta: RectMeta) -> list[np.ndarray]:
    """Host: for each subdomain, the canvas slot of each of its (old-layout)
    valid dofs — the permutation that relayouts per-slot arrays."""
    slots = []
    for k in range(topo.n_sub):
        ids = topo.sub2glob[k][topo.valid[k]].astype(np.int64)
        r, c = np.divmod(ids, meta.nx)
        # anchor of this subdomain (padded coords, then relative)
        g = meta.groups
        # recompute anchor from the rect itself (as in detection)
        r0, r1 = int(r[0]), int(r[-1])
        c0 = int(c.min())
        c1 = int(c.max())
        h, w = r1 - r0 + 1, c1 - c0 + 1
        a_r = r0 + h - meta.h if (r0 == 0 and h < meta.h) else r0
        a_c = c0 + w - meta.w if (c0 == 0 and w < meta.w) else c0
        slots.append(((r - a_r) * meta.w + (c - a_c)).astype(np.int64))
    return slots


def relayout_rect(topo, meta: RectMeta):
    """Host: repack a DDMTopology into the canvas layout (padding slots may
    be interleaved; all consumers go through ``valid`` masks)."""
    from .indexmaps import DDMTopology

    n, n_sub = topo.n_glob, topo.n_sub
    n_pad = meta.n_pad
    slots = rect_local_slots(topo, meta)
    sub2glob = np.full((n_sub, n_pad), n, dtype=np.int32)
    valid = np.zeros((n_sub, n_pad), dtype=bool)
    owner = np.zeros((n_sub, n_pad), dtype=bool)
    boundary = np.zeros((n_sub, n_pad), dtype=bool)
    bdist = np.full((n_sub, n_pad), topo.bdist_cap, dtype=np.int32)
    keys, locs = [], []
    for k in range(n_sub):
        v = topo.valid[k]
        s = slots[k]
        ids = topo.sub2glob[k][v]
        sub2glob[k, s] = ids
        valid[k, s] = True
        owner[k, s] = topo.owner[k][v]
        boundary[k, s] = topo.boundary[k][v]
        bdist[k, s] = topo.bdist[k][v]
        keys.append(k * np.int64(n + 1) + ids.astype(np.int64))
        locs.append(s.astype(np.int32))
    keys = np.concatenate(keys)
    locs = np.concatenate(locs)
    order = np.argsort(keys)
    new = DDMTopology(
        n_glob=n, n_sub=n_sub, n_pad=n_pad, overlap=topo.overlap,
        sub2glob=sub2glob, valid=valid, owner=owner, boundary=boundary,
        bdist=bdist, bdist_cap=topo.bdist_cap, dof_owner=topo.dof_owner,
        g2l_keys=keys[order], g2l_locs=locs[order],
        membership=topo.membership, sizes=topo.sizes,
    )
    object.__setattr__(new, "rect", meta)
    return new


# -- device fast paths --------------------------------------------------------


def rect_gather(x: jnp.ndarray, meta) -> jnp.ndarray:
    """Global (n,) -> (n_sub, n_pad) in canvas layout; out-of-domain canvas
    slots read 0.  Pure pad/slice/reshape/transpose + one batch-row
    permutation.  Dispatches to the N-D box canvas (core/boxnd.py) when
    ``meta`` is a BoxMeta."""
    from .boxnd import BoxMeta, box_gather

    if isinstance(meta, BoxMeta):
        return box_gather(x, meta)
    x2 = x.reshape(meta.ny, meta.nx)
    xp = jnp.pad(x2, ((meta.m_r, meta.ny_p - meta.ny - meta.m_r),
                      (meta.m_c, meta.nx_p - meta.nx - meta.m_c)))
    G_r, G_c = meta.g_r * meta.pitch_r, meta.g_c * meta.pitch_c
    parts = []
    for a, b, org_r, org_c, _ks in meta.groups:
        Wd = lax.slice(xp, (org_r, org_c), (org_r + a * G_r, org_c + b * G_c))
        Wd = Wd.reshape(a, G_r, b, G_c).transpose(0, 2, 1, 3)
        T = Wd[:, :, : meta.h, : meta.w]
        parts.append(T.reshape(a * b, meta.h * meta.w))
    X = jnp.concatenate(parts, axis=0)[jnp.asarray(meta.perm)]
    if meta.n_pad > meta.h * meta.w:
        X = jnp.pad(X, ((0, 0), (0, meta.n_pad - meta.h * meta.w)))
    return X


def rect_offset_decomp(offsets, meta):
    """Host: map each global stencil offset ``d`` (col = row + d on the
    row-major (ny, nx) dof grid) to its canvas-local offset ``dr*w + dc``.

    Returns a list of (dr, dc) or None when any offset does not decompose
    into a small-|dc| grid step (-> general extraction path).
    """
    from .boxnd import BoxMeta, box_offset_decomp

    if isinstance(meta, BoxMeta):
        return box_offset_decomp(offsets, meta)
    out = []
    for d in offsets:
        d = int(d)
        dr = int(np.round(d / meta.nx)) if meta.nx else 0
        dc = d - dr * meta.nx
        if abs(dc) > max(4, meta.w // 4) or not (-meta.h < dr < meta.h):
            return None
        out.append((dr, dc))
    return out


def _rect_window_masks(decomp, meta) -> np.ndarray:
    """Host: (m, n_pad) bool — slot k's entry at canvas slot l is kept only
    when the neighbour slot l + dr*w + dc stays inside the (h, w) canvas
    window (crossing a canvas row is a different dof entirely)."""
    from .boxnd import BoxMeta, box_window_masks

    if isinstance(meta, BoxMeta):
        return box_window_masks(decomp, meta)
    lr, lc = np.divmod(np.arange(meta.h * meta.w), meta.w)
    masks = np.zeros((len(decomp), meta.n_pad), dtype=bool)
    for k, (dr, dc) in enumerate(decomp):
        ok = ((lr + dr >= 0) & (lr + dr < meta.h)
              & (lc + dc >= 0) & (lc + dc < meta.w))
        masks[k, : meta.h * meta.w] = ok
    return masks


def rect_dense_from_stencil(
    valsT: jnp.ndarray,
    valid: jnp.ndarray,
    meta: RectMeta,
    decomp,
    window_masks: np.ndarray,
    unit_padding_diag: bool = True,
) -> jnp.ndarray:
    """Scatter-free batched dense subdomain extraction for offset-aligned
    stencil operators on the rect canvas.

    The general ``extract_subdomain_dense`` places (n_sub, n_pad, m) gathered
    row values into the dense batch with one ``at[].add`` — a ~2M-element
    scatter that executes element-at-a-time on this backend (~0.5 s at the
    384²/256 bench, measured round 3).  Here instead, for each stencil slot
    (global column offset d = dr*nx + dc): the slot's global value stream
    ``valsT[k]`` IS the subdomain-dense diagonal at constant local offset
    ``o = dr*w + dc`` (the canvas makes local index = (r-a_r)*w + (c-a_c), so
    global grid steps are constant local steps).  Each slot is rect_gather'd
    (pure layout transform), masked (both endpoints valid + neighbour inside
    the canvas window), accumulated into a (n_sub, n_pad, n_pad+1) band
    array, and the band is placed onto the dense diagonals with the classic
    stride-(n_pad+1) flatten/shift/reshape — all bandwidth-bound, no gather
    or scatter anywhere.

    Exactness: identical entries to the general path (same values read from
    the same slots; masking reproduces the drop-outside-columns rule).
    """
    G = rect_slot_streams(valsT, valid, meta, decomp, window_masks)
    offs = canvas_local_offsets(decomp, meta)
    return rect_dense_place(G, valid, offs, unit_padding_diag)


def canvas_local_offsets(decomp, meta) -> list[int]:
    """Canvas-local flat offset of each decomposed stencil step."""
    from .boxnd import BoxMeta, box_local_offsets

    if isinstance(meta, BoxMeta):
        return box_local_offsets(decomp, meta)
    return [dr * meta.w + dc for dr, dc in decomp]


def rect_slot_streams(
    valsT: jnp.ndarray, valid: jnp.ndarray, meta, decomp, window_masks
) -> jnp.ndarray:
    """Stage 1 of the scatter-free extraction: the masked per-slot canvas
    streams, (m, n_sub, n_pad).  Bandwidth layout transforms over the full
    batch — small (m * n_sub * n_pad elements)."""
    n_pad = meta.n_pad
    offs = canvas_local_offsets(decomp, meta)
    wm = jnp.asarray(window_masks)
    gs = []
    for k, o in enumerate(offs):
        g = rect_gather(valsT[k], meta)  # (n_sub, n_pad)
        # neighbour validity: valid[:, l + o] with out-of-range -> False
        if o >= 0:
            nbr = jnp.pad(valid, ((0, 0), (0, o)))[:, o:]
        else:
            nbr = jnp.pad(valid, ((0, 0), (-o, 0)))[:, :n_pad]
        gs.append(jnp.where(valid & nbr & wm[k][None, :], g, 0.0))
    return jnp.stack(gs)


def rect_dense_place(
    G: jnp.ndarray,  # (m, n_slab, n_pad) masked slot streams
    valid: jnp.ndarray,  # (n_slab, n_pad)
    offs: list,
    unit_padding_diag: bool = True,
) -> jnp.ndarray:
    """Stage 2: place the slot streams onto the dense diagonals via the
    stride-(n_pad+1) band trick.  This is the HBM-heavy stage (the
    (n_slab, n_pad, n_pad+1) band array) — callers chunk the subdomain
    batch through it when the full batch would not fit (measured r4: the
    3-D bench's (512, 1000, 1001) one-shot exhausted HBM)."""
    n_sub, n_pad = valid.shape
    lo = min(min(offs), 0)
    width = n_pad + 1
    U = jnp.zeros((n_sub, n_pad, width), G.dtype)
    for k, o in enumerate(offs):
        U = U.at[:, :, o - lo].add(G[k])
    flat = U.reshape(n_sub, n_pad * width)
    # value of slot (i, o) sits at i*(n_pad+1) + (o - lo); the dense target
    # position is i*n_pad + (i + o) = i*(n_pad+1) + o  ->  shift by lo
    A = lax.slice(flat, (0, -lo), (n_sub, n_pad * n_pad - lo))
    A = A.reshape(n_sub, n_pad, n_pad)
    if unit_padding_diag:
        diag = jnp.where(valid, 0.0, 1.0).astype(A.dtype)
        A = A + jnp.eye(n_pad, dtype=A.dtype)[None, :, :] * diag[:, :, None]
    return A


def rect_gather_shard(
    x: jnp.ndarray, meta: RectMeta, axis: str, n_loc: int
) -> jnp.ndarray:
    """Sharded :func:`rect_gather`: inside ``shard_map`` over ``axis`` with
    the subdomain batch split in contiguous slabs, run the full-canvas
    layout transform (bandwidth-class — the canvas is only
    ``n_sub * n_pad`` elements, ~2 MB at bench scale) on the replicated
    global vector and slice this device's ``n_loc``-row slab.

    This keeps the rect fast path under multi-chip execution: the per-device
    cost is one canvas transform + one slice, flat in the device count —
    the property the reference's per-rank halo exchange has
    (dune/ddm/schwarz.hh:122-146)."""
    import jax

    X = rect_gather(x, meta)
    shard = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(X, shard * n_loc, n_loc, axis=0)


def rect_scatter_add_shard(
    x_loc: jnp.ndarray, meta: RectMeta, axis: str
) -> jnp.ndarray:
    """Sharded :func:`rect_scatter_add`: embed the device-local slab into a
    zero full batch (one dynamic_update_slice), run the full-canvas layout
    scatter, and ``psum`` the per-device partial sums over ICI.  Exactly the
    contributions of the unsharded path (zeros elsewhere add nothing);
    only the float summation ORDER differs across devices."""
    import jax

    from .boxnd import BoxMeta

    n_sub = (int(np.prod(meta.nparts)) if isinstance(meta, BoxMeta)
             else meta.n_pr * meta.n_pc)
    full = jnp.zeros((n_sub,) + x_loc.shape[1:], x_loc.dtype)
    shard = jax.lax.axis_index(axis)
    full = jax.lax.dynamic_update_slice_in_dim(
        full, x_loc, shard * x_loc.shape[0], axis=0
    )
    return jax.lax.psum(rect_scatter_add(full, meta), axis)


def rect_scatter_add(x_sub: jnp.ndarray, meta) -> jnp.ndarray:
    """(n_sub, n_pad) canvas-layout -> global (n,) by summation — the exact
    adjoint of :func:`rect_gather` (out-of-domain canvas slots are dropped,
    so callers must keep them zero, which ``valid``-masked math does)."""
    from .boxnd import BoxMeta, box_scatter_add

    if isinstance(meta, BoxMeta):
        return box_scatter_add(x_sub, meta)
    G_r, G_c = meta.g_r * meta.pitch_r, meta.g_c * meta.pitch_c
    X = x_sub[:, : meta.h * meta.w]
    acc = jnp.zeros((meta.ny_p, meta.nx_p), x_sub.dtype)
    for a, b, org_r, org_c, ks in meta.groups:
        T = X[jnp.asarray(ks)].reshape(a, b, meta.h, meta.w)
        T = jnp.pad(T, ((0, 0), (0, 0), (0, G_r - meta.h),
                        (0, G_c - meta.w)))
        block = T.transpose(0, 2, 1, 3).reshape(a * G_r, b * G_c)
        acc = acc + jnp.pad(
            block, ((org_r, meta.ny_p - org_r - a * G_r),
                    (org_c, meta.nx_p - org_c - b * G_c)))
    out = lax.slice(acc, (meta.m_r, meta.m_c),
                    (meta.m_r + meta.ny, meta.m_c + meta.nx))
    return out.reshape(-1)
