"""DDM setup orchestration: discretization -> partition -> topology.

The analogue of the reference's setup chain
``make_grid -> loadBalance -> make_communication ->
make_overlapping_communication`` (examples/poisson.cc:87-139 +
dune/ddm/pdelab_helper.hh:15-94 + overlap_extension.hh:54-285), collapsed
into pure host-side precomputation.
"""

from __future__ import annotations

import numpy as np

from ..fem.discretize import Discretization
from .indexmaps import (
    DDMTopology,
    build_topology,
    dof_membership_from_elems,
    dof_owner_lowest,
    partition_rcb,
    partition_structured,
)


def partition_elements(
    disc: Discretization,
    n_sub: int | None = None,
    parts: tuple[int, ...] | None = None,
) -> np.ndarray:
    """Element partition: structured block partition when the grid is
    structured and ``parts`` is given (YaspGrid PowerD equivalent), otherwise
    recursive coordinate bisection (ParMETIS replacement)."""
    grid = disc.grid
    if parts is not None:
        if grid.shape is None:
            raise ValueError("parts= requires a structured grid")
        return partition_structured(grid.shape, parts)
    if n_sub is None:
        raise ValueError("pass n_sub or parts")
    return partition_rcb(grid.elem_centroids(), n_sub)


def setup_topology(
    disc: Discretization,
    overlap: int,
    n_sub: int | None = None,
    parts: tuple[int, ...] | None = None,
    elem_part: np.ndarray | None = None,
    pad_to: int = 8,
) -> tuple[DDMTopology, np.ndarray]:
    """Build the overlapping DDM topology for a discretization.

    Returns (topology, elem_part)."""
    if elem_part is None:
        elem_part = partition_elements(disc, n_sub=n_sub, parts=parts)
    n_parts = int(elem_part.max()) + 1
    adj = disc.adjacency()
    dofs = disc.dof_tuples()
    M0 = dof_membership_from_elems(dofs, elem_part, disc.n_dofs, n_parts)
    owner = dof_owner_lowest(dofs, elem_part, disc.n_dofs)
    topo = build_topology(adj, M0, owner, overlap, pad_to=pad_to)
    topo = _try_rect_relayout(topo, disc, pad_to)
    return topo, elem_part


def _try_rect_relayout(topo, disc, pad_to):
    """Adopt the structured-rect canvas layout (core/structured.py) when the
    subdomains are uniform rectangles of a 2-D dof grid — gives the
    bandwidth gather/scatter fast path on the apply hot loop.  Data-driven:
    any failure of the rect checks keeps the general layout.

    Vector-valued Q1 spaces are covered too: dof id = node*n_comp + c with
    axis-0-fastest node numbering (fem/grids.py::nid) makes every subdomain
    a contiguous rect of the (n_nodes_slow, n_nodes_fast*n_comp) dof grid.
    Degree-2 spaces append mid-edge dofs after the nodes, so their dof sets
    are never rect scans — detection fails and they keep the general path.
    """
    from .structured import detect_rect_layout, relayout_rect

    shape = getattr(disc.grid, "shape", None)
    if shape is None:
        return topo
    nc = getattr(disc, "n_comp", 1)
    if len(shape) == 3:
        # 3-D box canvas (core/boxnd.py): axis-0-fastest numbering makes
        # the row-major dof grid (slow..fast) = (s2+1, s1+1, (s0+1)*nc)
        from .boxnd import detect_box_layout, relayout_box

        dims = (shape[2] + 1, shape[1] + 1, (shape[0] + 1) * nc)
        meta = detect_box_layout(topo, dims, pad_to=pad_to)
        if meta is not None:
            return relayout_box(topo, meta)
        return topo
    if len(shape) != 2:
        return topo
    # grids.py numbers nodes axis-0-fastest: flat = i0 + i1*(shape[0]+1),
    # i.e. rows = axis 1, cols = axis 0; try the transpose too in case a
    # caller-built grid numbered the other way round.
    for dof_grid in ((shape[1] + 1, (shape[0] + 1) * nc),
                     (shape[0] + 1, (shape[1] + 1) * nc)):
        meta = detect_rect_layout(topo, dof_grid, pad_to=pad_to)
        if meta is not None:
            return relayout_rect(topo, meta)
    # non-uniform anchor pitch (gridsize not divisible by parts): the 2-D
    # rect detector requires a uniform pitch, but the N-D box canvas
    # (core/boxnd.py) groups anchors into arithmetic runs and handles it —
    # same fast-path family, a few more slice groups
    from .boxnd import detect_box_layout, relayout_box

    for dof_grid in ((shape[1] + 1, (shape[0] + 1) * nc),
                     (shape[0] + 1, (shape[1] + 1) * nc)):
        meta = detect_box_layout(topo, dof_grid, pad_to=pad_to)
        if meta is not None:
            return relayout_box(topo, meta)
    return topo
