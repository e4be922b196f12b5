"""Grids: structured tensor-product grids and the common grid container.

Replaces the reference's grid layer (dune-grid YaspGrid / UGGrid+GmshReader,
used via examples/ddm_utilities.hh:33-171 ``make_grid``).  A grid here is a
plain host-side container of node coordinates and element connectivity —
device code never sees the grid, only index maps and batched element arrays
derived from it.

Element types and local node orderings:

* ``tri``  — P1 triangles, nodes (v0, v1, v2)
* ``tet``  — P1 tetrahedra, nodes (v0..v3)
* ``quad`` — Q1 quadrilaterals, tensor-product (lexicographic) ordering:
             (x0y0, x1y0, x0y1, x1y1) — matching DUNE's reference cube
* ``hex``  — Q1 hexahedra, lexicographic (z fastest-varying last):
             (000,100,010,110,001,101,011,111)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

ELEM_NODES = {"tri": 3, "tet": 4, "quad": 4, "hex": 8}
ELEM_DIM = {"tri": 2, "tet": 3, "quad": 2, "hex": 3}

# local faces (for DG skeleton terms and boundary identification), as tuples of
# local node indices; orientation is irrelevant for our use.
ELEM_FACES = {
    "tri": ((0, 1), (1, 2), (2, 0)),
    "quad": ((0, 1), (1, 3), (3, 2), (2, 0)),
    "tet": ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)),
    "hex": (
        (0, 1, 2, 3),  # z=0
        (4, 5, 6, 7),  # z=1
        (0, 1, 4, 5),  # y=0
        (2, 3, 6, 7),  # y=1
        (0, 2, 4, 6),  # x=0
        (1, 3, 5, 7),  # x=1
    ),
}


@dataclass
class Grid:
    nodes: np.ndarray  # (n_nodes, dim) float64
    elems: np.ndarray  # (n_elems, nodes_per_elem) int64
    elem_type: str
    # structured-grid metadata (cells per axis); None for unstructured grids
    shape: tuple[int, ...] | None = None
    _boundary_nodes: np.ndarray | None = field(default=None, repr=False)

    @property
    def dim(self) -> int:
        return ELEM_DIM[self.elem_type]

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]

    def elem_centroids(self) -> np.ndarray:
        return self.nodes[self.elems].mean(axis=1)

    def boundary_nodes(self) -> np.ndarray:
        """Boolean mask of nodes on the domain boundary.

        A face is on the boundary iff it belongs to exactly one element.
        """
        if self._boundary_nodes is not None:
            return self._boundary_nodes
        faces = ELEM_FACES[self.elem_type]
        all_faces = np.concatenate(
            [np.sort(self.elems[:, list(f)], axis=1) for f in faces], axis=0
        )
        uniq, counts = np.unique(all_faces, axis=0, return_counts=True)
        bnodes = np.unique(uniq[counts == 1].ravel())
        mask = np.zeros(self.n_nodes, dtype=bool)
        mask[bnodes] = True
        self._boundary_nodes = mask
        return mask


def structured_grid(
    cells: tuple[int, ...],
    lower: tuple[float, ...] | None = None,
    upper: tuple[float, ...] | None = None,
    simplex: bool = False,
) -> Grid:
    """Tensor-product grid on a box (YaspGrid equivalent).

    ``cells`` gives the number of cells per axis (len 2 -> quads, 3 -> hexes).
    ``simplex=True`` splits each 2D cell into two triangles
    (StructuredGridFactory::createSimplexGrid equivalent, used by the
    reference's nonlinear example).
    """
    dim = len(cells)
    lower = lower or (0.0,) * dim
    upper = upper or (1.0,) * dim
    axes = [np.linspace(lower[d], upper[d], cells[d] + 1) for d in range(dim)]
    # node index (i0,i1[,i2]) -> flat id with axis 0 fastest
    mesh = np.meshgrid(*axes, indexing="ij")
    nodes = np.stack([m.ravel(order="F") for m in mesh], axis=-1)
    nshape = tuple(c + 1 for c in cells)

    def nid(*idx):
        f = 0
        stride = 1
        for d in range(dim):
            f = f + idx[d] * stride
            stride *= nshape[d]
        return f

    if dim == 2:
        nx, ny = cells
        i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        i, j = i.ravel(order="F"), j.ravel(order="F")
        elems = np.stack(
            [nid(i, j), nid(i + 1, j), nid(i, j + 1), nid(i + 1, j + 1)], axis=-1
        )
        et = "quad"
    elif dim == 3:
        nx, ny, nz = cells
        i, j, k = np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        )
        i, j, k = i.ravel(order="F"), j.ravel(order="F"), k.ravel(order="F")
        elems = np.stack(
            [
                nid(i, j, k),
                nid(i + 1, j, k),
                nid(i, j + 1, k),
                nid(i + 1, j + 1, k),
                nid(i, j, k + 1),
                nid(i + 1, j, k + 1),
                nid(i, j + 1, k + 1),
                nid(i + 1, j + 1, k + 1),
            ],
            axis=-1,
        )
        et = "hex"
    else:
        raise ValueError("structured_grid supports dim 2 and 3")
    if simplex:
        if dim != 2:
            raise NotImplementedError("simplex splitting only in 2D")
        q = elems.astype(np.int64)
        tris = np.concatenate([q[:, [0, 1, 3]], q[:, [0, 3, 2]]], axis=0)
        return Grid(nodes=nodes, elems=tris, elem_type="tri", shape=None)
    return Grid(nodes=nodes, elems=elems.astype(np.int64), elem_type=et, shape=cells)


def refine(grid: Grid, times: int = 1) -> Grid:
    """Uniform refinement (structured grids only for now)."""
    if times == 0:
        return grid
    if grid.shape is None:
        raise NotImplementedError("refine currently requires a structured grid")
    cells = tuple(c * (2**times) for c in grid.shape)
    lo = tuple(grid.nodes.min(axis=0))
    hi = tuple(grid.nodes.max(axis=0))
    return structured_grid(cells, lo, hi)
