"""MatrixMarket IO round trips + tetrahedral meshes end-to-end."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from ddm_tpu.core.io import read_matrix_market, write_matrix_market
from ddm_tpu.fem import read_msh
from ddm_tpu.fem import problems as prob
from ddm_tpu.fem.discretize import Discretization


def test_matrix_market_roundtrip(tmp_path):
    mm = """%%MatrixMarket matrix coordinate real general
3 3 5
1 1 2.0
1 2 -1.0
2 2 2.0
3 2 -1.0
3 3 2.0
"""
    pat, ell = read_matrix_market(mm)
    dense = pat.to_scipy(ell).toarray()
    np.testing.assert_allclose(
        dense, [[2, -1, 0], [0, 2, 0], [0, -1, 2]]
    )
    path = str(tmp_path / "a.mtx")
    write_matrix_market(path, pat, ell)
    pat2, ell2 = read_matrix_market(path)
    np.testing.assert_allclose(pat2.to_scipy(ell2).toarray(), dense)


@pytest.mark.parametrize("mesh,etype", [("unitcube.msh", "tet"),
                                        ("bar.msh", "tri"),
                                        ("lshape.msh", "tri")])
def test_reference_meshes_poisson(mesh, etype):
    path = f"/root/reference/data/{mesh}"
    if not os.path.exists(path):
        pytest.skip("mesh unavailable")
    grid = read_msh(path)
    assert grid.elem_type == etype
    if etype == "tet":
        x = grid.nodes[grid.elems]
        v = np.abs(np.linalg.det(x[:, 1:] - x[:, :1])).sum() / 6.0
        assert abs(v - 1.0) < 1e-6

    disc = Discretization(grid, prob.simple())
    A, rhs, g = disc.constrained_system()
    u = spla.spsolve(disc.pattern.to_scipy(A).tocsc(), np.asarray(rhs))
    assert np.isfinite(u).all() and u.max() > 0


def test_tet_mesh_ddm_solve():
    path = "/root/reference/data/unitcube.msh"
    if not os.path.exists(path):
        pytest.skip("mesh unavailable")
    from ddm_tpu.api import default_ptree, setup_problem, solve

    grid = read_msh(path)
    pt = default_ptree()
    pt["overlap"] = 2
    p = setup_problem(pt, problem=prob.simple(), grid=grid, n_sub=8)
    res = solve(p)
    assert bool(res.converged)
    assert int(res.iterations) <= 60
