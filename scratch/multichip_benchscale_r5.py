"""Bench-scale virtual-mesh parity run (VERDICT r4 item 6).

The largest multichip evidence this environment can produce: the 2-D bench
problem family at 192^2 (37k dofs) / 64 subdomains, solved end-to-end
sharded over an 8-device virtual CPU mesh through the public
api.solve(mesh=...) path, asserted against the single-device iterates, with
host peak-RSS recorded.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     timeout 3600 python scratch/multichip_benchscale_r5.py
"""

import resource
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ddm_tpu.api import build_preconditioner, default_ptree, setup_problem, solve
from ddm_tpu.core.mesh import subdomain_mesh
from ddm_tpu.fem import problems as pm


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    assert jax.device_count() >= 8, jax.devices()
    pt = default_ptree()
    pt["gridsize"] = 192
    pt["overlap"] = 2
    pt["coarsespace.type"] = "geneo"
    pt["geneo.eigensolver.nev"] = 8
    pt["geneo.eigensolver.threshold"] = -1.0
    pt["solver.reduction"] = 1e-8

    t0 = time.perf_counter()
    p = setup_problem(pt, problem=pm.islands(), parts=(8, 8))
    print(f"setup_problem {time.perf_counter() - t0:.1f}s  n={p.disc.n_dofs} "
          f"n_sub={p.topo.n_sub} n_pad={p.topo.n_pad}", flush=True)

    t0 = time.perf_counter()
    res_ref = solve(p)
    t_ref = time.perf_counter() - t0
    print(f"single-device: {int(res_ref.iterations)} its, "
          f"converged={bool(res_ref.converged)}, {t_ref:.1f}s, "
          f"rss {rss_mb():.0f} MB", flush=True)

    mesh = subdomain_mesh(8)
    t0 = time.perf_counter()
    res_sh = solve(p, mesh=mesh)
    t_sh = time.perf_counter() - t0
    x1, x2 = np.asarray(res_ref.x), np.asarray(res_sh.x)
    rel = np.linalg.norm(x1 - x2) / np.linalg.norm(x1)
    print(f"sharded(8):    {int(res_sh.iterations)} its, "
          f"converged={bool(res_sh.converged)}, {t_sh:.1f}s, "
          f"rss {rss_mb():.0f} MB", flush=True)
    print(f"solution rel diff: {rel:.2e}", flush=True)
    assert int(res_sh.iterations) == int(res_ref.iterations), (
        int(res_sh.iterations), int(res_ref.iterations))
    # the psum sums subdomain contributions in a different float order than
    # the single-device path; ~1e-10-class drift after 16 iterations at
    # contrast 1e6 is the expected effect (measured 2.9e-10)
    assert rel < 1e-8
    true_res = float(np.linalg.norm(
        np.asarray(p.A.mv(res_sh.x)) - np.asarray(p.rhs))
        / np.linalg.norm(np.asarray(p.rhs)))
    print(f"true rel residual (sharded): {true_res:.2e}", flush=True)
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    main()
