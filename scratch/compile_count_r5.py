"""Compile-bill measurement (VERDICT r4 item 5): count the distinct jitted
programs a cold bench run compiles, and their total compile wall-clock, by
listening to jax's compile logs.  Run TWICE in fresh processes: the second
run shows what the persistent compile cache (~/.cache/ddm_tpu_jax) covers
across processes at bench shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site DDM_BENCH_ATTEMPTS=1 \
     timeout 5400 python scratch/compile_count_r5.py
"""

import logging
import os
import re
import time

os.environ.setdefault("DDM_BENCH_ATTEMPTS", "1")

import ddm_tpu  # noqa: F401
import jax

jax.config.update("jax_log_compiles", True)


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        m = re.search(
            r"Finished XLA compilation of jit\((.*?)\) in (\d+\.?\d*)", msg
        )
        if m:
            self.events.append((m.group(1), float(m.group(2))))


counter = CompileCounter()
for name in ("jax._src.dispatch", "jax._src.interpreters.pxla", "jax"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    lg.addHandler(counter)

import sys

sys.path.insert(0, "/root/repo")
import bench

t0 = time.perf_counter()
p = bench.build_problem(
    int(os.environ.get("DDM_BENCH_GRIDSIZE", "384")),
    int(os.environ.get("DDM_BENCH_PARTS", "16")),
    int(os.environ.get("DDM_BENCH_OVERLAP", "2")),
    int(os.environ.get("DDM_BENCH_NEV", "8")),
)
t_build = time.perf_counter() - t0
n_build = len(counter.events)
t0 = time.perf_counter()
tpu = bench.run_tpu(p, int(os.environ.get("DDM_BENCH_NEV", "8")))
t_run = time.perf_counter() - t0

total_compile = sum(t for _, t in counter.events)
print(f"\nbuild {t_build:.1f}s, tpu attempt(s) {t_run:.1f}s "
      f"(setup {tpu['setup']:.2f} solve {tpu['solve']:.2f} "
      f"iters {tpu['iters']})", flush=True)
print(f"distinct compile events: {len(counter.events)} "
      f"({n_build} during build), total compile time {total_compile:.1f}s",
      flush=True)
from collections import Counter

names = Counter(n for n, _ in counter.events)
for n, c in names.most_common(25):
    tt = sum(t for nm, t in counter.events if nm == n)
    print(f"  {c:3d}x {tt:8.1f}s  {n[:90]}", flush=True)
