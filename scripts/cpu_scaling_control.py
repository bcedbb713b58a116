"""Hardware control for the --scaling proxy: measure how much of an
N→4N *process* scale-up this VM actually delivers for pure CPU-bound
work (numpy dot products, no Spark, no IO, no shuffle). If this
control itself scales at e << 1, the environment — host contention /
throttling, not the engine — is the binding cap for any same-day
Spark measurement, and the honest efficiency claim for the engine is
(spark efficiency) / (control efficiency), bounded by the control.

Usage: python scripts/cpu_scaling_control.py [lo] [hi]   (default 4 16)
Interleaves levels best-of-3 like bench.py --scaling.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

# Pin BLAS to ONE thread per worker: this container's OpenBLAS runs up
# to 2 threads per matmul, so an unpinned 4-process leg secretly used 8
# compute threads — halving the measurable 4→16 gap and making the
# "process scaling" control structurally pessimistic (~0.5 ceiling on
# 16 physical cores) independent of any throttling. The env var must be
# set before numpy loads, so workers use a SPAWN context (fresh
# interpreters inherit it); spawn cost sits outside the timed window.
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def _worker(n_iter: int) -> float:
    rng = np.random.default_rng(0)
    a = rng.standard_normal((256, 256))
    acc = 0.0
    for _ in range(n_iter):
        acc += float((a @ a).trace())
    return acc


def run_level(n_procs: int, total_iter: int = 12000) -> float:
    """Pool creation is EXCLUDED from the timed window: at ~16 procs
    process spawn costs a few hundred ms, which at the original 4800
    iterations (well under 1s of work on an unthrottled host) could
    dominate the high-parallelism leg and make the control report
    scaling that said nothing about the CPU. 2.5× the work + a
    pre-created, warmed pool keeps the measured region compute-only."""
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_procs) as pool:
        pool.map(_worker, [8] * n_procs)  # warm the workers
        t0 = time.perf_counter()
        pool.map(_worker, [total_iter // n_procs] * n_procs)
        return time.perf_counter() - t0


def control_efficiency(lo: int, hi: int, rounds: int = 3) -> dict:
    """Importable entry point (bench.py --scaling sandwiches its Spark
    measurement between these): returns the control's own N→4N scaling
    efficiency under the current VM conditions."""
    t_lo, t_hi = float("inf"), float("inf")
    for _ in range(rounds):
        t_lo = min(t_lo, run_level(lo))
        t_hi = min(t_hi, run_level(hi))
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "value": round(eff, 3),
        "sec": {str(lo): round(t_lo, 2), str(hi): round(t_hi, 2)},
    }


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    res = control_efficiency(lo, hi)
    print(
        json.dumps(
            {
                "metric": "pure-CPU process scaling control (no Spark)",
                "unit": "ratio",
                **res,
            }
        )
    )


if __name__ == "__main__":
    main()
