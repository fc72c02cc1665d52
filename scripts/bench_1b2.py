"""1B remat/batch sweep with the r2 kernels (north-star config)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_ablate import run_case

K = dict(embed=3072, depth=8, heads=24, img=(64, 128), rng_impl="rbg", iters=8)
run_case("1b b2 remat-full (r1 cfg)", batch=2, remat=True, **K)
run_case("1b b2 remat-dots", batch=2, remat=True, remat_policy="dots", **K)
run_case("1b b2 no-remat", batch=2, remat=False, **K)
run_case("1b b4 remat-dots", batch=4, remat=True, remat_policy="dots", **K)
