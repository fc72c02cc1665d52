"""Round-2 batch scaling at 117M now that dropout masks left the residuals."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_ablate import run_case

run_case("b16 no-remat drop0.1", remat=False, batch=16, rng_impl="rbg")
run_case("b32 no-remat drop0.1", remat=False, batch=32, rng_impl="rbg")
run_case("b32 remat-dots drop0.1", remat=True, remat_policy="dots", batch=32, rng_impl="rbg")
run_case("b64 remat-dots drop0.1", remat=True, remat_policy="dots", batch=64, rng_impl="rbg")
