"""Round-2 step decomposition at 117M with the new kernels."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_ablate import run_case

run_case("base remat-off drop0.1 rbg", remat=False, rng_impl="rbg")
run_case("no dropout at all", remat=False, drop=0.0, rng_impl="rbg")
run_case("attn=xla drop0.1", remat=False, attn="xla", rng_impl="rbg")
run_case("fwd only (deterministic)", remat=False, fwd_only=True)
