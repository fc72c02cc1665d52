"""Isolate which combination breaks the relay compile with fused MLP live."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from scripts.bench_ablate import run_case

run_case("d2 fwd-only fused", remat=False, depth=2, fwd_only=True, iters=5)
run_case("d2 drop0 fused", remat=False, depth=2, drop=0.0, rng_impl="rbg",
         iters=5)
run_case("d2 attn=xla drop0.1 fused", remat=False, depth=2, attn="xla",
         rng_impl="rbg", iters=5)
run_case("d2 fp32 drop0.1 fused", remat=False, depth=2, dtype=jnp.float32,
         rng_impl="rbg", iters=5)
