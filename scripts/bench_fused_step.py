"""Locate the 117M full-step compile failure with the fused MLP live:
depth ablation + retry (the remote-compile relay 500s on oversized graphs).
Run alone: python scripts/bench_fused_step.py [depth ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_ablate import run_case

depths = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
for d in depths:
    run_case(f"117m-shape depth={d} drop0.1 fused-mlp", remat=False,
             rng_impl="rbg", depth=d, iters=10)
