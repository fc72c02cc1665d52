"""Long-context 117M TRAIN step on one chip (full fwd+bwd+adamw).

The TILES div4 full-globe tile at 0.25 degrees is ~16k tokens at patch 2
(SURVEY.md section 5 long-context). Kernel-level long-context was measured
fwd-only in round 1 (47-60 TFLOPS at 16-32k, docs/performance.md); this
measures the COMPLETE training step — flash backward included — at 8k and
32k tokens, bracketing the tile sizes tiled training actually runs.
Run alone (owns the chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import DEFAULT_VARS, OUT_VARS, bench_scale  # noqa: E402

PEAK = 197e12


def main():
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("needs the TPU chip")
        return
    results = []
    for batch, img in ((2, (128, 256)), (1, (256, 512))):
        tokens = (img[0] // 2) * (img[1] // 2)
        dt, n_params, loss = bench_scale(
            embed=1024, depth=8, heads=16, batch=batch, img=img,
            remat=False, dtype=jnp.bfloat16, iters=10)
        trunk = 6.0 * n_params * tokens * batch
        # per layer fwd: QK^T + PV = 4*B*N^2*D_embed; x depth, x3 for bwd
        attn = 3.0 * 4.0 * 8 * batch * tokens * tokens * 1024
        rec = {
            "tokens": tokens, "batch": batch,
            "ms_per_step": round(dt * 1e3, 1),
            "tokens_per_sec": round(tokens * batch / dt),
            "mfu_6np": round(trunk / dt / PEAK, 4),
            "mfu_incl_attn": round((trunk + attn) / dt / PEAK, 4),
            "loss": float(loss),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
