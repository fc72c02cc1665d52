"""Round-3b follow-up: the cases bench_r3b_all.py poisoned with leftover
1B HBM residency — run them FRESH, smallest first, gc between.

  C. Trainer-harness throughput at 117M (RESOURCE_EXHAUSTED after the 1B
     sweep left buffers resident).
  B'. effective-batch-32 dots-remat variants (their compile-helper 500s may
      have been residency, not true HBM pressure).

Exit 7 on claim failure; shell-loop in fresh interpreters.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_r3b_followup.py
"""

import gc
import json
import os

import jax

# write to a separate file so the main sweep's saved results survive
os.environ.setdefault("ORBIT2_R3B_OUT", "/tmp/r3b_followup.json")

from bench_r3b_all import RESULTS, measure_1b, record, trainer_harness  # noqa: F401,E402


def main():
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)

    try:
        record(trainer_harness())
    except Exception as e:
        record(dict(case="C_trainer_harness_117m",
                    error=f"{type(e).__name__}: {str(e)[:300]}"))
    gc.collect()

    for kw in [
        dict(tag="B_mb2_acc16_dots_mu16", batch=2, grad_accum=16,
             remat=True, policy="dots", mu_dtype="bfloat16"),
        dict(tag="B_mb4_acc8_dots_mu16", batch=4, grad_accum=8,
             remat=True, policy="dots", mu_dtype="bfloat16"),
    ]:
        try:
            r = measure_1b(**kw)
        except Exception as e:
            r = dict(case=kw["tag"],
                     error=f"{type(e).__name__}: {str(e)[:200]}")
        record(r)
        gc.collect()
    print("R3B FOLLOWUP DONE", flush=True)


if __name__ == "__main__":
    main()
