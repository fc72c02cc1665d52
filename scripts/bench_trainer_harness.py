"""Production-path throughput: the shipped Trainer vs bench.py's raw loop.

Thin standalone entry for case C of scripts/bench_r3b_all.py (synthetic
on-disk dataset + Trainer.fit at the 117M bench shape); the implementation
lives there so the dataset writer / config / measurement can't diverge
between scripts. Result interpretation: on the axon tunnel the gap vs the
raw loop is relay H2D bandwidth, not harness logic (docs/performance.md
"Trainer-vs-raw-loop").

Exit 7 on claim failure; retry in fresh interpreters:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_trainer_harness.py; do sleep 60; done
"""

import json
import os

import jax

os.environ.setdefault("ORBIT2_R3B_OUT", "/tmp/bench_harness.json")

from bench_r3b_all import record, trainer_harness  # noqa: E402


def main():
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)
    record(trainer_harness())


if __name__ == "__main__":
    main()
