"""Round-4 attack on the 117M fusion floor (VERDICT r3 item 3).

docs/performance.md quantifies the non-attention trunk at ~70% of the pure
matmul-chain ceiling, taxed by the LN/gelu reduction passes. This script
measures, in ONE chip hold, the full fwd+bwd+AdamW TRUNK step (8 blocks,
b8 x N2048 x D1024 x H16, bf16, dropout 0.1 — the 117M trunk, ~85% of the
full step) under each candidate:

  A. base          — unrolled blocks (shipped path; the control)
  B. scan          — lax.scan over stacked per-layer params (cross-layer
                     scheduling / one compiled block body)
  C. gelu_tanh     — tanh-approx GELU instead of exact erf (numerics
                     deviation from torch reference; probe only)
  D. no_ln         — LayerNorms replaced by identity: the UPPER BOUND on
                     what any LN-fusion scheme (LN-into-qkv/fc1 prologue,
                     LN+matmul epilogue kernels) could recover in the FULL
                     training step. If this bound is small, the fused-kernel
                     variants are dead on arrival (they additionally pay the
                     custom-call fusion barrier that sank the fused MLP,
                     docs/performance.md "Fused MLP — tried, reverted").
  E. no_ln_no_gelu — D plus linear MLP activation: the combined
                     reduction+gelu tax bound.

Exit 7 on chip-claim failure (shell-loop in fresh interpreters).
Results append to /tmp/bench_r4_fusion.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.environ.get("ORBIT2_R4_OUT", "/tmp/bench_r4_fusion.json")
if os.environ.get("ORBIT2_R4_SMOKE"):  # CPU correctness smoke
    B, N, D, H, DEPTH, ITERS = 2, 128, 64, 2, 2, 2
else:
    B, N, D, H, DEPTH, ITERS = 8, 2048, 1024, 16, 8, 20
PEAK = 197e12


def record(r):
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows.append(r)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
    print("RECORD", json.dumps(r), flush=True)


def trunk_flops():
    # per-block fwd matmul FLOPs: qkv 2*N*D*3D, attn 2*2*N*N*D, proj 2*N*D*D,
    # mlp 2*2*N*D*4D  (x3 for fwd+bwd, xB batch, xDEPTH layers)
    per_block = 2 * N * D * (3 * D) + 4 * N * N * D + 2 * N * D * D \
        + 4 * N * D * (4 * D)
    return 3 * B * DEPTH * per_block


def build_step(variant):
    import jax
    import jax.numpy as jnp
    import optax

    from orbit2_tpu.models.components import blocks as blocks_mod
    from orbit2_tpu.models.components.blocks import Block

    # --- variant patches (bench-only; restored by caller): rebind the
    # module-level `nn` name inside blocks.py through a forwarding shim
    if variant == "gelu_tanh":
        blocks_mod.nn = _PatchedNN(blocks_mod.nn, gelu_tanh=True)
    elif variant == "no_ln":
        blocks_mod.nn = _PatchedNN(blocks_mod.nn, ln_identity=True)
    elif variant == "no_ln_no_gelu":
        blocks_mod.nn = _PatchedNN(blocks_mod.nn, ln_identity=True,
                                   gelu_identity=True)

    block = Block(dim=D, num_heads=H, mlp_ratio=4.0, qkv_bias=True,
                  init_values=1e-5, drop_path=0.1, proj_drop=0.1,
                  attn_drop=0.1, attention_impl="auto", dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    y = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)

    key0 = jax.random.PRNGKey(0)
    if variant == "scan":
        # stacked per-layer params, one compiled body
        layer_params = [
            block.init({"params": jax.random.fold_in(key0, i)}, x,
                       deterministic=True)["params"] for i in range(DEPTH)
        ]
        params = jax.tree.map(lambda *ps: jnp.stack(ps), *layer_params)

        def trunk(p, xb, key):
            keys = jax.random.split(key, DEPTH)

            def body(tokens, sl):
                pl_, kl = sl
                k1, k2 = jax.random.split(kl)
                out = block.apply(
                    {"params": pl_}, tokens, False,
                    rngs={"dropout": k1, "drop_path": k2})
                return out, None

            out, _ = jax.lax.scan(body, xb, (p, keys))
            return out
    else:
        params = {f"b{i}": block.init(
            {"params": jax.random.fold_in(key0, i)}, x,
            deterministic=True)["params"] for i in range(DEPTH)}

        def trunk(p, xb, key):
            for i in range(DEPTH):
                k1, k2 = jax.random.split(jax.random.fold_in(key, i))
                xb = block.apply({"params": p[f"b{i}"]}, xb, False,
                                 rngs={"dropout": k1, "drop_path": k2})
            return xb

    tx = optax.adamw(1e-4, b1=0.9, b2=0.99, weight_decay=1e-5,
                     mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)

    def loss_fn(p, xb, yb, key):
        out = trunk(p, xb, key)
        return jnp.mean((out.astype(jnp.float32)
                         - yb.astype(jnp.float32)) ** 2)

    @jax.jit
    def step(p, s, xb, yb, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb, key)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    return step, params, opt_state, x, y


class _PatchedNN:
    """Attribute-forwarding shim over flax.linen with LayerNorm (and
    optionally gelu) replaced — bench-only monkeypatch."""

    def __init__(self, real_nn, ln_identity=False, gelu_identity=False,
                 gelu_tanh=False):
        # unwrap prior shims so variants don't stack
        while isinstance(real_nn, _PatchedNN):
            real_nn = real_nn._real
        self._real = real_nn
        self._ln_identity = ln_identity
        self._gelu_identity = gelu_identity
        self._gelu_tanh = gelu_tanh

    def __getattr__(self, name):
        if name == "LayerNorm" and self._ln_identity:
            def make(*a, **kw):
                return lambda x: x  # callable like an applied module

            return make
        if name == "gelu":
            if self._gelu_identity:
                return lambda x, approximate=False: x
            if self._gelu_tanh:
                real = self._real
                return lambda x, approximate=False: real.gelu(
                    x, approximate=True)
        return getattr(self._real, name)


def measure(variant):
    import jax

    from orbit2_tpu.models.components import blocks as blocks_mod

    saved_nn = blocks_mod.nn
    try:
        step, params, opt_state, x, y = build_step(variant)
        key = jax.random.key(1, impl="rbg")
        import jax.numpy as jnp  # noqa: F401

        for _ in range(3):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, x, y, sub)
        l0 = float(loss)  # tunnel sync via readback
        t0 = time.perf_counter()
        for _ in range(ITERS):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, x, y, sub)
        lf = float(loss)
        dt = (time.perf_counter() - t0) / ITERS
        return {"case": variant, "ms": round(dt * 1e3, 2),
                "trunk_mfu": round(trunk_flops() / dt / PEAK, 4),
                "loss0": round(l0, 5), "loss": round(lf, 5)}
    finally:
        blocks_mod.nn = saved_nn


def main():
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        print(f"claim failed: {e}", flush=True)
        raise SystemExit(7)
    print("backend:", backend, flush=True)

    for variant in ("base", "scan", "gelu_tanh", "no_ln", "no_ln_no_gelu"):
        try:
            record(measure(variant))
        except Exception as e:
            record({"case": variant,
                    "error": f"{type(e).__name__}: {str(e)[:300]}"})
    print("R4 FUSION DONE", flush=True)


if __name__ == "__main__":
    main()
