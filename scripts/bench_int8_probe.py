"""Does int8 quantization move the serving (fwd-only) floor?

The 1B deterministic forward sits at ~30% 2NP MFU, batch-flat, uniformly
~30%/layer (scripts/bench_1b_fwd_decompose.py; docs/performance.md). The
v5e MXU runs int8xint8->int32 at ~2x the bf16 rate (394 vs 197 TOPS), so a
w8a8 path has a 2x matmul ceiling IF (a) XLA actually lowers int8 dots to
the double-rate path and (b) the per-row dynamic activation quant + rescale
epilogues don't eat the win. Measure both before building anything:

  A. raw matmuls at the 1B trunk shapes, bf16 vs int8
  B. an 8-layer trunk-equivalent forward chain (LN + qkv + attention +
     proj + LN + fc1 + gelu + fc2, residuals), all-bf16 vs w8a8
     (attention itself stays bf16), for the 1B (D=3072,H=24) and 117M
     (D=1024,H=16) serving shapes — plus output RMSE between the two

Exit 7 on claim failure:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_probe.py; do sleep 60; done
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- part A

def bench_matmuls():
    rng = np.random.default_rng(0)
    results = []
    for m, k, n in [(4096, 3072, 9216), (4096, 3072, 3072),
                    (4096, 3072, 12288), (4096, 12288, 3072),
                    (16384, 1024, 4096), (16384, 4096, 1024)]:
        a16 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b16 = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)

        f_bf16 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        f_int8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))

        dt16 = time_fn(f_bf16, a16, b16)
        dt8 = time_fn(f_int8, a8, b8)
        fl = 2.0 * m * k * n
        r = dict(case=f"mm_{m}x{k}x{n}",
                 bf16_ms=round(dt16 * 1e3, 3), bf16_tf=round(fl / dt16 / 1e12, 1),
                 int8_ms=round(dt8 * 1e3, 3), int8_tops=round(fl / dt8 / 1e12, 1),
                 speedup=round(dt16 / dt8, 3))
        results.append(r)
        print(json.dumps(r), flush=True)
        del a16, b16, a8, b8
    return results


# ---------------------------------------------------------------- part B

def make_layer_params(rng, depth, d, mlp, dtype=jnp.bfloat16):
    ps = []
    for _ in range(depth):
        ps.append(dict(
            wqkv=jnp.asarray(rng.normal(0, 0.02, size=(d, 3 * d)), dtype),
            wo=jnp.asarray(rng.normal(0, 0.02, size=(d, d)), dtype),
            w1=jnp.asarray(rng.normal(0, 0.02, size=(d, mlp)), dtype),
            w2=jnp.asarray(rng.normal(0, 0.02, size=(mlp, d)), dtype),
            g1=jnp.ones((d,), jnp.float32), b1=jnp.zeros((d,), jnp.float32),
            g2=jnp.ones((d,), jnp.float32), b2=jnp.zeros((d,), jnp.float32),
        ))
    return ps


def quantize_w(w):  # per-output-channel symmetric int8
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s[None, :]),
                  -127, 127).astype(jnp.int8)
    return wq, s


def qdot(x, wq, ws):
    """w8a8: per-row dynamic activation quant, int8 MXU dot, rescale."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * ws[None, :]).astype(jnp.bfloat16)


def ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(jnp.bfloat16)


def layer_fwd(x, p, batch, heads, *, quant):
    m, d = x.shape
    n = m // batch
    dh = d // heads
    h = ln(x, p["g1"], p["b1"])
    if quant:
        qkv = qdot(h, p["wqkv_q"], p["wqkv_s"])
    else:
        qkv = h @ p["wqkv"]
    qkv = qkv.reshape(batch, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B,H,N,dh] bf16
    att = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                     preferred_element_type=jnp.float32) / np.sqrt(dh)
    att = jax.nn.softmax(att, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bhnm,bhmd->bhnd", att, v).transpose(0, 2, 1, 3)
    o = o.reshape(m, d)
    x = x + (qdot(o, p["wo_q"], p["wo_s"]) if quant else o @ p["wo"])
    h = ln(x, p["g2"], p["b2"])
    h1 = qdot(h, p["w1_q"], p["w1_s"]) if quant else h @ p["w1"]
    h1 = jax.nn.gelu(h1.astype(jnp.float32)).astype(jnp.bfloat16)
    x = x + (qdot(h1, p["w2_q"], p["w2_s"]) if quant else h1 @ p["w2"])
    return x


def bench_chain(tag, batch, n_tok, d, heads, mlp, depth=8, iters=10):
    # the 8-layer chain graph 500s the remote-compile relay; a shallower
    # chain measures the same per-layer epilogue tax
    depth = int(os.environ.get("ORBIT2_INT8_DEPTH", depth))
    rng = np.random.default_rng(1)
    ps = make_layer_params(rng, depth, d, mlp)
    for p in ps:
        for w in ("wqkv", "wo", "w1", "w2"):
            p[w + "_q"], p[w + "_s"] = quantize_w(p[w])
    x = jnp.asarray(rng.normal(size=(batch * n_tok, d)), jnp.bfloat16)

    # params are jit ARGUMENTS, not closure constants — closed-over weights
    # are baked into the StableHLO as literals and the remote-compile relay
    # rejects the multi-hundred-MB request body with HTTP 413
    def chain(ps_, x, quant):
        for p in ps_:
            x = layer_fwd(x, p, batch, heads, quant=quant)
        return x

    f16 = jax.jit(partial(chain, quant=False))
    f8 = jax.jit(partial(chain, quant=True))
    dt16 = time_fn(f16, ps, x, iters=iters)
    dt8 = time_fn(f8, ps, x, iters=iters)
    y16 = np.asarray(f16(ps, x), dtype=np.float32)
    y8 = np.asarray(f8(ps, x), dtype=np.float32)
    rel_rmse = float(np.sqrt(np.mean((y16 - y8) ** 2)) / (np.std(y16) + 1e-9))
    # matmul flops only (attention excluded from both equally)
    fl = 2.0 * batch * n_tok * depth * (d * 3 * d + d * d + 2 * d * mlp)
    r = dict(case=tag, depth=depth,
             bf16_ms=round(dt16 * 1e3, 2),
             bf16_mfu=round(fl / dt16 / PEAK_BF16, 4),
             int8_ms=round(dt8 * 1e3, 2),
             speedup=round(dt16 / dt8, 3),
             rel_rmse_vs_bf16=round(rel_rmse, 6))
    print(json.dumps(r), flush=True)
    return r


def main():
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)

    skip_mm = bool(int(os.environ.get("ORBIT2_INT8_SKIP_MM", "0")))
    results = {"matmuls": [] if skip_mm else bench_matmuls(), "chains": []}
    # 1B serving shape (b2 x 2048 tok, D=3072 H=24 mlp=4x)
    results["chains"].append(bench_chain("1b_b2", 2, 2048, 3072, 24, 12288))
    # 117M serving shape (b8 x 2048 tok, D=1024 H=16)
    results["chains"].append(bench_chain("117m_b8", 8, 2048, 1024, 16, 4096))
    with open("/tmp/int8_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print("INT8 PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
