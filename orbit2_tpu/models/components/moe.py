"""Mixture-of-Experts MLP with expert parallelism over an `expert` mesh axis.

The reference has NO MoE (its Mlp is a dense fc1/fc2 chain, reference
models/hub/components/mlp.py:22-73); this module is a TPU-native upgrade in
the same spirit as the real seq axis and pipeline parallelism: it completes
the dp/fsdp/tp/sp/pp/ep parallelism taxonomy. Design follows the standard
TPU MoE recipe (Switch/GShard as published; einsum dispatch with a STATIC
capacity so every shape is compile-time constant):

  * Router: fp32 logits ``x @ router_kernel`` -> softmax -> top-k experts
    per token (k = 1 is Switch, k = 2 is GShard-style; gates renormalized
    over the chosen k when k > 1).
  * Capacity: each expert accepts at most ``C = ceil(L/E * capacity_factor
    * k)`` tokens per batch row, enforced by a cumulative-position mask.
    Tokens over capacity are DROPPED from the expert — the Block adds the
    MoE output residually, so a dropped token simply keeps its residual
    stream (the standard Switch behavior).
  * Dispatch/combine are one-hot einsums — no gather/scatter, no dynamic
    shapes, everything lands on the MXU.
  * Expert parallelism: the stacked expert weights ``wi [E, D, H]`` /
    ``wo [E, H, D]`` are sharded ``P("expert", ...)``
    (orbit2_tpu/parallel/sharding.py) and the [E, B, C, ...] dispatch
    tensors carry a matching sharding constraint, so GSPMD partitions the
    expert compute over the `expert` mesh axis and inserts the combine
    reduction itself. TP composes inside each expert: H is additionally
    column/row split over `tensor`, exactly like the dense Mlp.
  * Load-balance aux loss (Switch: E * sum_e f_e * p_e, == 1.0 when
    perfectly balanced) is sown into the "moe_loss" collection; the train
    step pops it and adds ``model.moe_aux_weight`` times its mean to the
    task loss (orbit2_tpu/training/train.py).

Router math stays fp32 regardless of the compute dtype (bf16 softmax
over experts is the classic MoE instability).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

AUX_COLLECTION = "moe_loss"


def _expert_sharding_constraint(t, batch_first: bool):
    """Constrain an [E, B, ...] (or [B, L, E, C]) tensor onto the ambient
    mesh's expert/data axes; no-op off-mesh (init, plain CPU tests)."""
    try:
        from jax.sharding import PartitionSpec as P

        from orbit2_tpu.parallel.mesh import AXIS_EXPERT, BATCH_AXES

        am = jax.sharding.get_abstract_mesh()
        names = am.axis_names or () if am is not None else ()
        if AXIS_EXPERT not in names or not any(
                int(s) > 1 for s in dict(am.shape).values()):
            return t
        if batch_first:  # [B, L, E, C]
            spec = P(BATCH_AXES, None, AXIS_EXPERT, None)
        else:            # [E, B, C, ...]
            spec = P(AXIS_EXPERT, BATCH_AXES)
        return jax.lax.with_sharding_constraint(t, spec)
    except Exception:
        return t


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for Mlp inside a transformer Block.

    Input/output: ``[B, L, D]``. Parameters:

      router_kernel [D, E]  (fp32, replicated)
      wi [E, D, H], bi [E, H]   — per-expert fc1
      wo [E, H, D], bo [E, D]   — per-expert fc2
    """

    dim: int
    hidden_features: int
    num_experts: int
    capacity_factor: float = 1.25
    top_k: int = 1
    drop: float = 0.0
    gelu_tanh: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.top_k not in (1, 2):
            raise ValueError(f"moe top_k must be 1 or 2, got {self.top_k}")
        if self.top_k > self.num_experts:
            raise ValueError(
                f"moe top_k ({self.top_k}) must be <= num_experts "
                f"({self.num_experts})")
        B, L, D = x.shape
        E, H, K = self.num_experts, self.hidden_features, self.top_k
        C = max(1, math.ceil(L / E * self.capacity_factor * K))
        C = min(C, L)

        init = nn.initializers.truncated_normal(
            stddev=0.02, lower=-2.0, upper=2.0)
        router_kernel = self.param(
            "router_kernel", init, (D, E), jnp.float32)
        wi = self.param("wi", init, (E, D, H), self.param_dtype)
        bi = self.param("bi", nn.initializers.zeros_init(), (E, H),
                        self.param_dtype)
        wo = self.param("wo", init, (E, H, D), self.param_dtype)
        bo = self.param("bo", nn.initializers.zeros_init(), (E, D),
                        self.param_dtype)

        probs = jax.nn.softmax(
            x.astype(jnp.float32) @ router_kernel, axis=-1)  # [B, L, E]

        # --- top-k assignment with per-round position bookkeeping -------
        combine = jnp.zeros((B, L, E, C), jnp.float32)
        counts = jnp.zeros((B, E), jnp.int32)  # tokens already placed
        remaining = probs
        gates, onehots = [], []
        for _ in range(K):
            idx = jnp.argmax(remaining, axis=-1)               # [B, L]
            oh = jax.nn.one_hot(idx, E, dtype=jnp.float32)     # [B, L, E]
            # mask the pick when every remaining prob is zero (fp32 softmax
            # underflow) so a round never re-places a token on expert 0
            alive = (jnp.max(remaining, axis=-1, keepdims=True)
                     > 0.0).astype(jnp.float32)
            oh = oh * alive
            gates.append(jnp.sum(probs * oh, axis=-1))         # [B, L]
            onehots.append(oh)
            remaining = remaining * (1.0 - oh)
        if K > 1:  # renormalize gates over the chosen experts
            denom = sum(gates)
            gates = [g / jnp.maximum(denom, 1e-9) for g in gates]
        for oh, gate in zip(onehots, gates):
            ohi = oh.astype(jnp.int32)
            # position of each token within its expert's queue this round,
            # offset by tokens placed in earlier rounds
            pos = counts[:, None, :] + jnp.cumsum(ohi, axis=1) - ohi  # [B,L,E]
            counts = counts + jnp.sum(ohi, axis=1)
            keep = (pos < C).astype(jnp.float32) * oh
            slot = jax.nn.one_hot(jnp.sum(pos * ohi, axis=-1), C,
                                  dtype=jnp.float32)            # [B, L, C]
            combine = combine + (gate[..., None, None]
                                 * keep[..., None] * slot[:, :, None, :])
        combine = _expert_sharding_constraint(combine, batch_first=True)
        dispatch = (combine > 0.0).astype(self.dtype)

        # --- expert FFN over [E, B, C, *] ------------------------------
        xin = jnp.einsum("blec,bld->ebcd", dispatch,
                         x.astype(self.dtype))                  # [E,B,C,D]
        xin = _expert_sharding_constraint(xin, batch_first=False)
        h = jnp.einsum("ebcd,edh->ebch", xin, wi.astype(self.dtype))
        h = h + bi.astype(self.dtype)[:, None, None, :]
        h = jax.nn.gelu(h, approximate=self.gelu_tanh)
        out = jnp.einsum("ebch,ehd->ebcd", h, wo.astype(self.dtype))
        out = out + bo.astype(self.dtype)[:, None, None, :]
        out = _expert_sharding_constraint(out, batch_first=False)
        y = jnp.einsum("blec,ebcd->bld", combine.astype(self.dtype), out)
        if self.drop > 0.0:
            # mirror the dense Mlp's proj dropout on the block output path
            y = nn.Dropout(rate=self.drop)(y, deterministic=deterministic)

        # --- load-balance aux loss (Switch) ----------------------------
        # f_e: fraction of tokens whose ROUND-0 choice is e; p_e: mean
        # router prob. E * sum(f*p) == 1.0 at perfect balance.
        f = jnp.mean(onehots[0], axis=(0, 1))
        p = jnp.mean(probs, axis=(0, 1))
        self.sow(AUX_COLLECTION, "aux", E * jnp.sum(f * p))
        return y.astype(self.dtype)
