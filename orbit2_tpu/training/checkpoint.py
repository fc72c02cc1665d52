"""Checkpoint save/restore (Orbax) + PyTorch-checkpoint import.

Replaces the reference's per-TP-rank torch.save files
(`interm_epoch_<e>.ckpt[_rank_r]`, reference intermediate_downscaling.py:
775-791) with Orbax sharded checkpoints: every device writes its own param
shards, no full-state gather, resume re-shards onto any mesh.

`import_torch_state_dict` is the parity bridge: converts a reference
Res_Slim_ViT torch state_dict (loaded offline into an .npz of numpy arrays)
into this framework's param pytree, reproducing the reference's pretrain
key-filtering and pos-embed interpolation semantics
(intermediate_downscaling.py:116-153).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(path: str, state: Dict[str, Any], async_save: bool = False):
    """state: pytree of arrays + scalars (params, opt_state, epoch, ...).

    async_save=True overlaps the write with the next training steps (Orbax
    AsyncCheckpointer) — the recovery story the reference lacks beyond
    blocking epoch-end torch.save (SURVEY.md §5). Writes are atomic either
    way (Orbax commits via rename)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        if async_save:
            ckptr = _async_checkpointer()
            ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        else:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, state, force=True)
            ckptr.wait_until_finished()
    else:  # pragma: no cover
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(path + ".npz", treedef=str(treedef),
                 **{str(i): np.asarray(x) for i, x in enumerate(flat)})


def wait_for_async_saves():
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def prune_checkpoints(directory: str, keep_last: int, prefix: str = "epoch_",
                      current_epoch: Optional[int] = None):
    """Keep only the newest `keep_last` epoch checkpoints.

    With async saves the newest directory may not be committed yet, so when
    `current_epoch` is given the cutoff is epoch-number-based
    (delete <= current_epoch - keep_last) rather than existence-based —
    Orbax serializes saves, so everything at or below the cutoff is durable.
    """
    import shutil

    if not os.path.isdir(directory) or keep_last <= 0:
        return
    epochs = []
    for name in os.listdir(directory):
        if name.startswith(prefix):
            try:
                epochs.append((int(name[len(prefix):]), name))
            except ValueError:
                continue
    if current_epoch is not None:
        doomed = [n for e, n in epochs if e <= current_epoch - keep_last]
    else:
        doomed = [n for _, n in sorted(epochs)[:-keep_last]]
    for name in doomed:
        shutil.rmtree(os.path.join(directory, name), ignore_errors=True)


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def latest_checkpoint(directory: str, prefix: str = "epoch_") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_e = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix):
            try:
                e = int(name[len(prefix):])
            except ValueError:
                continue
            if e > best_e:
                best, best_e = os.path.join(directory, name), e
    return best


def load_pretrained_params(params, pretrained, patch_size: int,
                           img_size=None, strict: bool = False):
    """Fine-tune import with the reference's filtering semantics
    (intermediate_downscaling.py:116-153, era5_daymet_downscaling.py:56-81):
      * keys absent from the target model are dropped
      * shape-mismatched keys are dropped, EXCEPT pos_embed which is
        bicubically resized to the target grid
    Returns (merged_params, report dict of {used, dropped, resized}).
    """
    import jax.tree_util as jtu

    from orbit2_tpu.ops.pos_embed import interpolate_pos_embed_checkpoint
    from orbit2_tpu.parallel.pipeline import (
        STACKED_IV_KEY, STACKED_KEY, from_interleaved, stack_block_params,
        to_interleaved, unstack_block_params)

    # Layout interop with the pipelined trunk (parallel/pipeline.py): a
    # pipelined model stores blocks STACKED under "blocks_stacked"
    # ([depth, ...]) or — with an interleaved schedule — under
    # "blocks_stacked_iv" ([V, S, dc, ...], a pure C-order reshape of the
    # canonical stack); a vanilla model stores per-block blocks_{i}
    # subtrees. Convert the SOURCE to the target's layout so fine-tuning
    # works across all pairs (depth mismatches then fall out as ordinary
    # shape/missing drops below).
    try:
        tgt_keys = set(params)
        src_keys = set(pretrained)
        # 1) normalize an interleaved source to the canonical stack
        if STACKED_IV_KEY in src_keys:
            pretrained = dict(pretrained)
            pretrained[STACKED_KEY] = from_interleaved(
                pretrained.pop(STACKED_IV_KEY))
            src_keys = set(pretrained)
        # 2) shape the source like the target
        if STACKED_IV_KEY in tgt_keys:
            if STACKED_KEY not in src_keys and any(
                    k.startswith("blocks_") for k in src_keys):
                pretrained = stack_block_params(pretrained)
                src_keys = set(pretrained)
            if STACKED_KEY in src_keys:
                lead = jtu.tree_leaves(params[STACKED_IV_KEY])[0].shape
                pretrained = dict(pretrained)
                pretrained[STACKED_IV_KEY] = to_interleaved(
                    pretrained.pop(STACKED_KEY), stages=lead[1],
                    interleave=lead[0])
        elif STACKED_KEY in tgt_keys and STACKED_KEY not in src_keys and any(
                k.startswith("blocks_") for k in src_keys):
            pretrained = stack_block_params(pretrained)
        elif STACKED_KEY in src_keys and STACKED_KEY not in tgt_keys:
            pretrained = unstack_block_params(pretrained)
    except (TypeError, ValueError):
        pass  # non-dict trees or irregular layouts: fall through unconverted

    flat_t, treedef = jtu.tree_flatten_with_path(params)
    tgt = {tuple(str(getattr(k, "key", k)) for k in path): leaf
           for path, leaf in flat_t}
    flat_p, _ = jtu.tree_flatten_with_path(pretrained)
    src = {tuple(str(getattr(k, "key", k)) for k in path): leaf
           for path, leaf in flat_p}

    used, dropped, resized = [], [], []
    merged = dict(tgt)
    for key, val in src.items():
        if key not in tgt:
            dropped.append(("missing", key))
            continue
        want = tgt[key].shape
        if tuple(val.shape) == tuple(want):
            merged[key] = np.asarray(val, dtype=tgt[key].dtype)
            used.append(key)
        elif key[-1] == "pos_embed" and img_size is not None:
            merged[key] = np.asarray(
                interpolate_pos_embed_checkpoint(np.asarray(val), patch_size,
                                                 img_size),
                dtype=tgt[key].dtype)
            resized.append(key)
        else:
            dropped.append(("shape", key))
            if strict:
                raise ValueError(f"shape mismatch for {key}: {val.shape} vs {want}")

    leaves = [merged[tuple(str(getattr(k, "key", k)) for k in path)]
              for path, _ in flat_t]
    out = jtu.tree_unflatten(treedef, leaves)
    return out, {"used": used, "dropped": dropped, "resized": resized}


# ---- PyTorch import (parity bridge) ----------------------------------------

def _torch_linear(params_dst: dict, key_dst: str, sd: dict, key_src: str):
    """torch Linear weight is (out, in); flax Dense kernel is (in, out)."""
    params_dst[key_dst] = {"kernel": np.ascontiguousarray(sd[f"{key_src}.weight"].T)}
    if f"{key_src}.bias" in sd:
        params_dst[key_dst]["bias"] = sd[f"{key_src}.bias"]


def _torch_conv(sd: dict, key_src: str):
    """torch conv weight (O, I, kh, kw) -> flax HWIO."""
    out = {"kernel": np.ascontiguousarray(sd[f"{key_src}.weight"].transpose(2, 3, 1, 0))}
    if f"{key_src}.bias" in sd:
        out["bias"] = sd[f"{key_src}.bias"]
    return out


def _torch_ln(sd: dict, key_src: str):
    return {"scale": sd[f"{key_src}.weight"], "bias": sd[f"{key_src}.bias"]}


def import_torch_state_dict(sd: Dict[str, np.ndarray], depth: int,
                            decoder_depth: int) -> Dict[str, Any]:
    """Map a reference Res_Slim_ViT state_dict (numpy-ified) onto this
    framework's ResSlimViT param tree. Key map documented against reference
    res_slimvit.py param names."""
    p: Dict[str, Any] = {}

    # token_embeds.{i}.proj.weight (D,1,pp,pp) -> stacked [V, p*p, D]
    tok_w, tok_b = [], []
    i = 0
    while f"token_embeds.{i}.proj.weight" in sd:
        w = sd[f"token_embeds.{i}.proj.weight"]  # (D, 1, p, p)
        d = w.shape[0]
        tok_w.append(np.ascontiguousarray(w.reshape(d, -1).T))  # (p*p, D)
        tok_b.append(sd[f"token_embeds.{i}.proj.bias"])
        i += 1
    p["token_embed_kernel"] = np.stack(tok_w)
    p["token_embed_bias"] = np.stack(tok_b)

    p["var_embed"] = sd["var_embed"]
    p["var_query"] = sd["var_query"]
    p["pos_embed"] = sd["pos_embed"]

    _torch_linear(p, "spatial_embed", sd, "spatial_embed")

    va = {}
    # q/kv are raw kernels here (the algebraically-reduced var-agg keeps the
    # reference's parameter shapes but not Dense submodules)
    va["q_kernel"] = np.ascontiguousarray(sd["var_agg.q.weight"].T)
    if "var_agg.q.bias" in sd:
        va["q_bias"] = sd["var_agg.q.bias"]
    va["kv_kernel"] = np.ascontiguousarray(sd["var_agg.kv.weight"].T)
    if "var_agg.kv.bias" in sd:
        va["kv_bias"] = sd["var_agg.kv.bias"]
    _torch_linear(va, "proj", sd, "var_agg.proj")
    p["var_agg"] = va

    for b in range(depth):
        blk = {}
        blk["norm1"] = _torch_ln(sd, f"blocks.{b}.norm1")
        blk["norm2"] = _torch_ln(sd, f"blocks.{b}.norm2")
        attn = {}
        _torch_linear(attn, "qkv", sd, f"blocks.{b}.attn.qkv")
        _torch_linear(attn, "proj", sd, f"blocks.{b}.attn.proj")
        blk["attn"] = attn
        mlp = {}
        _torch_linear(mlp, "fc1", sd, f"blocks.{b}.mlp.fc1")
        _torch_linear(mlp, "fc2", sd, f"blocks.{b}.mlp.fc2")
        blk["mlp"] = mlp
        p[f"blocks_{b}"] = blk

    p["norm"] = _torch_ln(sd, "norm")

    # head: Sequential of decoder_depth x (Linear, GELU) + final Linear
    # torch indices: 0, 2, 4, ... (GELUs hold no params)
    for i in range(decoder_depth):
        _torch_linear(p, f"head_{i}", sd, f"head.{2 * i}")
    _torch_linear(p, "head_out", sd, f"head.{2 * decoder_depth}")

    p["conv_out"] = _torch_conv(sd, "conv_out")
    p["path2_conv1"] = _torch_conv(sd, "path2.0")
    p["path2_conv2"] = _torch_conv(sd, "path2.3")

    return jax.tree.map(np.asarray, p)


def consolidate_torch_tp_shards(shards, num_heads: int):
    """Merge the reference's per-TP-rank state_dicts (saved as
    `interm_epoch_E.ckpt_rank_R` when tensor_par_size > 1,
    reference examples/intermediate_downscaling.py:775-790) into ONE
    full-model state_dict that `import_torch_state_dict` accepts.

    Megatron split layout (reference attention.py:36-40, 122-129,
    mlp.py:50-54):
      column-parallel, head-structured rows:  attn.qkv -> (3, H/tp, dh, .),
        var_agg.q -> (H/tp, dh, .), var_agg.kv -> (2, H/tp, dh, .)
        -> concat shards along the head axis
      column-parallel, plain rows: mlp.fc1 -> concat rows (axis 0)
      row-parallel inputs: attn.proj / var_agg.proj / mlp.fc2 -> concat
        input columns (axis 1)
      row-parallel BIASES: every rank holds a full bias that is added BEFORE
        the all-reduce SUM (attention.py:85, mlp.py:71) — the consolidated
        bias is therefore the SUM over ranks.
      everything else is replicated -> rank 0 wins.
    """
    import re as _re

    tp = len(shards)
    if tp == 1:
        return dict(shards[0])
    out = {}
    for key, v0 in shards[0].items():
        parts = [np.asarray(s[key]) for s in shards]
        if _re.search(r"attn\.qkv\.weight$", key):
            d_in = parts[0].shape[1]
            merged = np.concatenate(
                [p.reshape(3, num_heads // tp, -1, d_in) for p in parts],
                axis=1).reshape(-1, d_in)
        elif _re.search(r"attn\.qkv\.bias$", key):
            merged = np.concatenate(
                [p.reshape(3, num_heads // tp, -1) for p in parts],
                axis=1).reshape(-1)
        elif _re.search(r"var_agg\.kv\.weight$", key):
            d_in = parts[0].shape[1]
            merged = np.concatenate(
                [p.reshape(2, num_heads // tp, -1, d_in) for p in parts],
                axis=1).reshape(-1, d_in)
        elif _re.search(r"var_agg\.kv\.bias$", key):
            merged = np.concatenate(
                [p.reshape(2, num_heads // tp, -1) for p in parts],
                axis=1).reshape(-1)
        elif _re.search(r"(var_agg\.q|mlp\.fc1)\.(weight|bias)$", key):
            # column-parallel, non-interleaved rows (var_agg.q's head
            # structure is contiguous, so this is a plain row concat)
            merged = np.concatenate(parts, axis=0)
        elif _re.search(r"(attn\.proj|var_agg\.proj|mlp\.fc2)\.weight$", key):
            merged = np.concatenate(parts, axis=1)
        elif _re.search(r"(attn\.proj|var_agg\.proj|mlp\.fc2)\.bias$", key):
            merged = np.sum(parts, axis=0)
        else:
            merged = parts[0]
        out[key] = merged
    return out


def export_torch_state_dict(params: Dict[str, Any],
                            patch_size: int) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_state_dict`: emit this framework's ResSlimViT
    params as a reference-layout Res_Slim_ViT state_dict (torch naming and
    shape conventions, reference res_slimvit.py:60-122) so checkpoints
    trained here load into the PyTorch reference. Round-trip covered in
    tests/test_checkpoint_import.py."""
    p = jax.tree.map(np.asarray, params)
    sd: Dict[str, np.ndarray] = {}

    def put_linear(key_dst: str, sub: dict):
        sd[f"{key_dst}.weight"] = np.ascontiguousarray(sub["kernel"].T)
        if "bias" in sub:
            sd[f"{key_dst}.bias"] = sub["bias"]

    def put_conv(key_dst: str, sub: dict):
        # flax HWIO -> torch OIHW
        sd[f"{key_dst}.weight"] = np.ascontiguousarray(
            sub["kernel"].transpose(3, 2, 0, 1))
        if "bias" in sub:
            sd[f"{key_dst}.bias"] = sub["bias"]

    def put_ln(key_dst: str, sub: dict):
        sd[f"{key_dst}.weight"] = sub["scale"]
        sd[f"{key_dst}.bias"] = sub["bias"]

    # stacked [V, p*p, D] -> per-variable Conv2d(1, D, p, p) weights
    tok_w, tok_b = p["token_embed_kernel"], p["token_embed_bias"]
    d = tok_w.shape[-1]
    for i in range(tok_w.shape[0]):
        w = np.ascontiguousarray(tok_w[i].T)  # (D, p*p)
        sd[f"token_embeds.{i}.proj.weight"] = w.reshape(
            d, 1, patch_size, patch_size)
        sd[f"token_embeds.{i}.proj.bias"] = tok_b[i]

    sd["var_embed"] = p["var_embed"]
    sd["var_query"] = p["var_query"]
    sd["pos_embed"] = p["pos_embed"]
    put_linear("spatial_embed", p["spatial_embed"])

    va = p["var_agg"]
    sd["var_agg.q.weight"] = np.ascontiguousarray(va["q_kernel"].T)
    if "q_bias" in va:
        sd["var_agg.q.bias"] = va["q_bias"]
    sd["var_agg.kv.weight"] = np.ascontiguousarray(va["kv_kernel"].T)
    if "kv_bias" in va:
        sd["var_agg.kv.bias"] = va["kv_bias"]
    put_linear("var_agg.proj", va["proj"])

    b = 0
    while f"blocks_{b}" in p:
        blk = p[f"blocks_{b}"]
        put_ln(f"blocks.{b}.norm1", blk["norm1"])
        put_ln(f"blocks.{b}.norm2", blk["norm2"])
        put_linear(f"blocks.{b}.attn.qkv", blk["attn"]["qkv"])
        put_linear(f"blocks.{b}.attn.proj", blk["attn"]["proj"])
        put_linear(f"blocks.{b}.mlp.fc1", blk["mlp"]["fc1"])
        put_linear(f"blocks.{b}.mlp.fc2", blk["mlp"]["fc2"])
        b += 1

    put_ln("norm", p["norm"])

    i = 0
    while f"head_{i}" in p:
        put_linear(f"head.{2 * i}", p[f"head_{i}"])
        i += 1
    put_linear(f"head.{2 * i}", p["head_out"])

    put_conv("conv_out", p["conv_out"])
    put_conv("path2.0", p["path2_conv1"])
    put_conv("path2.3", p["path2_conv2"])
    return sd
