"""Numerical parity vs torch (CPU) for the operations the PyTorch-checkpoint
import path depends on (SURVEY.md §7 hard part #6): if these ops match, a
converted reference checkpoint produces the same activations here.

These tests re-implement nothing from the reference — they call torch's own
ops as the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_bicubic_pos_embed_resize_matches_torch():
    """jax.image.resize(bicubic) vs F.interpolate(bicubic, align_corners=False)
    — the pos-embed import path (reference pos_embed.py:75-101)."""
    from orbit2_tpu.ops.pos_embed import interpolate_pos_embed_on_the_fly

    rng = np.random.default_rng(0)
    gh, gw, d = 8, 16, 32
    pe = rng.normal(size=(1, gh * gw, d)).astype(np.float32)

    got = np.asarray(interpolate_pos_embed_on_the_fly(jnp.asarray(pe), 2, (32, 64)))

    t = torch.from_numpy(pe).reshape(1, gh, gw, d).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        t, size=(16, 32), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, 16 * 32, d).numpy()

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_pixel_shuffle_matches_torch():
    from orbit2_tpu.ops.pixel_shuffle import pixel_shuffle_nchw

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 12, 5, 7)).astype(np.float32)
    got = np.asarray(pixel_shuffle_nchw(jnp.asarray(x), 2))
    want = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(got, want)


def test_conv_weight_conversion_matches_torch():
    """A torch Conv2d's weights converted OIHW->HWIO run through flax Conv
    must produce identical outputs (the path2/conv_out import)."""
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 8, 10)).astype(np.float32)  # NCHW

    tconv = torch.nn.Conv2d(5, 7, kernel_size=3, padding=1)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # HWIO
    bias = tconv.bias.detach().numpy()
    conv = nn.Conv(7, (3, 3), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))  # NHWC
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_linear_weight_conversion_matches_torch():
    """torch Linear -> flax Dense via the importer's transpose."""
    from flax import linen as nn

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    tl = torch.nn.Linear(16, 24)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    dense = nn.Dense(24)
    params = {"params": {
        "kernel": jnp.asarray(tl.weight.detach().numpy().T),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }}
    got = np.asarray(dense.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_gelu_matches_torch_exact():
    """Blocks use exact (erf) GELU like torch's default."""
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_layernorm_matches_torch():
    from flax import linen as nn

    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 10, 16)).astype(np.float32)
    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(rng.normal(size=16).astype(np.float32)))
        tln.bias.copy_(torch.from_numpy(rng.normal(size=16).astype(np.float32)))
        want = tln(torch.from_numpy(x)).numpy()
    ln = nn.LayerNorm()
    params = {"params": {"scale": jnp.asarray(tln.weight.detach().numpy()),
                          "bias": jnp.asarray(tln.bias.detach().numpy())}}
    got = np.asarray(ln.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_patch_embed_conversion_matches_torch_conv():
    """The importer flattens a torch PatchEmbed conv (D,1,p,p) into a
    (p*p, D) matmul kernel; both must patchify identically."""
    rng = np.random.default_rng(5)
    D, p = 12, 2
    x = rng.normal(size=(2, 1, 8, 12)).astype(np.float32)
    tconv = torch.nn.Conv2d(1, D, kernel_size=p, stride=p)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x))  # [2, D, 4, 6]
        want = want.flatten(2).transpose(1, 2).numpy()  # [2, L, D]

    w = tconv.weight.detach().numpy()  # (D, 1, p, p)
    kernel = w.reshape(D, -1).T  # (p*p, D) — importer layout
    bias = tconv.bias.detach().numpy()

    # model patchify order: reshape (B, h, p, w, p) -> (B, h, w, p, p)
    B, _, H, W = x.shape
    h, wd = H // p, W // p
    patches = x[:, 0].reshape(B, h, p, wd, p).transpose(0, 1, 3, 2, 4)
    patches = patches.reshape(B, h * wd, p * p)
    got = patches @ kernel + bias
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
