"""Parity of the fused Pallas coupling-subnet kernel (interpret mode on CPU)
against the plain-XLA chain and the Flax ResSubnet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vwfd_tpu.nets.pallas_coupling import (
    fused_res_subnet, res_subnet_reference, PallasResSubnet,
)


def _rand_params(rng, cin, f, cout):
    shapes = [(3, 3, cin, f), (3, 3, f, f), (3, 3, f, f), (3, 3, f, f),
              (3, 3, cin + f, cout)]
    ws = tuple(jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
               for s in shapes)
    bs = tuple(jnp.asarray(rng.standard_normal(s[-1]).astype(np.float32) * 0.1)
               for s in shapes)
    return ws, bs


@pytest.mark.parametrize("cin,f,cout,hw", [
    (24, 64, 48, 32),    # down1-like (im2col path), single tile
    (96, 32, 192, 16),   # down2-like
    (160, 16, 64, 16),   # Cin >= 128: shifted-dot path
])
def test_fused_subnet_matches_xla(rng, cin, f, cout, hw):
    ws, bs = _rand_params(rng, cin, f, cout)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)).astype(np.float32))
    ref = np.asarray(res_subnet_reference(x, ws, bs), np.float32)
    got = np.asarray(fused_res_subnet(x, ws, bs, interpret=True), np.float32)
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, (
        np.abs(got - ref).max(), scale)


def test_fused_subnet_multi_tile(rng):
    """H=128 exercises the 64-tile grid + halo DMA indexing."""
    cin, f, cout = 8, 8, 8
    ws, bs = _rand_params(rng, cin, f, cout)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, cin)).astype(np.float32))
    ref = np.asarray(res_subnet_reference(x, ws, bs), np.float32)
    got = np.asarray(fused_res_subnet(x, ws, bs, interpret=True), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02


def test_flax_param_port(rng):
    """PallasResSubnet.from_flax_params ports the Flax ResSubnet tree and the
    kernel reproduces the Flax module's output (bf16 tolerance)."""
    from vwfd_tpu.nets.inn import ResSubnet
    m = ResSubnet(out_channels=12, feature=16, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 6)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x), np.float32)
    ws, bs = PallasResSubnet.from_flax_params(v["params"])
    got = np.asarray(fused_res_subnet(x, ws, bs, interpret=True), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05


@pytest.mark.slow
def test_pallas_subnet_module_tree_and_grad(rng):
    """PallasSubnet declares the exact ResSubnet param tree (checkpoints
    interchange), matches its output, and is differentiable (custom_vjp
    through the XLA-equivalent backward)."""
    from vwfd_tpu.nets.inn import ResSubnet, PallasSubnet
    m_ref = ResSubnet(out_channels=12, feature=16, dtype=jnp.bfloat16)
    m_pls = PallasSubnet(out_channels=12, feature=16)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 6)).astype(np.float32))
    v = m_ref.init(jax.random.PRNGKey(0), x)
    vp = m_pls.init(jax.random.PRNGKey(0), x)
    ref_tree = jax.tree_util.tree_structure(v)
    pls_tree = jax.tree_util.tree_structure(vp)
    assert ref_tree == pls_tree
    assert all(np.shape(a) == np.shape(b) for a, b in zip(
        jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vp)))
    # same weights → same output (bf16 tolerance)
    ref = np.asarray(m_ref.apply(v, x), np.float32)
    got = np.asarray(m_pls.apply(v, x), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05
    # differentiable: grads wrt params finite and close to the XLA chain's
    def loss(params, mod):
        return jnp.sum(mod.apply(params, x).astype(jnp.float32) ** 2)
    g_ref = jax.grad(loss)(v, m_ref)
    g_pls = jax.grad(loss)(vp, m_pls)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pls)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(b).all()
        s = np.abs(a).max() + 1e-3
        assert np.abs(a - b).max() / s < 0.08, np.abs(a - b).max() / s


def test_inn_with_pallas_subnet(rng):
    """InvertibleNet(subnet='res_pallas') runs fwd+inverse and stays
    invertible (inverse uses the same fused forward subnets)."""
    from vwfd_tpu.nets.inn import InvertibleNet
    inn = InvertibleNet(channels=4, down_num=2, block_num=(1, 1),
                        subnet="res_pallas", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, 16, 16, 4), dtype=np.float32))
    v = inn.init(jax.random.PRNGKey(0), x)
    y = inn.apply(v, x)
    back, _ = inn.apply(v, y, rev=True)
    assert np.abs(np.asarray(back) - np.asarray(x)).max() < 0.02


@pytest.mark.parametrize("tile", [None, (16, 16)])
def test_fused_subnet_pipelined_matches_manual(rng, tile):
    """The Element-BlockSpec pipelined variant (VERDICT r3 #8) is
    bit-identical to the hand-rolled-DMA kernel — same chain, Mosaic's own
    pipeline does the halo'd streaming."""
    ws, bs = _rand_params(rng, 24, 64, 48)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 24)).astype(np.float32))
    man = np.asarray(fused_res_subnet(x, ws, bs, interpret=True), np.float32)
    pipe = np.asarray(fused_res_subnet(x, ws, bs, interpret=True,
                                       pipelined=True, tile=tile), np.float32)
    np.testing.assert_array_equal(pipe, man)
