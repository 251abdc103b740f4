"""Int8 PTQ extractor path (nets/unet_int8.py).

Validates (1) BatchNorm folding is exact against the eval-mode module,
(2) the int8 program tracks the f32 net closely after calibration, and
(3) every flagship-reachable config (enc plans, s2d, out_channels) runs.
Throughput/quality-at-convergence numbers live in BASELINE.md r3 (TPU runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vwfd_tpu.nets.unet import UNetTPU
from vwfd_tpu.nets import unet_int8 as q


def _make(econvs=(2, 2, 1, 1, 1), s2d=2, feats=16, out_channels=1,
          size=32, n=2, seed=0):
    net = UNetTPU(init_features=feats, s2d=s2d, enc_convs=econvs,
                  out_channels=out_channels, apply_sigmoid=True)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((n, size, size, 3), np.float32))
    variables = net.init(jax.random.PRNGKey(seed), x, train=False)
    # de-trivialize BN stats so folding is actually exercised
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / max(a.size, 1), variables["batch_stats"])
    stats = jax.tree_util.tree_map(jnp.abs, stats)  # var must stay positive
    variables = {"params": variables["params"], "batch_stats": stats}
    return net, variables, x


def test_bn_fold_exact_vs_module():
    net, variables, x = _make()
    ref = net.apply(variables, x, train=False)
    folded = q.fold_unet_tpu(variables, enc_convs=(2, 2, 1, 1, 1))
    out = q.apply_folded(folded, x, s2d=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_int8_tracks_f32_after_calibration():
    net, variables, x = _make(feats=16, size=64, n=4)
    ref = np.asarray(net.apply(variables, x, train=False))
    scales = q.calibrate(variables, [x], enc_convs=(2, 2, 1, 1, 1))
    qp = q.quantize(variables, scales, enc_convs=(2, 2, 1, 1, 1))
    out = np.asarray(q.apply_int8(qp, x))
    # random-init probs hover near 0.5; int8 should track within a few
    # percent in probability space
    assert np.mean(np.abs(out - ref)) < 0.05
    assert np.max(np.abs(out - ref)) < 0.35
    # binarized agreement at the serving threshold
    agree = np.mean((out > 0.5) == (ref > 0.5))
    assert agree > 0.95


@pytest.mark.parametrize("econvs,s2d,cout", [
    ((1, 1, 1, 1, 1), 2, 1),
    ((2, 1, 1, 1, 1), 4, 1),
    ((2, 2, 2, 2, 2), 2, 2),
])
def test_int8_all_flagship_plans_run(econvs, s2d, cout):
    net, variables, x = _make(econvs=econvs, s2d=s2d, feats=8,
                              out_channels=cout, size=64)
    scales = q.calibrate(variables, [x], enc_convs=econvs, s2d=s2d,
                         out_channels=cout)
    qp = q.quantize(variables, scales, enc_convs=econvs)
    out = q.apply_int8(qp, x, s2d=s2d, out_channels=cout)
    assert out.shape == (x.shape[0], 64, 64, cout)
    assert np.isfinite(np.asarray(out)).all()
    # int8 weights really are int8 on every conv
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: a.dtype == jnp.int8,
                               {"enc": [[c["w"] for c in lv]
                                        for lv in qp["enc"]],
                                "dec": [[d["up_w"], d["w_up"], d["w_skip"]]
                                        for d in qp["dec"]],
                                "head": qp["head"]["w"]}))
    assert all(leaves)


def test_int8_jits_and_is_deterministic():
    net, variables, x = _make(feats=8, size=32)
    scales = q.calibrate(variables, [x])
    qp = q.quantize(variables, scales)
    f = jax.jit(lambda p, v: q.apply_int8(p, v))
    a = np.asarray(f(qp, x))
    b = np.asarray(f(qp, x))
    np.testing.assert_array_equal(a, b)
