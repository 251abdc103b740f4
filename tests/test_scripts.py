"""Round-trip tests for the standalone CLI scripts (SURVEY §2.8)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_immunized_roundtrip(tmp_path, rng, monkeypatch):
    """only_gen_immunized export (IRNp_model.py:461-491): folder in →
    immunized folder out, same count, valid [0,1] PNGs, content changed."""
    ori = tmp_path / "ori"
    out = tmp_path / "immu"
    ori.mkdir()
    for i in range(3):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(ori / f"im{i}.png"), img)

    mod = _load("generate_immunized")
    monkeypatch.setattr(sys, "argv", [
        "generate_immunized.py", "--ori", str(ori), "--out", str(out),
        "--size", "32", "--batch", "2"])
    mod.main()

    names = sorted(os.listdir(out))
    assert names == ["im0.png", "im1.png", "im2.png"]
    for i, n in enumerate(names):
        im = cv2.imread(str(out / n), cv2.IMREAD_COLOR)
        assert im is not None and im.shape == (32, 32, 3)
        # the zero-init coupling heads make the INN near-identity at init, so
        # the immunized export must stay CLOSE to the source (not necessarily
        # byte-different) — imperceptibility by construction
        src = cv2.resize(cv2.imread(str(ori / f"im{i}.png")), (32, 32))
        assert np.abs(im.astype(np.float32) -
                      src.astype(np.float32)).mean() < 16.0


def test_jpegadv_experiment_smoke(monkeypatch, tmp_path):
    """Targeted jpegadv study driver runs end-to-end on synthetic images
    (jpegadv/targeted_compress.py condensed protocol)."""
    import json
    mod = _load("jpegadv_experiment")
    out = tmp_path / "res.json"
    monkeypatch.setattr(sys, "argv", [
        "jpegadv_experiment.py", "--victim", "C", "--targeted",
        "--n", "2", "--size", "16", "--qualities", "90", "50",
        "--out", str(out)])
    mod.main()
    res = json.loads(out.read_text())
    assert res["targeted"] is True and len(res["rows"]) == 2
    sweep = res["rows"][0]["sweep"]
    assert {"jpg_pic", "jpg_adv"} == set(sweep)
    assert [e["q"] for e in sweep["jpg_pic"]] == [90, 50]
    assert all(np.isfinite(e["psnr_with_pic"]) for e in sweep["jpg_adv"])


def test_victims_and_targeted_igsm(rng):
    """Victim CNNs forward; targeted IGSM moves logits toward the target."""
    import jax
    import jax.numpy as jnp
    import optax
    from vwfd_tpu import adversarial as adv
    x = jnp.asarray(rng.random((2, 28, 28, 3)).astype(np.float32))
    for name, cls in adv.VICTIMS.items():
        m = cls(num_classes=5)
        p = m.init(jax.random.PRNGKey(0), x)
        lg = m.apply(p, x)
        assert lg.shape == (2, 5), name
    m = adv.VICTIMS["C"](num_classes=5)
    p = m.init(jax.random.PRNGKey(1), x)
    target = 3
    def loss(im):
        lg = m.apply(p, im[None] if im.ndim == 3 else im)
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            lg, jnp.full((lg.shape[0],), target)))
    before = float(loss(x[0]))
    advp = adv.igsm_targeted(loss, x[0], epsilon=0.1, step_size=0.02)
    after = float(loss(advp))
    assert after < before
