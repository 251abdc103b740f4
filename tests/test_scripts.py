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


@pytest.mark.slow
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


def test_offline_scripts_roundtrip(tmp_path, rng, monkeypatch):
    """compose_splice + extract_masks + calculate_f1 offline pipeline
    (models/test.py:24-40, mask.py:5-70, calculate_f1.py:41-72)."""
    src = tmp_path / "src"; tgt = tmp_path / "tgt"; msk = tmp_path / "msk"
    out = tmp_path / "out"; pred = tmp_path / "pred"
    for d in (src, tgt, msk, pred):
        d.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f"{i}.png"),
                    (rng.random((32, 32, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(tgt / f"{i}.png"),
                    (rng.random((32, 32, 3)) * 255).astype(np.uint8))
        m = np.zeros((32, 32), np.uint8); m[8:20, 8:20] = 255
        cv2.imwrite(str(msk / f"{i}.png"), m)
        # predicted mask = GT with a bit of noise
        p = m.astype(np.float32) + rng.normal(0, 10, (32, 32))
        cv2.imwrite(str(pred / f"{i}.png"), np.clip(p, 0, 255).astype(np.uint8))

    mod = _load("compose_splice")
    monkeypatch.setattr(sys, "argv", [
        "compose_splice.py", "--source", str(src), "--target", str(tgt),
        "--mask", str(msk), "--out", str(out)])
    mod.main()
    assert sorted(os.listdir(out)) == ["0.png", "1.png"]
    comp = cv2.imread(str(out / "0.png"))
    t0 = cv2.imread(str(tgt / "0.png"))
    # outside the mask the composite equals the target
    assert np.array_equal(comp[:8], t0[:8])

    # extract_masks recovers the tampered region from |before-after|
    em = _load("extract_masks")
    mout = tmp_path / "extracted"
    monkeypatch.setattr(sys, "argv", [
        "extract_masks.py", "--before", str(tgt), "--after", str(out),
        "--out", str(mout)])
    em.main()
    got = cv2.imread(str(mout / "0.png"), cv2.IMREAD_GRAYSCALE)
    assert got is not None and got.shape == (32, 32)

    # F1 sweep scores predicted vs GT masks
    f1 = _load("calculate_f1")
    monkeypatch.setattr(sys, "argv", [
        "calculate_f1.py", "--pred", str(pred), "--gt", str(msk)])
    f1.main()


def test_evaluate_images_psnr_ssim(tmp_path, rng, monkeypatch):
    """evaluate_images: PSNR/SSIM (+Y-channel) folder scorer (test.py:55-167)."""
    gt = tmp_path / "gt"; pr = tmp_path / "pr"
    gt.mkdir(); pr.mkdir()
    for i in range(2):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt / f"{i}.png"), img)
        noisy = np.clip(img.astype(np.int32) +
                        rng.integers(-6, 7, img.shape), 0, 255)
        cv2.imwrite(str(pr / f"{i}.png"), noisy.astype(np.uint8))
    mod = _load("evaluate_images")
    monkeypatch.setattr(sys, "argv", [
        "evaluate_images.py", "--gt", str(gt), "--pred", str(pr)])
    mod.main()


@pytest.mark.slow
def test_evaluate_realworld_folder_protocol(tmp_path, rng, monkeypatch):
    """evaluate_realworld: the train.py -val folder protocol end-to-end on a
    tiny synthetic folder set (IRNclr_model.evaluate:765-905)."""
    import pytest as _pytest
    ori = tmp_path / "ori"; tam = tmp_path / "tamper"; msk = tmp_path / "mask"
    out = tmp_path / "out"
    for d in (ori, tam, msk):
        d.mkdir()
    for i in range(2):
        cv2.imwrite(str(ori / f"{i}.png"),
                    (rng.random((40, 40, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(tam / f"{i}.png"),
                    (rng.random((40, 40, 3)) * 255).astype(np.uint8))
        m = np.zeros((40, 40), np.uint8); m[10:25, 10:25] = 255
        cv2.imwrite(str(msk / f"{i}.png"), m)
    mod = _load("evaluate_realworld")
    monkeypatch.setattr(sys, "argv", [
        "evaluate_realworld.py", "--ckpt", str(tmp_path / "no_ckpt"),
        "--ori", str(ori), "--tamper", str(tam), "--mask", str(msk),
        "--out", str(out), "--size", "32"])
    mod.main()
    assert sorted(os.listdir(out / "recovered")) == ["0.png", "1.png"]
    assert sorted(os.listdir(out / "predicted_masks")) == ["0.png", "1.png"]
