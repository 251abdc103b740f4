"""DCT-domain transform pipeline (vwfd_tpu/data/cvtransforms.py) — mirrors
the reference's train/val compositions (datasets/dataloader_imagenet_dct.py)."""

import numpy as np

from vwfd_tpu.data import cvtransforms as T
from vwfd_tpu.data.jpeg_data import DCTDomainDataset


def _item():
    ds = DCTDomainDataset(size=64, synthetic_length=2)
    d = ds[0]
    # chroma at half grid, like the dataset emits
    return d["dct_y"], d["dct_cb"], d["dct_cr"]


def test_train_pipeline_shapes():
    tf = T.Compose([
        T.UpsampleCbCr(),
        T.SubsetDCT2(channels=24, pattern="square"),
        T.RandomResizedCropDCT(size=32),
        T.Aggregate2(),
        T.RandomHorizontalFlip(p=1.0),
        T.ToTensorDCT2(),
        T.NormalizeDCT(np.zeros(192), np.ones(192), channels=24),
    ])
    out = tf(_item())
    assert out.shape == (24, 4, 4)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_val_pipeline_center_crop():
    tf = T.Compose([
        T.UpsampleCbCr(),
        T.SubsetDCT2(channels=48, pattern="triangle"),
        T.Resize(6),
        T.CenterCropDCT(size=32),
        T.Aggregate2(),
        T.ToTensorDCT2(),
    ])
    out = tf(_item())
    assert out.shape == (48, 4, 4)


def test_subset_indices_patterns():
    sy, scb, scr = T.subset_indices(24, "square")
    assert len(sy) + len(scb) + len(scr) == 24
    assert len(scb) == len(scr)
    # square pattern stays in the low-frequency corner
    assert all(i % 8 < 4 and i // 8 < 4 for i in sy)
    ty, tcb, tcr = T.subset_indices(6, "triangle")
    assert len(ty) == 4 and len(tcb) == len(tcr) == 1  # 2:1:1 budget
    assert ty == sorted([0, 1, 8, 16])  # zig-zag prefix of 4


def test_flip_and_normalize_roundtrip():
    y, cb, cr = _item()
    agg = T.Aggregate2()(T.UpsampleCbCr()((y, cb, cr)))
    flipped = T.RandomHorizontalFlip(p=1.0)(agg)
    np.testing.assert_allclose(flipped[:, ::-1], agg, atol=0)
    t = T.ToTensorDCT2()(agg)
    n = T.NormalizeDCT(np.full(192, 2.0), np.full(192, 4.0))(t)
    np.testing.assert_allclose(n, (t - 2.0) / 4.0, atol=1e-6)
