"""Still-image folder loader — reference: data/LQGT_dataset.py (`LQGTDataset`),
data/LQ_dataset.py, data/tianchi_dataset.py.

Reads images, resizes to `size²`, optional flip/rot augmentation
(data/util.py:96-118), optional canny edge map (LQGT_dataset.py:64-74 computes
it for the PAMI/CLRNet tasks — precomputed here host-side, per SURVEY.md §7).
"""

import os
import numpy as np
import cv2

_IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class ImageFolderDataset:
    def __init__(self, root, size=256, augment=True, with_canny=False,
                 mask_root=None, seed=0):
        self.paths = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root) for f in fs
            if f.lower().endswith(_IMG_EXT))
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.size = size
        self.augment = augment
        self.with_canny = with_canny
        self.mask_root = mask_root
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        path = self.paths[idx % len(self.paths)]
        img = cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1]
        img = cv2.resize(img, (self.size, self.size),
                         interpolation=cv2.INTER_LINEAR)
        img = img.astype(np.float32) / 255.0
        if self.augment:
            if self.rng.random() < 0.5:
                img = img[:, ::-1]
            k = int(self.rng.integers(0, 4))
            img = np.rot90(img, k, axes=(0, 1))
        out = {"image": np.ascontiguousarray(img)}
        if self.with_canny:
            gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
            canny = cv2.Canny(gray, 100, 200).astype(np.float32) / 255.0
            out["canny"] = canny[..., None]
        if self.mask_root is not None:
            mp = os.path.join(self.mask_root, os.path.basename(path))
            m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
            m = cv2.resize(m, (self.size, self.size),
                           interpolation=cv2.INTER_NEAREST)
            out["mask"] = (m > 127).astype(np.float32)[..., None]
        return out
