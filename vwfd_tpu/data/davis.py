"""DAVIS video loader — the reference's main dataset (data/Dataloader.py
`DVDataset:59-99`): `JPEGImages/480p/<video>/*.jpg` frames paired with
`Annotations/480p/<video>/*.png` masks, resized to `size²`.

This rebuild keeps the *intended* semantics and fixes the two committed bugs
SURVEY.md §2.3 documents: frames are NOT binarized (Dataloader.py:35 applies
`>0 → 1` to video frames), and masks go through the grayscale `read_mask`
path (`:88` calls the wrong function and always raises).

Behavior kept: random video choice per fetch (the loader ignores the given
index, Dataloader.py:78), rejection of videos whose mean mask rate ≥
`mask_rate_max`, and a persistent skip list (`:71,79-95`).
"""

import os
import numpy as np
import cv2


class DavisVideoDataset:
    def __init__(self, root, size=256, frames=4, mask_rate_max=0.2, seed=0):
        self.image_root = os.path.join(root, "JPEGImages", "480p")
        self.mask_root = os.path.join(root, "Annotations", "480p")
        self.size = size
        self.frames = frames
        self.mask_rate_max = mask_rate_max
        self.videos = sorted(os.listdir(self.image_root))
        self.skip_list = set()
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.videos)

    def _read_frame(self, path):
        img = cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1]  # BGR→RGB
        img = cv2.resize(img, (self.size, self.size), interpolation=cv2.INTER_LINEAR)
        return img.astype(np.float32) / 255.0

    def _read_mask(self, path):
        m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        m = cv2.resize(m, (self.size, self.size), interpolation=cv2.INTER_NEAREST)
        return (m > 0).astype(np.float32)

    def __getitem__(self, idx):
        # Rejection-sample a video with acceptable tamper area (Dataloader.py:77-95).
        for _ in range(10 * len(self.videos)):
            vid = self.videos[int(self.rng.integers(len(self.videos)))]
            if vid in self.skip_list:
                continue
            img_dir = os.path.join(self.image_root, vid)
            mask_dir = os.path.join(self.mask_root, vid)
            frame_files = sorted(os.listdir(img_dir))
            if len(frame_files) < self.frames:
                self.skip_list.add(vid)
                continue
            start = int(self.rng.integers(0, len(frame_files) - self.frames + 1))
            sel = frame_files[start:start + self.frames]
            masks = []
            ok = True
            for f in sel:
                mp = os.path.join(mask_dir, os.path.splitext(f)[0] + ".png")
                if not os.path.exists(mp):
                    ok = False
                    break
                masks.append(self._read_mask(mp))
            if not ok:
                self.skip_list.add(vid)
                continue
            rate = float(np.mean(masks))
            if rate >= self.mask_rate_max or rate == 0.0:
                self.skip_list.add(vid)
                continue
            video = np.stack([self._read_frame(os.path.join(img_dir, f))
                              for f in sel])            # (T, H, W, 3)
            mask = np.stack(masks)[..., None]            # (T, H, W, 1)
            return video, mask
        raise IOError("no DAVIS video satisfied the mask-rate bound")
