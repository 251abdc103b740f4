"""Qualitative image dumps (reference: utils/__init__.py:68-96 `stitch_images`
/ `imsave`, utils/util.py:98-132 `tensor2img`/`save_img`)."""

import os

import numpy as np


def tensor_to_uint8(img01):
    """NHWC [0,1] float → uint8, round-half-away like the reference's
    `(img*255).round()` dumps (models/IRNcrop_model.py:612-616)."""
    x = np.asarray(img01)
    return np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)


def stitch_images(*image_groups, img_per_row: int = 1, gap: int = 5):
    """Montage: each group is an NHWC batch; batch items become rows
    (chunked by `img_per_row`), groups become columns. Returns a PIL Image."""
    from PIL import Image

    groups = [tensor_to_uint8(g) for g in image_groups]
    b = groups[0].shape[0]
    h, w = groups[0].shape[1], groups[0].shape[2]
    cols = len(groups) * img_per_row
    rows = (b + img_per_row - 1) // img_per_row
    canvas = np.full((rows * h, cols * (w + gap), 3), 255, dtype=np.uint8)
    for i in range(b):
        r, c0 = divmod(i, img_per_row)
        for g_idx, g in enumerate(groups):
            img = g[i]
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            c = c0 * len(groups) + g_idx
            canvas[r * h:(r + 1) * h, c * (w + gap):c * (w + gap) + w] = img
    return Image.fromarray(canvas)


def save_image(img01, path):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = tensor_to_uint8(img01)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def crop_to_multiple(img, d: int = 32):
    """Center-crop (H, W, C) or (B, H, W, C) so H and W divide `d`
    (utils/image_io.py:13-56 crop_image/crop_np_image family, NHWC)."""
    h, w = img.shape[-3], img.shape[-2]
    nh, nw = (h // d) * d, (w // d) * d
    y0, x0 = (h - nh) // 2, (w - nw) // 2
    return img[..., y0:y0 + nh, x0:x0 + nw, :]


def create_augmentations(img):
    """8-fold dihedral augmentations of an (H, W, C) image — convention
    original, rot90×{1,2,3}, flip, flip∘rot90×{1,2,3}
    (utils/image_io.py:160-171, axes adapted to HWC)."""
    import numpy as np
    img = np.asarray(img)
    aug = [img.copy()] + [np.rot90(img, k, (0, 1)).copy() for k in (1, 2, 3)]
    flipped = img[:, ::-1].copy()
    aug += [flipped] + [np.rot90(flipped, k, (0, 1)).copy() for k in (1, 2, 3)]
    return aug


def create_video_augmentations(video):
    """Same 8-fold augmentations applied per clip, (T, H, W, C)
    (utils/image_io.py:173-185)."""
    import numpy as np
    video = np.asarray(video)
    aug = [video.copy()] + [np.rot90(video, k, (1, 2)).copy()
                            for k in (1, 2, 3)]
    flipped = video[:, :, ::-1].copy()
    aug += [flipped] + [np.rot90(flipped, k, (1, 2)).copy() for k in (1, 2, 3)]
    return aug
