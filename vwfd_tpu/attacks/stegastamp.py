"""StegaStamp-style distortions — reference: utils/JPEG.py:18-94
(`random_blur_kernel`, `get_rand_transform_matrix`, `get_rnd_brightness_torch`).

Random blur kernel (identity | oriented line | gaussian mixture), random
projective warp of the image corners, and random brightness/hue shifts — all
jittable with explicit PRNG keys; the warp is a fixed-shape bilinear grid
sample (no cv2.getPerspectiveTransform host round trip)."""

import numpy as np
import jax
import jax.numpy as jnp


def random_blur_kernel(key, n_blur=7, probs=(0.25, 0.25),
                       sigrange_gauss=(1.0, 3.0), sigrange_line=(0.25, 1.0),
                       wmin_line=3.0):
    """(N, N) normalized kernel: gaussian w.p. probs[0], oriented line w.p.
    probs[1], else identity (utils/JPEG.py:18-55)."""
    ks = jax.random.split(key, 5)
    coords = jnp.stack(jnp.meshgrid(jnp.arange(n_blur, dtype=jnp.float32),
                                    jnp.arange(n_blur, dtype=jnp.float32),
                                    indexing="ij"), -1) - 0.5 * (n_blur - 1)
    manhat = jnp.sum(jnp.abs(coords), -1)
    vals_nothing = (manhat < 0.5).astype(jnp.float32)
    sig_g = jax.random.uniform(ks[0], (), minval=sigrange_gauss[0],
                               maxval=sigrange_gauss[1])
    vals_gauss = jnp.exp(-jnp.sum(coords ** 2, -1) / (2 * sig_g ** 2))
    theta = jax.random.uniform(ks[1], ()) * 2 * jnp.pi
    v = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
    dists = jnp.sum(coords * v, -1)
    sig_l = jax.random.uniform(ks[2], (), minval=sigrange_line[0],
                               maxval=sigrange_line[1])
    w_line = jax.random.uniform(ks[3], ()) * \
        (0.5 * (n_blur - 1) + 0.1 - wmin_line) + wmin_line
    vals_line = jnp.exp(-dists ** 2 / (2 * sig_l ** 2)) * (manhat < w_line)
    t = jax.random.uniform(ks[4], ())
    vals = jnp.where(t < probs[0], vals_gauss,
                     jnp.where(t < probs[0] + probs[1], vals_line,
                               vals_nothing))
    return vals / jnp.sum(vals)


def apply_blur_kernel(img, kernel):
    """Depthwise apply an (N, N) kernel to (..., H, W, C), zero padding."""
    n = kernel.shape[0]
    pad = n // 2
    xp = jnp.pad(img, [(0, 0)] * (img.ndim - 3) + [(pad, pad), (pad, pad),
                                                   (0, 0)])
    h, w = img.shape[-3], img.shape[-2]
    out = jnp.zeros_like(img)
    for dy in range(n):
        for dx in range(n):
            # static slices: transpose to fusable zero-pads, not
            # dynamic-update-slices
            out = out + kernel[dy, dx] * xp[..., dy:dy + h, dx:dx + w, :]
    return out


def random_perspective(key, img, d=8.0):
    """Random projective warp with corners jittered by ±d pixels
    (utils/JPEG.py:58-88 get_rand_transform_matrix + grid sample), bilinear,
    edge clamp. img: (B, H, W, C); one transform per batch (as the reference
    draws per sample, vmap over B for per-sample warps)."""
    h, w = img.shape[-3], img.shape[-2]
    jitter = jax.random.uniform(key, (4, 2), minval=-d, maxval=d)
    dst = jnp.asarray([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]])
    src = dst + jitter
    m = _solve_homography_jnp(dst, src)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], 0).reshape(3, -1)
    warped = m @ pts
    wx = warped[0] / (warped[2] + 1e-8)
    wy = warped[1] / (warped[2] + 1e-8)
    x0 = jnp.floor(wx)
    y0 = jnp.floor(wy)
    tx = (wx - x0).reshape(h, w, 1)
    ty = (wy - y0).reshape(h, w, 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    def gather(yi, xi):
        flat = img.reshape(img.shape[0], h * w, img.shape[-1])
        idx = (yi * w + xi).reshape(-1)
        return flat[:, idx, :].reshape(img.shape[0], h, w, img.shape[-1])

    out = ((1 - ty) * ((1 - tx) * gather(y0, x0) + tx * gather(y0, x1))
           + ty * ((1 - tx) * gather(y1, x0) + tx * gather(y1, x1)))
    return out


def _solve_homography_jnp(src, dst):
    rows = []
    rhs = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0 * x, 0 * x, 0 * x, -u * x, -u * y]))
        rhs.append(u)
        rows.append(jnp.stack([0 * x, 0 * x, 0 * x, x, y, 1.0, -v * x, -v * y]))
        rhs.append(v)
    a = jnp.stack(rows)
    b = jnp.stack(rhs)
    h8 = jnp.linalg.solve(a, b)
    return jnp.concatenate([h8, jnp.ones((1,))]).reshape(3, 3)


def random_brightness_hue(key, img, rnd_bri=0.3, rnd_hue=0.1):
    """Additive per-channel hue + global brightness shift
    (utils/JPEG.py:91-94), clamped to [0,1]."""
    k1, k2 = jax.random.split(key)
    b = img.shape[0]
    hue = jax.random.uniform(k1, (b, 1, 1, img.shape[-1]),
                             minval=-rnd_hue, maxval=rnd_hue)
    bri = jax.random.uniform(k2, (b, 1, 1, 1), minval=-rnd_bri, maxval=rnd_bri)
    return jnp.clip(img + hue + bri, 0.0, 1.0)
