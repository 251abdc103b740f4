"""Production serving runtime for the video watermarking pipeline.

The reference repo has no serving stack: inference happens as a side effect
of validation inside the trainers (per-clip Python loops over eager torch —
`models/IRNcrop_model.py:520-607`) or one-off export scripts
(`models/IRNp_model.py:461-491`). This module is the TPU-native production
path for the two deployable operations:

  * ``embed``  — watermark a clip (INN forward + clamp + 8-bit STE quantize)
  * ``detect`` — per-frame tamper-mask logits → uint8 mask / clip verdict

designed around how TPUs actually serve:

  * **AOT compilation.** Both programs are lowered and compiled at
    construction for ONE static clip shape (``jax.jit(...).lower().compile()``)
    — no first-request compile spike, no silent retrace on a stray shape
    (off-shape requests are padded or rejected, never recompiled).
  * **uint8 wire format.** Frames cross host→device as uint8 and results
    come back as uint8 — 4× fewer bytes each way than float32 over
    PCIe / the axon tunnel. Normalisation to [0,1] happens on device, where
    it fuses into the first conv. The embed output is *exactly* representable
    in uint8 (the model's STE quantizer already rounds to 8-bit levels), so
    the wire format costs zero fidelity.
  * **Bit-packed masks.** Detect masks are binary, so the wire carries one
    *bit* per pixel (device-side packbits along the row axis) — 8× fewer
    device→host bytes than a uint8 mask. ``ServeResult.mask`` unpacks on the
    host transparently; consumers still see ``uint8 {0,255} (b,T,S,S,1)``.
  * **Async device→host prefetch.** ``serve_stream`` starts the host copy of
    every result the moment it is dispatched (``copy_to_host_async``), so
    downloads of request N overlap compute of N+1 — on top of the upload-side
    double buffering.
  * **Fused roundtrip.** ``modes=("roundtrip",)`` compiles embed→detect as
    ONE device program (detect consumes the exact uint8 the embed wire would
    carry): the immunize-then-verify deployment op, with no intermediate
    download/re-upload of the watermarked frames.
  * **Async double-buffering.** ``serve_stream`` keeps a bounded window of
    in-flight requests: the host uploads clip N+1 and dispatches its program
    while clip N computes (JAX async dispatch), and only blocks on the
    oldest result when the window is full. Host↔device transfer overlaps
    compute with no threads and no explicit events.
  * **Tail padding.** A final partial batch is padded to the compiled batch
    size and the outputs trimmed — per-sample independence of both programs
    (eval-mode nets) makes this exact.
  * **Data-parallel mesh.** Pass ``mesh=`` to shard the request batch over
    devices with the same ``NamedSharding`` the trainers use; results gather
    transparently. One compiled executable serves N chips.

Quality/throughput points are config-driven: the flagship nets
(``res_tpu2`` + ``unet_tpu``, F1 0.965) by default, or the validated
frontier (``extractor_s2d=4`` … 15.4× baseline) for coarse-mask /
clip-verdict serving — see BASELINE.md.

  * **Int8 PTQ detect** (``int8_extract=True``): the detect/roundtrip
    programs run the extractor through the int8 inference path
    (nets/unet_int8.py — BN-folded, per-channel int8 weights, calibrated
    activation scales, fused requant epilogues). The v5e MXU's int8 mode
    runs ~2× its bf16 rate; quality is gated by the measured F1 delta on a
    trained checkpoint (tools/exp_int8_eval.py, BASELINE.md r3).
    Calibration traffic comes from ``int8_calib`` (uint8 clips shaped like
    requests — pass real detect traffic in production) or, by default,
    from self-generated watermarked clips (embed output of random inputs:
    the roundtrip op's own traffic distribution).
"""

from typing import Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models.state import latest_step, restore_checkpoint
from .models.video_model import VideoWatermarkModel

__all__ = ["WatermarkServer", "ServeResult", "load_exported",
           "unpack_mask_bits"]

# MSB-first byte order — matches np.unpackbits' default on the host side.
_BIT_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)


def _pack_mask_bits(mask_bool: jnp.ndarray) -> jnp.ndarray:
    """Device-side packbits: boolean mask (b,T,S,S,1) → uint8 (b,T,S,S//8),
    8 row-adjacent pixels per byte, MSB first. One multiply-add per pixel —
    XLA fuses it into the thresholding compare."""
    b, t, s, s2, _ = mask_bool.shape
    bits = mask_bool.astype(jnp.uint8).reshape(b, t, s, s2 // 8, 8)
    return (bits * jnp.asarray(_BIT_WEIGHTS)).sum(axis=-1).astype(jnp.uint8)


def unpack_mask_bits(packed) -> np.ndarray:
    """Host-side inverse of ``_pack_mask_bits``: uint8 (...,S,S//8) →
    uint8 {0,255} (...,S,S,1). Needs only numpy (pairs with
    ``load_exported`` artifacts, which emit the packed wire format)."""
    bits = np.unpackbits(np.asarray(packed), axis=-1)
    return (bits[..., None] * np.uint8(255)).astype(np.uint8)


def load_exported(path: str):
    """Load a frozen serving artifact written by
    ``WatermarkServer.export_program`` and return its callable
    (``uint8 clip batch → outputs dict``). Needs only jax — no model code."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read()).call


class ServeResult:
    """One served clip batch. Holds device arrays; converts lazily so the
    pipeline never blocks before the consumer actually needs the bytes."""

    __slots__ = ("_arrays", "n")

    def __init__(self, arrays: Dict[str, jnp.ndarray], n: int):
        self._arrays = arrays
        self.n = n  # valid rows (≤ compiled batch; rest is tail padding)

    def __getattr__(self, name):
        if name == "mask" and "mask" not in self._arrays:
            # bit-packed wire format — unpack on the host, same interface
            return unpack_mask_bits(self._arrays["mask_bits"])[: self.n]
        try:
            arr = self._arrays[name]
        except KeyError:
            raise AttributeError(name) from None
        return np.asarray(arr)[: self.n]

    def prefetch(self) -> "ServeResult":
        """Start async device→host copies of every output now, so the
        transfer overlaps later compute instead of blocking the consumer."""
        for arr in self._arrays.values():
            copy = getattr(arr, "copy_to_host_async", None)
            if copy is not None:
                try:
                    copy()
                except Exception:  # non-addressable shards etc. — fetch lazily
                    pass
        return self

    def keys(self):
        return self._arrays.keys()


def _smooth_synthetic_clips(key, shape):
    """Bilinear-upsampled coarse noise + per-frame drift — the "natural
    video"-like synthetic family (tools/run_convergence.py uses the same
    recipe). Used for int8 self-calibration: smooth content matches natural
    activation statistics far better than uniform pixel noise."""
    from .ops.resize import resize_bilinear
    b, t, s, _, c = shape
    k1, k2 = jax.random.split(key)
    coarse = jax.random.uniform(k1, (b, 1, 16, 16, c))
    drift = 0.05 * jax.random.normal(k2, (b, t, 1, 1, c))
    video = jnp.clip(resize_bilinear(coarse, (s, s)) + drift, 0.0, 1.0)
    return jnp.broadcast_to(video, shape)


def _mask_u8(probs, threshold):
    """Per-frame tamper mask as uint8 {0,255} from the extractor's sigmoid
    probabilities (`predict_mask` output — the net applies its own sigmoid,
    the reference's UNet convention, network/UNet.py:96)."""
    return (probs > threshold).astype(jnp.uint8) * jnp.uint8(255)


class WatermarkServer:
    """AOT-compiled, double-buffered server for watermark embed / detect.

    Parameters
    ----------
    cfg : Config
        Framework config — ``cfg.data`` fixes the compiled clip shape
        (batch_size, frames, gt_size); ``cfg.model`` picks the nets.
    ckpt_dir : str, optional
        Orbax checkpoint directory written by the trainers; latest (or
        ``step``) restored. Without it the server serves random-init params
        (pipeline smoke tests).
    modes : tuple of {"embed", "detect"}
        Which programs to compile (compile only what the deployment uses).
    mesh : jax.sharding.Mesh, optional
        Data-parallel serving: request batches shard over the ``data`` axis,
        params replicate. ``cfg.data.batch_size`` must divide by the mesh's
        data-axis size.
    threshold : float
        Mask binarisation threshold (reference protocol thresholds live in
        ``calculate_f1``'s 0.1–0.9 sweep; 0.5 is the serving default).
    int8_extract : bool
        Run detect/roundtrip's extractor through the int8 PTQ path
        (nets/unet_int8.py). Requires ``extractor='unet_tpu'`` (or
        ``unet_tpu2``) with the default head/upsample lowerings.
    int8_embed : bool
        Run embed/roundtrip's INN through the int8 PTQ path
        (nets/inn_int8.py). Requires the packed flagship embed
        (``inn_packed=True``). Calibrates on the same ``int8_calib`` clips
        (embed traffic is the *clean* clip — exactly what the calibration
        clips are).
    int8_calib : np.ndarray or iterable of np.ndarray, optional
        Calibration traffic: uint8 clips shaped ``(n, T, S, S, 3)``. In
        production pass representative inputs (clean clips for embed;
        watermarked and/or attacked frames for detect). Default:
        self-generated clips. Shared by both int8 paths — use
        ``int8_calib_embed`` / ``int8_calib_detect`` to give each its own
        traffic (clean clips vs watermarked/attacked frames).
    int8_calib_embed, int8_calib_detect : optional
        Path-specific calibration clips; each falls back to ``int8_calib``.
    int8_margin : float
        Calibration amax head-room multiplier (see ``unet_int8.calibrate``).
    """

    def __init__(self, cfg: Config, ckpt_dir: Optional[str] = None,
                 step: Optional[int] = None,
                 modes: Tuple[str, ...] = ("embed", "detect"),
                 mesh=None, threshold: float = 0.5,
                 int8_extract: bool = False, int8_embed: bool = False,
                 int8_calib=None, int8_calib_embed=None,
                 int8_calib_detect=None, int8_margin: float = 1.0):
        self.cfg = cfg
        self.mesh = mesh
        self.batch = cfg.data.batch_size
        self.frames = cfg.data.frames
        self.size = cfg.data.gt_size
        self.threshold = float(threshold)

        self.model = VideoWatermarkModel(cfg, mesh=mesh)
        states = self.model.init_states(jax.random.PRNGKey(0))
        if ckpt_dir is not None:
            at = step if step is not None else latest_step(ckpt_dir)
            if at is None:
                raise FileNotFoundError(
                    f"no checkpoint steps under {ckpt_dir!r}")
            states = restore_checkpoint(ckpt_dir, at, states)
            if mesh is not None:
                from .parallel import replicate
                states = replicate(states, mesh)
        # Serving is stateless: only params/variables ride along (optimizer
        # state stays in the checkpoint, not in server memory).
        self._params = {
            "netG": (states["netG"].params, states["netG"].variables),
            "generator": (states["generator"].params,
                          states["generator"].variables),
        }
        self._states_stub = states

        # Int8 PTQ conversion of the extractor / embed (deploy-time, off the
        # serving clock): fold BN, calibrate activation scales on
        # representative traffic, quantize. The qparams ride the program
        # ARGUMENTS like the f32 params — a checkpoint swap re-quantizes
        # without a recompile.
        self._q8 = None
        self._qe8 = None

        def _materialize(calib):
            # one-shot iterables are documented as allowed — materialize once
            # so int8_embed and int8_extract can both consume the default
            if calib is None or isinstance(calib, np.ndarray):
                return calib
            return list(calib)

        int8_calib = _materialize(int8_calib)
        calib_embed = (_materialize(int8_calib_embed)
                       if int8_calib_embed is not None else int8_calib)
        calib_detect = (_materialize(int8_calib_detect)
                        if int8_calib_detect is not None else int8_calib)
        if int8_embed:
            if not cfg.model.inn_packed:
                raise ValueError(
                    "int8_embed requires the packed flagship embed "
                    "(ModelConfig.inn_packed=True — nets/inn_int8.py "
                    "quantizes the packed executor's learned convs)")
            if calib_embed is None:
                # Self-calibration: embed traffic is the CLEAN clip. Use
                # smooth bilinear-upsampled coarse noise (the synthetic-clip
                # family of tools/exp_int8_eval.py) — spatially-uncorrelated
                # uniform noise has very different INN activation statistics
                # than natural video and would mis-set the scales.
                calib_clips = [np.asarray(
                    _smooth_synthetic_clips(
                        jax.random.PRNGKey(0),
                        (self.batch, self.frames, self.size, self.size, 3))
                    * 255).astype(np.uint8)]
            elif isinstance(calib_embed, np.ndarray):
                calib_clips = [calib_embed]
            else:
                calib_clips = list(calib_embed)
            from .models.video_model import _to_channels
            from .nets import inn_int8 as qe8
            self._qe8 = qe8
            to_ch = jax.jit(lambda v: _to_channels(v).astype(jnp.float32))
            batches = [np.asarray(to_ch(jnp.asarray(
                np.asarray(c).astype(np.float32) / 255.0)))
                for c in calib_clips]
            e_scales = qe8.calibrate(states["netG"].params, batches,
                                     channels=3 * self.frames,
                                     down_num=cfg.model.inn_down_num,
                                     margin=int8_margin)
            self._params["qemb"] = qe8.quantize(states["netG"].params,
                                                e_scales,
                                                channels=3 * self.frames,
                                                down_num=cfg.model.inn_down_num)
        if int8_extract:
            mc = cfg.model
            if (mc.extractor not in ("unet_tpu", "unet_tpu2")
                    or mc.extractor_head != "d2s"
                    or mc.extractor_up != "convt"):
                raise ValueError(
                    "int8_extract supports the UNetTPU extractor with the "
                    "default head ('d2s') and upsample ('convt') lowerings "
                    f"(got extractor={mc.extractor!r}, "
                    f"head={mc.extractor_head!r}, up={mc.extractor_up!r})")
            from .nets import unet_int8 as q8
            self._q8 = q8
            self._q8_s2d = mc.extractor_s2d
            plan = (mc.extractor_enc_convs
                    if mc.extractor_enc_convs is not None
                    else (1 if mc.extractor == "unet_tpu2" else 2))
            if calib_detect is None:
                # Self-calibration: watermark smooth synthetic clips with the
                # restored params — the roundtrip op's own detect-traffic
                # distribution. Production deployments should pass real
                # traffic instead.
                raw = np.asarray(
                    _smooth_synthetic_clips(
                        jax.random.PRNGKey(1),
                        (self.batch, self.frames, self.size, self.size, 3))
                    * 255).astype(np.uint8)
                out = jax.jit(self._embed_u8)(self._params,
                                              jnp.asarray(raw))
                clips = [np.asarray(out["watermarked"])]
            elif isinstance(calib_detect, np.ndarray):
                clips = [calib_detect]
            else:
                clips = list(calib_detect)
            batches = [
                np.asarray(c).astype(np.float32).reshape(
                    -1, self.size, self.size, 3) / 255.0
                for c in clips]
            gvars = {"params": states["generator"].params,
                     **states["generator"].variables}
            scales = q8.calibrate(gvars, batches, enc_convs=plan,
                                  s2d=self._q8_s2d, margin=int8_margin)
            self._params["qext"] = q8.quantize(gvars, scales,
                                               enc_convs=plan)

        self._in_sharding = None
        if mesh is not None:
            from .parallel import video_sharding
            self._in_sharding = video_sharding(mesh)

        shape = (self.batch, self.frames, self.size, self.size, 3)
        x_spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
        if self._in_sharding is not None:
            x_spec = jax.ShapeDtypeStruct(shape, jnp.uint8,
                                          sharding=self._in_sharding)
        # Params are ARGUMENTS of the compiled programs, not closure
        # captures — capturing them would bake ~10M weights into the HLO as
        # constants (slow compiles, full recompile on every checkpoint swap).
        p_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=getattr(a, "sharding",
                                                            None)),
            self._params)

        device_fns = {"embed": self._embed_u8, "detect": self._detect_u8,
                      "roundtrip": self._roundtrip_u8}
        self._compiled = {}
        for m in modes:
            self._compiled[m] = (
                jax.jit(device_fns[m]).lower(p_spec, x_spec).compile())

    # ---------------------------------------------------------- device fns

    def _wrap_states(self, params):
        s = dict(self._states_stub)
        for name in ("netG", "generator"):
            p, v = params[name]
            s[name] = s[name].replace(params=p, variables=v)
        return s

    def _embed_u8(self, params, x_u8):
        video = x_u8.astype(jnp.float32) / 255.0
        if self._qe8 is not None:
            from .models.video_model import _to_channels, _to_frames
            from .ops.quantize import clamp_with_grad, ste_quantize_255
            dt = self.model.compute_dtype or jnp.float32
            x = _to_channels(video.astype(dt))
            out = self._qe8.forward_int8(
                params["qemb"], x, channels=3 * self.frames,
                down_num=self.cfg.model.inn_down_num, dtype=dt)
            # bf16 transpose, then f32 quantize — the embed-epilogue layout
            # order the r3 profile picked (models/video_model.py::embed)
            fwd = ste_quantize_255(clamp_with_grad(
                _to_frames(out.astype(dt), self.frames).astype(jnp.float32)))
        else:
            fwd = self.model.embed(self._wrap_states(params), video)
        # embed() ends in ste_quantize_255: every value is already k/255 —
        # the uint8 round-trip is exact up to the one 8-bit level of jitter
        # the bf16 trunk itself carries (same rounding the trainer's STE
        # applies — scripts/generate_immunized.py's export protocol).
        out = jnp.clip(fwd.astype(jnp.float32), 0.0, 1.0)
        return {"watermarked": jnp.round(out * 255.0).astype(jnp.uint8)}

    def _detect_u8(self, params, x_u8):
        video = x_u8.astype(jnp.float32) / 255.0
        # predict_mask returns sigmoid PROBABILITIES (the extractor applies
        # its own sigmoid — the reference UNet convention, network/UNet.py:96;
        # the trainer's f1_sweep thresholds the same values). The int8 path
        # (nets/unet_int8.py) yields the same probabilities through the
        # quantized forward.
        if self._q8 is not None:
            b, t = video.shape[:2]
            flat = video.reshape(b * t, self.size, self.size, 3)
            probs = self._q8.apply_int8(params["qext"], flat,
                                        s2d=self._q8_s2d)
            probs = probs.reshape(b, t, self.size, self.size, 1
                                  ).astype(jnp.float32)
        else:
            probs = self.model.predict_mask(self._wrap_states(params), video,
                                            train=False).astype(jnp.float32)
        # clip-level verdict: mean tampered fraction per clip — the serving
        # analog of the reference's per-video F1 bookkeeping
        # (IRNcrop_model.py:581-607) when no GT mask exists at runtime.
        frac = jnp.mean(probs, axis=(1, 2, 3, 4))
        if self.size % 8 == 0:
            return {"mask_bits": _pack_mask_bits(probs > self.threshold),
                    "tamper_fraction": frac}
        return {"mask": _mask_u8(probs, self.threshold),
                "tamper_fraction": frac}

    def _roundtrip_u8(self, params, x_u8):
        """Embed → detect in one program. The detector sees exactly the
        uint8 the embed wire format would carry, so the fused op is
        bit-identical to two-stage serving — minus one full-resolution
        download + re-upload of the watermarked clip."""
        out = self._embed_u8(params, x_u8)
        det = self._detect_u8(params, out["watermarked"])
        return {**out, **det}

    # ------------------------------------------------------------- serving

    def _put(self, clip_u8: np.ndarray) -> Tuple[jnp.ndarray, int]:
        """Host→device upload with tail padding to the compiled batch."""
        n = clip_u8.shape[0]
        want = (self.batch, self.frames, self.size, self.size, 3)
        if clip_u8.dtype != np.uint8:
            raise TypeError(f"serving wire format is uint8, got "
                            f"{clip_u8.dtype} (scale to 0..255 on the host)")
        if clip_u8.shape[1:] != want[1:] or n > self.batch:
            raise ValueError(f"compiled clip shape is {want}, got "
                             f"{clip_u8.shape} — the server never retraces; "
                             f"start one per shape")
        if n < self.batch:
            pad = np.zeros((self.batch - n,) + want[1:], np.uint8)
            clip_u8 = np.concatenate([clip_u8, pad], axis=0)
        if self._in_sharding is not None:
            dev = jax.device_put(clip_u8, self._in_sharding)
        else:
            dev = jax.device_put(clip_u8)
        return dev, n

    def serve(self, clip_u8: np.ndarray, mode: str) -> ServeResult:
        """One synchronous-looking request (dispatch is still async — the
        result blocks only when its arrays are read)."""
        dev, n = self._put(clip_u8)
        return ServeResult(self._compiled[mode](self._params, dev), n)

    def serve_stream(self, clips: Iterable[np.ndarray], mode: str,
                     window: int = 2) -> Iterator[ServeResult]:
        """Pipelined serving: keeps ≤ ``window`` request batches in flight.

        Upload + dispatch of request N+1 proceeds while N computes; the
        oldest result is yielded (and thereby allowed to block) only when
        the window is full or the input is exhausted. ``window=2`` is
        classic double-buffering; raise it to hide a slower host link."""
        if mode not in self._compiled:
            raise KeyError(f"mode {mode!r} not compiled "
                           f"(modes={tuple(self._compiled)})")
        inflight = []
        for clip in clips:
            inflight.append(self.serve(clip, mode).prefetch())
            if len(inflight) >= max(1, window):
                yield inflight.pop(0)
        while inflight:
            yield inflight.pop(0)

    # ------------------------------------------------------------- export

    def export_program(self, mode: str, path: str,
                       platforms: Tuple[str, ...] = ("tpu", "cpu")) -> None:
        """Freeze one serving program into a self-contained deployment
        artifact (StableHLO via ``jax.export``): params are baked in as
        constants, so the file runs with ``load_exported`` on any machine
        with a listed platform — no vwfd_tpu, no model code, no retrace.
        The runtime analog of the reference's ``.pth`` hand-off, minus the
        python-side model zoo it requires.

        Works on mesh-backed servers too: serving params are *replicated*
        over the data mesh, so they gather losslessly to host and the
        exported program is always single-device — shard request batches at
        load time if the deployment needs a mesh."""
        for leaf in jax.tree_util.tree_leaves(self._params):
            if (hasattr(leaf, "is_fully_replicated")
                    and not leaf.is_fully_replicated):
                raise ValueError(
                    "export requires fully-replicated params (data-parallel "
                    "serving replicates them); found a sharded leaf")
        fn = {"embed": self._embed_u8, "detect": self._detect_u8,
              "roundtrip": self._roundtrip_u8}[mode]
        shape = (self.batch, self.frames, self.size, self.size, 3)
        x_spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
        params = jax.tree_util.tree_map(np.asarray, self._params)
        exported = jax.export.export(
            jax.jit(lambda x: fn(params, x)), platforms=list(platforms)
        )(x_spec)
        with open(path, "wb") as f:
            f.write(exported.serialize())

    # ------------------------------------------------------------ metadata

    def cost_analysis(self, mode: str):
        """XLA cost analysis of a compiled program (FLOPs / bytes) — the
        roofline inputs BASELINE.md's perf tables are built from."""
        return self._compiled[mode].cost_analysis()
