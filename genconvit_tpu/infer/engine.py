"""Jitted prediction engine.

Replaces the reference's serial predict path (ref prediction.py:231-266,
model/pred_func.py:18-64,111-131) with a TPU-first design:

  * fixed-shape [F,224,224,3] uint8 face batches + validity mask -> one
    compile per (num_frames, net), no recompiles across videos;
  * normalization fused into the jitted forward (single H2D of uint8);
  * a batched multi-video path ([V,F,...]) so the MXU sees large convs;
  * host decode/detect overlapped with device compute via a thread pool;
  * per-video fault tolerance with the reference's (0, 0.5) default verdict.
"""

from __future__ import annotations

import concurrent.futures as cf
import contextlib
import logging
import os
import time
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genconvit_tpu.config import Config
from genconvit_tpu.core.checkpoint import load_params, resolve_weight
from genconvit_tpu.core.pytree import live_params
from genconvit_tpu.data.faces import (FaceDetector, FullFrameDetector,
                                      RecordedDetector, crop_faces,
                                      make_detector)
from genconvit_tpu.data.preprocess import normalize_batch, pad_faces
from genconvit_tpu.data.video import extract_frames
from genconvit_tpu.infer.aggregate import DEFAULT_VERDICT, aggregate_logits
from genconvit_tpu.models.genconvit import genconvit_apply, init_genconvit
from genconvit_tpu.utils.timing import StageTimers

log = logging.getLogger("genconvit_tpu")


def default_compute_dtype() -> Any:
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _host_staging_context():
    """Context under which param loading/init and the load-time folds run.

    Pins jax's default device to the host CPU backend so every eager op
    (random init, layout folds, dtype casts) executes locally. Without it,
    from-scratch init dispatches ~300 tiny ops to the accelerator — measured
    0.5-1.3s EACH through a relay-attached TPU (97s for init_ed alone) — and
    the folds round-trip multi-GB trees device<->host. With it, the whole
    prep phase is host-local and the device sees exactly ONE upload.
    jax.random is backend-invariant (threefry), so initialized values are
    bitwise identical either way."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


class Predictor:
    def __init__(
        self,
        config: Optional[Config] = None,
        *,
        net: str = "genconvit",
        ed_weight: Optional[str] = None,
        vae_weight: Optional[str] = None,
        params: Optional[Dict[str, Any]] = None,
        dtype: Any = None,
        fp16: bool = False,
        face_backend: Optional[str] = None,
        deterministic_vae: bool = False,
        prefer_native_decode: bool = True,
        transfer_format: str = "rgb",  # 'rgb' | 'yuv420' (fullframe+native)
        seed: int = 0,
        params_device: str = "device",  # 'device' | 'defer' (upload lazily)
        kernel_plan: Optional[Any] = None,  # ops.kernel_plan.KernelPlan
        init_heads_on_device: Any = "auto",  # random init: generate the 630M-
        # param VAE latent heads with one jitted graph on the accelerator
        # instead of materializing+uploading ~2.5GB through the host (minutes
        # on a degraded host/link). 'auto' = TPU backend, no int8, no defer.
    ):
        self._params: Optional[Dict[str, Any]] = None
        self._params_host: Optional[Dict[str, Any]] = None
        # kernel-variant selection: resolved ONCE here (env feeds the
        # default); traced code consults the plan via plan_scope, never
        # os.environ (ops/kernel_plan.py)
        from genconvit_tpu.ops.kernel_plan import KernelPlan

        self.kernel_plan: KernelPlan = kernel_plan or KernelPlan.from_env()
        self.config = config or Config()
        self.net = net
        # --fp16 maps to bf16 on TPU (and actually works, unlike the
        # reference's broken half path — SURVEY.md §8 B1)
        self.dtype = dtype or (jnp.bfloat16 if fp16 else
                               jnp.dtype(self.config.compute_dtype)
                               if self.config.compute_dtype != "float32"
                               else default_compute_dtype())
        self.deterministic_vae = deterministic_vae
        self.prefer_native_decode = prefer_native_decode
        self.transfer_format = transfer_format
        self._rng = jax.random.PRNGKey(seed)
        self._video_counter = 0
        self._jit_cache: Dict[Tuple[int, bool], Any] = {}
        self.timers = StageTimers()

        backend = face_backend or self.config.face_backend
        # For the trained-detector family, degrade through working backends
        # rather than straight to the fullframe crop: 'hybrid' needs BOTH
        # the native haar shim and the jax checkpoint, so a missing shim
        # should still leave the jax detector (and 'jax' without a
        # checkpoint should still try the cascades). Other explicit choices
        # ('recorded', 'skin', ...) keep the direct fullframe fallback —
        # silently substituting a different detector would change the crop
        # geometry the caller asked for.
        if backend in ("hybrid", "jax", "haar"):
            ladder = [backend] + [b for b in ("jax", "haar", "fullframe")
                                  if b != backend]
        else:
            ladder = [backend, "fullframe"]
        for cand in ladder:
            try:
                self.detector: FaceDetector = make_detector(cand)
            except (FileNotFoundError, KeyError, ValueError) as e:
                log.warning("face backend %r unavailable (%s); trying next",
                            cand, e)
            else:
                if cand != backend:
                    log.warning("face backend %r -> fell back to %r",
                                backend, cand)
                break

        # ---- param prep: ALL host-side, then ONE device upload ----
        # (each phase logs its elapsed time so a cold-start hang is
        # diagnosable from the log tail alone)
        if init_heads_on_device == "auto":
            init_heads_on_device = (
                jax.default_backend() == "tpu"
                and params_device == "device"
                and os.environ.get("GENCONVIT_INT8_HEADS") != "1"
                and getattr(self.config.model, "vae_variant", "original")
                == "original")
        elif init_heads_on_device and os.environ.get(
                "GENCONVIT_INT8_HEADS") == "1":
            # the int8 quantization pass runs during host staging and would
            # silently miss heads generated on device afterwards — honor the
            # int8 request and fall back to the host init path
            log.warning("init_heads_on_device=True ignored: "
                        "GENCONVIT_INT8_HEADS=1 requires host-side heads")
            init_heads_on_device = False
        self._want_device_heads = bool(init_heads_on_device) and net in (
            "vae", "genconvit")
        self._device_latent_heads = False  # set by _load_or_init (random init)
        t0 = time.perf_counter()
        with _host_staging_context():
            if params is None:
                params = self._load_or_init(ed_weight, vae_weight)
                log.info("init: weights loaded/initialized on host in %.1fs",
                         time.perf_counter() - t0)
            params = live_params(params)
            if self.dtype == jnp.bfloat16:
                # Pre-cast once: the VAE latent heads alone are ~630M params —
                # casting fp32->bf16 inside every jitted call costs ~4GB of HBM
                # traffic per batch. Norm statistics are computed in fp32 inside
                # the ops regardless of storage dtype. Cast BEFORE the HWC fold
                # below: the fold is a pure permutation (dtype-agnostic), and
                # running it on bf16 halves the bytes it gathers — the fold was
                # the dominant cold-start phase on hosts with slow page faults.
                from genconvit_tpu.core.pytree import cast_floats

                t = time.perf_counter()
                params = cast_floats(params, jnp.bfloat16)
                log.info("init: bf16 cast %.1fs", time.perf_counter() - t)
            if self.kernel_plan.dw_rank:  # int>0 or "auto:<energy>[:<max>]"
                # opt-in rank-R separable depthwise (ops/dwsep.py): attach
                # SVD factors beside every 7x7 depthwise kernel. AFTER the
                # bf16 cast so the SVD factorizes the same effective weights
                # the exact path would convolve with. Approximation quality
                # is checkpoint-dependent — log it.
                from genconvit_tpu.ops.dwsep import add_dw_sep

                if self.kernel_plan.pallas in ("stage", "1"):
                    # the A/B Pallas variants read conv_dw.kernel directly
                    # inside their kernels (ops/pallas/convnext_stage.py,
                    # convnext_block.py) and would silently ignore the
                    # separable factors — the run would be EXACT while the
                    # logs claim approximate. Refuse the combination.
                    raise ValueError(
                        f"dw_rank={self.kernel_plan.dw_rank} is not supported "
                        f"with GENCONVIT_PALLAS={self.kernel_plan.pallas!r}: "
                        "the 'stage'/'1' A/B kernels convolve the exact 7x7 "
                        "weights and ignore separable factors. Use the "
                        "default backbone ('' / 'mlp' / 'mlpfull' / '0').")
                t = time.perf_counter()
                params, sst = add_dw_sep(params, self.kernel_plan.dw_rank)
                log.info(
                    "init: dw_rank=%s separable fold %.1fs (%d filter-"
                    "channels across %d blocks [rank mix %s, %d exact], "
                    "retained SVD energy mean %.3f min %.3f — APPROXIMATE "
                    "inference)", self.kernel_plan.dw_rank,
                    time.perf_counter() - t, int(sst["count"]),
                    int(sst["blocks_sep"]), sst["rank_hist"],
                    int(sst["blocks_exact"]),
                    sst["energy_mean"], sst["energy_min"])
                self.dw_sep_stats = sst
            if ("vae" in params and "encoder" in params["vae"]
                    and "mu" in params["vae"]["encoder"]
                    and os.environ.get("GENCONVIT_VAE_HWC", "1") == "1"):
                # fold the torch CHW flatten into the 630M-param latent heads
                # once at load (saves ~1.6ms/launch of transpose gathers); the
                # permuted tree is engine-local — checkpoints never see it.
                # Guarded on 'mu' so already-folded trees pass through.
                from genconvit_tpu.models.vae import permute_latent_heads_hwc

                t = time.perf_counter()
                params = dict(params)
                params["vae"] = permute_latent_heads_hwc(params["vae"])
                log.info("init: latent-head HWC fold %.1fs", time.perf_counter() - t)
            if "vae" in params and os.environ.get("GENCONVIT_INT8_HEADS") == "1":
                # opt-in weight-only int8 for the 630M-param latent heads
                # (models/vae.quantize_latent_heads_int8 — halves their
                # weight-read bandwidth; ~0.4%-of-column-max rounding). AFTER
                # the bf16 pre-cast: the per-column dequant scales must stay
                # f32 (casting them to bf16 would double the rounding error),
                # and quantizing the bf16-rounded weights matches the effective
                # weights the unquantized bf16 path uses.
                from genconvit_tpu.models.vae import quantize_latent_heads_int8

                t = time.perf_counter()
                params = dict(params)
                params["vae"] = quantize_latent_heads_int8(params["vae"])
                log.info("init: int8 head quantization %.1fs",
                         time.perf_counter() - t)
        if self._device_latent_heads:
            # random-init only: the ~630M-param mu/var heads were skipped on
            # host; generate them directly on the accelerator in their final
            # layout + dtype (one tiny jitted graph, no host materialization,
            # no multi-GB upload)
            t = time.perf_counter()
            params = dict(params)
            params["vae"] = dict(params["vae"])
            enc = params["vae"]["encoder"] = dict(params["vae"]["encoder"])
            enc.update(self._init_latent_heads_on_device())
            log.info("init: latent heads generated on device in %.1fs",
                     time.perf_counter() - t)
        if params_device == "defer":
            # directory-walking CLIs don't pay the upload until first launch
            self._params = None
            self._params_host = params
        else:
            self.params = self._upload_params(params)

    def _upload_params(self, host_params):
        # explicit target device: device_put(x, None) is identity for
        # committed arrays, and the host-staging context COMMITS every leaf
        # to the CPU backend
        t = time.perf_counter()
        dev = jax.device_put(host_params, jax.devices()[0])
        jax.block_until_ready(dev)
        log.info("init: param upload %.1fs", time.perf_counter() - t)
        return dev

    @property
    def params(self):
        if self._params is None and self._params_host is not None:
            self._params = self._upload_params(self._params_host)
            self._params_host = None
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._params_host = None

    # ------------------------------------------------------------- weights

    def _load_or_init(self, ed_weight: Optional[str],
                      vae_weight: Optional[str]) -> Dict[str, Any]:
        wd = self.config.weight_dir
        params: Dict[str, Any] = {}
        need = {"ed": ed_weight, "vae": vae_weight}
        for branch in ("ed", "vae"):
            if self.net not in (branch, "genconvit"):
                continue
            spec = need[branch]
            path = spec if spec and os.path.isfile(spec) else (
                resolve_weight(wd, spec) if spec else
                resolve_weight(wd, f"genconvit_{branch}_inference"))
            if path:
                p, meta = load_params(path, which=branch)
                log.info("loaded %s weights from %s (%s)", branch, path,
                         meta["source"])
                params[branch] = p
            else:
                log.warning(
                    "no %s weights found (looked for %r in %r) — using RANDOM "
                    "init; predictions will be meaningless", branch, spec, wd)
                skip = branch == "vae" and self._want_device_heads
                sub = init_genconvit(jax.random.PRNGKey(0), self.config,
                                     branch, skip_vae_latent_heads=skip)
                params[branch] = sub[branch]
                if skip and "mu" not in sub["vae"]["encoder"]:
                    self._device_latent_heads = True
        return params

    def _init_latent_heads_on_device(self) -> Dict[str, Any]:
        """Random-init latent heads generated on the accelerator.

        Shapes/init bound mirror models/vae.init_vae (torch Linear default,
        ref model/genconvit_vae.py:36-37). When the engine's HWC fold is
        active (GENCONVIT_VAE_HWC=1) the heads are emitted directly under
        the folded names: folding is a fixed permutation of rows/columns,
        and a permutation of iid draws is the same distribution, so for
        random weights "generate in folded layout" == "generate then fold".
        Values differ from the host path (threefry stream keyed separately)
        — random weights carry no parity contract."""
        from genconvit_tpu.models.genconvit import vae_latent_head_spec

        flat, latent, bound = vae_latent_head_spec(self.config)
        hwc = os.environ.get("GENCONVIT_VAE_HWC", "1") == "1"
        dt = self.dtype

        def gen(key):
            ks = jax.random.split(key, 4)

            def u(k, shape):
                return jax.random.uniform(
                    k, shape, jnp.float32, -bound, bound).astype(dt)

            names = ("mu_hwc", "var_hwc") if hwc else ("mu", "var")
            return {
                names[0]: {"kernel": u(ks[0], (flat, latent)),
                           "bias": u(ks[1], (latent,))},
                names[1]: {"kernel": u(ks[2], (flat, latent)),
                           "bias": u(ks[3], (latent,))},
            }

        with jax.default_device(jax.devices()[0]):
            heads = jax.jit(gen)(jax.random.PRNGKey(17))
        jax.block_until_ready(heads)
        return heads

    # ------------------------------------------------------------- forward

    def _forward_fn(self, num_frames: int, batched: bool, stacked: bool = False,
                    kernel_scope: bool = False):
        """stacked=True returns one f32 [2,V] array (y, y_val rows) instead of
        a tuple — streaming paths fetch ONE array per launch (each device->host
        fetch is a full relay/PCIe round trip; two tiny fetches per launch
        measurably throttle the stream).

        kernel_scope=True builds a SEPARATE jit whose trace runs inside
        convnext.kernel_backbone_scope() (the shard_map DP-eval path). It
        must be part of the cache key: the scope is a trace-time ContextVar,
        invisible to jit's own cache, so sharing one jit object between the
        scoped and unscoped callers would silently serve whichever variant
        traced first at a given shape. The Predictor's KernelPlan is bound
        the same way (and keyed the same way, for callers that mutate
        self.kernel_plan between calls)."""
        key = (num_frames, batched, stacked, kernel_scope, self.kernel_plan)
        if key in self._jit_cache:
            return self._jit_cache[key]
        net = self.net
        dtype = self.dtype
        sample = not self.deterministic_vae

        from genconvit_tpu.ops.kernel_plan import plan_scope

        plan = self.kernel_plan
        if kernel_scope:
            from genconvit_tpu.models.convnext import kernel_backbone_scope
            scope = kernel_backbone_scope
        else:
            import contextlib
            scope = contextlib.nullcontext

        def single(params, frames_u8, mask, rng):
            x = normalize_batch(frames_u8, dtype)
            with plan_scope(plan), scope():
                logits, _ = genconvit_apply(params, x, net=net, rng=rng, sample=sample)
            full_mask = jnp.concatenate([mask, mask]) if net == "genconvit" else mask
            return aggregate_logits(logits, full_mask)

        def batched_fn(params, frames_u8, mask, rng):
            # frames_u8: [V,F,S,S,3]; mask: [V,F] — flatten videos into one
            # device batch so the MXU sees V*F-sized convolutions.
            v, f = frames_u8.shape[:2]
            x = normalize_batch(frames_u8.reshape((v * f,) + frames_u8.shape[2:]), dtype)
            with plan_scope(plan), scope():
                logits, _ = genconvit_apply(params, x, net=net, rng=rng, sample=sample)
            if net == "genconvit":
                ed, vae = logits[: v * f], logits[v * f:]
                per_video = jnp.concatenate(
                    [ed.reshape(v, f, 2), vae.reshape(v, f, 2)], axis=1)
                full_mask = jnp.concatenate([mask, mask], axis=1)
            else:
                per_video = logits.reshape(v, f, 2)
                full_mask = mask
            y, y_val = jax.vmap(aggregate_logits)(per_video, full_mask)
            if stacked:
                return jnp.stack([y.astype(jnp.float32), y_val.astype(jnp.float32)])
            return y, y_val

        fn = jax.jit(batched_fn if batched else single)
        self._jit_cache[key] = fn
        return fn

    @staticmethod
    def _fetch_stacked(outs) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Device [2,V] stacked verdicts -> host (y [V] int, y_val [V]) pairs
        with ONE device->host fetch for the whole stream."""
        if not outs:
            return []
        all_np = np.asarray(jnp.stack(outs))  # [B,2,V]
        return [(row[0].astype(np.int64), row[1]) for row in all_np]

    def _next_rng(self) -> jax.Array:
        self._video_counter += 1
        return jax.random.fold_in(self._rng, self._video_counter)

    # ------------------------------------------------------------- API

    def predict_faces(self, faces_u8: np.ndarray, num_frames: int) -> Tuple[int, float]:
        """faces_u8: [k,S,S,3] uint8, k in [0, num_frames]."""
        if len(faces_u8) == 0:
            return DEFAULT_VERDICT
        batch, mask = pad_faces(faces_u8, num_frames, self.config.img_size)
        fn = self._forward_fn(num_frames, batched=False)
        with self.timers.stage("device_forward"):
            y, y_val = fn(self.params, jnp.asarray(batch), jnp.asarray(mask),
                          self._next_rng())
            y, y_val = int(y), float(y_val)
        return y, y_val

    def extract_faces(self, video_path: str, num_frames: int) -> np.ndarray:
        """Decode + detect + crop for one video — the host-side stage.

        Fullframe + native decoder fast path: swscale decodes straight to the
        model size (fused decode+resize in C++), skipping detect/crop."""
        from genconvit_tpu.data.video import _maybe_inject_fault

        _maybe_inject_fault(video_path)
        if isinstance(self.detector, FullFrameDetector) and self.prefer_native_decode:
            try:
                from genconvit_tpu.data.native import NativeVideoReader, native_available
                from genconvit_tpu.data.frames import sample_frame_indices

                if native_available():
                    with self.timers.stage("decode"):
                        s = self.config.img_size
                        r = NativeVideoReader(video_path, out_size=(s, s))
                        try:
                            idx = sample_frame_indices(len(r), num_frames)
                            return r.read_frames(idx)
                        finally:
                            r.close()
            except IOError:
                raise
            except Exception as e:
                # fall through to the generic path, but never silently: a
                # native-decoder bug hiding behind the cv2 fallback would
                # only show up as a throughput regression
                log.warning("native fast path failed on %s (%s: %s); using "
                            "the generic decode path",
                            os.path.basename(video_path), type(e).__name__, e)
        with self.timers.stage("decode"):
            frames = extract_frames(video_path, num_frames, self.prefer_native_decode)
        if frames.size == 0:
            return np.zeros((0, self.config.img_size, self.config.img_size, 3),
                            dtype=np.uint8)
        det = self.detector
        if isinstance(det, RecordedDetector):
            det = det.for_video(os.path.basename(video_path))
        with self.timers.stage("detect"):
            boxes = det.detect(frames)
        with self.timers.stage("crop"):
            return crop_faces(frames, boxes, num_frames, self.config.img_size)

    def predict_video(self, video_path: str, num_frames: int = 15) -> Tuple[int, float]:
        faces = self.extract_faces(video_path, num_frames)
        return self.predict_faces(faces, num_frames)

    def extract_faces_from_frames_dir(self, frames_dir: str,
                                      num_frames: int) -> np.ndarray:
        """Pre-extracted frame images instead of a video container —
        equivalent of the reference's df_face_from_images workaround
        (ref predicition_video_format_error.py:16-23). Frames are the sorted
        image files, subsampled with the same stepping as video frames."""
        import cv2

        from genconvit_tpu.data.frames import sample_frame_indices

        names = sorted(f for f in os.listdir(frames_dir)
                       if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
        idx = sample_frame_indices(len(names), num_frames)
        frames = []
        for i in idx:
            img = cv2.imread(os.path.join(frames_dir, names[i]), cv2.IMREAD_COLOR)
            if img is not None:
                frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        if not frames:
            return np.zeros((0, self.config.img_size, self.config.img_size, 3),
                            dtype=np.uint8)
        frames = np.stack(frames)
        boxes = self.detector.detect(frames)
        return crop_faces(frames, boxes, num_frames, self.config.img_size)

    def predict_frames_dir(self, frames_dir: str, num_frames: int = 15
                           ) -> Tuple[int, float]:
        faces = self.extract_faces_from_frames_dir(frames_dir, num_frames)
        return self.predict_faces(faces, num_frames)

    def _extract_yuv(self, video_path: str, num_frames: int):
        """Fullframe YUV420 extraction: (y [F,S,S], u, v [F,S/2,S/2], affine
        [3,4], mask [F]) — half the H2D bytes of RGB. The per-video [3,4]
        affine carries both colorspace coefficients and range offsets, so
        mixed 601/709 and mixed full/limited-range batches stay exact."""
        from genconvit_tpu.data.frames import sample_frame_indices
        from genconvit_tpu.data.native import NativeVideoReader
        from genconvit_tpu.data.preprocess import yuv_affine
        from genconvit_tpu.data.video import _maybe_inject_fault

        _maybe_inject_fault(video_path)
        s = self.config.img_size
        with self.timers.stage("decode"):
            r = NativeVideoReader(video_path, out_size=(s, s))
            try:
                idx = sample_frame_indices(len(r), num_frames)
                y, u, v = r.read_frames_yuv(idx)
                space, full = r.color_info()
            finally:
                r.close()
        k = len(y)
        f = num_frames
        yb = np.zeros((f, s, s), np.uint8)
        ub = np.zeros((f, s // 2, s // 2), np.uint8)
        vb = np.zeros((f, s // 2, s // 2), np.uint8)
        yb[:k], ub[:k], vb[:k] = y[:f], u[:f], v[:f]
        mask = np.zeros((f,), np.float32)
        mask[: min(k, f)] = 1.0
        return yb, ub, vb, yuv_affine(space, full), mask

    def predict_files_yuv(self, paths: Sequence[str], num_frames: int = 15,
                          workers: int = 8, video_batch: int = 16,
                          ) -> List[Tuple[str, Optional[Tuple[int, float]]]]:
        """Fullframe low-H2D driver: native YUV420 decode at model size ->
        grouped [V,F,...] plane batches -> fused device conversion+forward
        with per-video colorspace matrices (mixed 601/709 groups are exact)."""
        ordered: Dict[str, Optional[Tuple[int, float]]] = {p: None for p in paths}
        fn = self._forward_fn_yuv(num_frames, stacked=True)
        pending: List[Tuple[str, Any]] = []
        in_flight_names: List[List[str]] = []
        in_flight: List[Any] = []

        def flush():
            if not pending:
                return
            names = [p for p, _ in pending]
            items = [it for _, it in pending]
            while len(items) < video_batch:  # pad tail: one compile per V
                z = items[0]
                items.append(tuple(np.zeros_like(a) for a in z[:3])
                             + (z[3], np.zeros_like(z[4])))
            yb = np.stack([it[0] for it in items])
            ub = np.stack([it[1] for it in items])
            vb = np.stack([it[2] for it in items])
            matrix = np.stack([it[3] for it in items]).astype(np.float32)
            masks = np.stack([it[4] for it in items])
            out = fn(self.params, jax.device_put(yb), jax.device_put(ub),
                     jax.device_put(vb), jax.device_put(matrix),
                     jax.device_put(masks), self._next_rng())
            in_flight_names.append(names)
            in_flight.append(out)
            pending.clear()

        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            futures = {ex.submit(self._extract_yuv, p, num_frames): p
                       for p in paths}
            for fut in cf.as_completed(futures):
                p = futures[fut]
                try:
                    item = fut.result()
                except Exception as e:
                    log.error("error on %s: %s", p, e)
                    continue
                if item[4].sum() == 0:
                    ordered[p] = DEFAULT_VERDICT
                    continue
                pending.append((p, item))
                if len(pending) >= video_batch:
                    flush()
        flush()
        with self.timers.stage("device_forward"):
            for names, (y, y_val) in zip(in_flight_names,
                                         self._fetch_stacked(in_flight)):
                for i, p in enumerate(names):
                    ordered[p] = (int(y[i]), float(y_val[i]))
        return [(p, ordered[p]) for p in paths]

    def predict_files_native_rgb(self, paths: Sequence[str], num_frames: int = 15,
                                 video_batch: int = 8,
                                 ) -> List[Tuple[str, Optional[Tuple[int, float]]]]:
        """Fullframe RGB driver over the C++ batched decoder: ONE
        gcv_decode_videos call per group fills the whole [V,F,S,S,3] block
        (fused decode+resize in the native thread pool,
        native/gcv_decode.cc:gcv_decode_videos) — no Python-side per-video
        readers. Launches are async, so group i+1's decode overlaps group
        i's device compute; one stacked fetch syncs everything."""
        from genconvit_tpu.data.native import decode_videos_batch
        from genconvit_tpu.data.video import _maybe_inject_fault

        s = self.config.img_size
        fn = self._forward_fn(num_frames, batched=True, stacked=True)
        ordered: Dict[str, Optional[Tuple[int, float]]] = {p: None for p in paths}
        in_flight_meta: List[Tuple[List[str], np.ndarray]] = []
        in_flight: List[Any] = []
        for g in range(0, len(paths), video_batch):
            group = []
            for p in paths[g: g + video_batch]:
                try:  # per-video fault tolerance (ref prediction.py:25-45)
                    _maybe_inject_fault(p)
                    group.append(p)
                except Exception as e:
                    log.error("error on %s: %s", p, e)
            if not group:
                continue
            with self.timers.stage("decode"):
                frames, counts = decode_videos_batch(group, num_frames, s, s)
            masks = (np.arange(num_frames)[None, :]
                     < counts[:, None]).astype(np.float32)
            if len(group) < video_batch:  # pad the tail: one compile per V
                padn = video_batch - len(group)
                frames = np.concatenate(
                    [frames, np.zeros((padn,) + frames.shape[1:], frames.dtype)])
                masks = np.concatenate(
                    [masks, np.zeros((padn,) + masks.shape[1:], masks.dtype)])
            out = fn(self.params, jax.device_put(frames),
                     jax.device_put(masks), self._next_rng())
            in_flight_meta.append((group, counts))
            in_flight.append(out)
        with self.timers.stage("device_forward"):
            for (names, counts), (y, y_val) in zip(in_flight_meta,
                                                   self._fetch_stacked(in_flight)):
                for i, p in enumerate(names):
                    ordered[p] = DEFAULT_VERDICT if counts[i] == 0 else \
                        (int(y[i]), float(y_val[i]))
        return [(p, ordered[p]) for p in paths]

    def predict_files_group_detect(self, paths: Sequence[str],
                                   num_frames: int = 15, workers: int = 8,
                                   video_batch: int = 8,
                                   ) -> List[Tuple[str, Optional[Tuple[int, float]]]]:
        """Grouped driver for detector backends (the production default
        `hybrid` path — VERDICT r3 #2): per group of `video_batch` videos,
        decode in the host thread pool (C++/cv2 release the GIL), run ONE
        batched detect_many over the whole group (the jax pyramid scores
        every video's windows in a single device call instead of one
        relay/PCIe round trip per video), crop on host (same cv2 INTER_AREA
        geometry as the per-video path — boxes and crops are identical),
        then launch the model asynchronously so group i+1's decode+detect
        overlaps group i's device compute; one stacked fetch syncs all.
        Replaces the reference's serial per-frame hot loop
        (ref model/pred_func.py:67-92)."""
        fn = self._forward_fn(num_frames, batched=True, stacked=True)
        ordered: Dict[str, Optional[Tuple[int, float]]] = {p: None for p in paths}
        in_flight_names: List[List[str]] = []
        in_flight: List[Any] = []
        groups = [list(paths[g: g + video_batch])
                  for g in range(0, len(paths), video_batch)]
        ex = cf.ThreadPoolExecutor(max_workers=workers)
        try:
            self._group_detect_loop(groups, ex, num_frames,
                                    video_batch, fn, ordered,
                                    in_flight_names, in_flight)
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
        with self.timers.stage("device_forward"):
            for names, (y, y_val) in zip(in_flight_names,
                                         self._fetch_stacked(in_flight)):
                for i, p in enumerate(names):
                    ordered[p] = (int(y[i]), float(y_val[i]))
        return [(p, ordered[p]) for p in paths]

    def _group_detect_loop(self, groups, ex, num_frames,
                           video_batch, fn, ordered, in_flight_names,
                           in_flight) -> None:
        """Inner loop of predict_files_group_detect (split out so the
        executor teardown wraps it in one try/finally).

        Fully software-pipelined (VERDICT r4 #3): decode(i+1) runs in the
        pool while detect(i) runs as its OWN pool future, and the main
        thread crops/launches group i-1 meanwhile — so detect(i) overlaps
        both forward-dispatch(i-1) and the decode wait for i+1. The
        "decode" and "detect" stage timers therefore measure residual WAIT,
        not work: when one stage dominates, the other's timer goes ~0."""
        from genconvit_tpu.data.video import _maybe_inject_fault

        s = self.config.img_size

        def grab(p):
            _maybe_inject_fault(p)
            return extract_frames(p, num_frames, self.prefer_native_decode)

        def detect(det_items):
            # cascade handles are pool-bounded (data/faces.py), so running
            # the detector in a worker thread is safe; jit'd jax calls are
            # thread-safe (the device serializes launches)
            if isinstance(self.detector, RecordedDetector):
                return [
                    self.detector.for_video(os.path.basename(p)).detect(f)
                    for p, f in det_items]
            return self.detector.detect_many([f for _, f in det_items])

        def crop_and_launch(det_items, boxes_fut):
            with self.timers.stage("detect"):  # residual wait only
                boxes_list = boxes_fut.result()
            names: List[str] = []
            rows: List[Tuple[np.ndarray, np.ndarray]] = []
            with self.timers.stage("crop"):
                for (p, f), boxes in zip(det_items, boxes_list):
                    faces = crop_faces(f, boxes, num_frames, s)
                    if len(faces) == 0:  # zero faces: (0, 0.5) default (B2)
                        ordered[p] = DEFAULT_VERDICT
                        continue
                    rows.append(pad_faces(faces, num_frames, s))
                    names.append(p)
            if not names:
                return
            faces_b = np.stack([r[0] for r in rows])
            masks_b = np.stack([r[1] for r in rows])
            if len(names) < video_batch:  # pad the tail: one compile per V
                padn = video_batch - len(names)
                faces_b = np.concatenate(
                    [faces_b, np.zeros((padn,) + faces_b.shape[1:],
                                       faces_b.dtype)])
                masks_b = np.concatenate(
                    [masks_b, np.zeros((padn,) + masks_b.shape[1:],
                                       masks_b.dtype)])
            out = fn(self.params, jax.device_put(faces_b),
                     jax.device_put(masks_b), self._next_rng())
            in_flight_names.append(names)
            in_flight.append(out)  # async; one fetch at the end

        next_futs = ({p: ex.submit(grab, p) for p in groups[0]}
                     if groups else {})
        pending = None  # (det_items, detect future) for group i-1
        for gi, group in enumerate(groups):
            cur_futs = next_futs
            if gi + 1 < len(groups):
                # one-group decode lookahead: group i+1 decodes in the pool
                # while group i detects/crops/launches
                next_futs = {p: ex.submit(grab, p) for p in groups[gi + 1]}
            frames_map: Dict[str, np.ndarray] = {}
            with self.timers.stage("decode"):
                for p, fut in cur_futs.items():
                    try:  # per-video tolerance (ref prediction.py:25-45)
                        frames_map[p] = fut.result()
                    except Exception as e:
                        log.error("error on %s: %s", p, e)
            det_items = []
            for p in group:
                f = frames_map.get(p)
                if f is None:
                    continue  # decode error: stays None
                if f.size == 0:
                    ordered[p] = DEFAULT_VERDICT
                else:
                    det_items.append((p, f))
            det_fut = ex.submit(detect, det_items) if det_items else None
            if pending is not None:
                crop_and_launch(*pending)  # overlaps detect(i) in the pool
            pending = (det_items, det_fut) if det_fut is not None else None
        if pending is not None:
            crop_and_launch(*pending)

    def predict_files(self, paths: Sequence[str], num_frames: int = 15,
                      workers: int = 8, video_batch: int = 8,
                      ) -> List[Tuple[str, Optional[Tuple[int, float]]]]:
        """Batch driver: host preprocessing in a thread pool (cv2/FFmpeg
        release the GIL), videos grouped into [V,F,...] blocks whose device
        transfers overlap compute (one launch per V videos, not per video).
        Failures yield None (per-video fault tolerance, ref prediction.py:25-45).
        Zero-face videos get the (0, 0.5) default without a device trip.
        """
        if (len(paths) > 1 and isinstance(self.detector, FullFrameDetector)
                and self.prefer_native_decode):
            try:
                from genconvit_tpu.data.native import native_available

                if native_available():
                    if self.transfer_format == "yuv420":
                        return self.predict_files_yuv(paths, num_frames, workers)
                    return self.predict_files_native_rgb(paths, num_frames,
                                                         video_batch)
            except Exception as e:
                log.warning("native batch path unavailable (%s); using the "
                            "generic driver", e)
        if (len(paths) > 1 and not isinstance(self.detector, FullFrameDetector)
                and os.environ.get("GENCONVIT_GROUP_DETECT", "1") == "1"):
            # detector backends (hybrid/jax/haar/...): grouped decode ->
            # one batched detect per group -> async launches
            return self.predict_files_group_detect(paths, num_frames,
                                                   workers, video_batch)
        ordered: Dict[str, Optional[Tuple[int, float]]] = {p: None for p in paths}
        if not paths:
            return []
        s = self.config.img_size
        fn = (self._forward_fn(num_frames, batched=True, stacked=True)
              if len(paths) > 1 else None)

        pending: List[Tuple[str, np.ndarray, np.ndarray]] = []
        in_flight_names: List[List[str]] = []
        in_flight: List[Any] = []

        def flush():
            if not pending:
                return
            names = [p for p, _, _ in pending]
            faces = np.stack([f for _, f, _ in pending])
            masks = np.stack([m for _, _, m in pending])
            if len(names) < video_batch:  # pad the tail: one compile per V
                padn = video_batch - len(names)
                faces = np.concatenate(
                    [faces, np.zeros((padn,) + faces.shape[1:], faces.dtype)])
                masks = np.concatenate(
                    [masks, np.zeros((padn,) + masks.shape[1:], masks.dtype)])
            fd, md = jax.device_put(faces), jax.device_put(masks)
            out = fn(self.params, fd, md, self._next_rng())
            in_flight_names.append(names)
            in_flight.append(out)  # async; one fetch for all at the end
            pending.clear()

        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            futures = {ex.submit(self.extract_faces, p, num_frames): p
                       for p in paths}
            for fut in cf.as_completed(futures):
                p = futures[fut]
                try:
                    faces = fut.result()
                except Exception as e:  # per-video tolerance
                    log.error("error on %s: %s", p, e)
                    continue
                if len(faces) == 0:
                    ordered[p] = DEFAULT_VERDICT
                    continue
                if fn is None:  # single video: use the per-video path
                    ordered[p] = self.predict_faces(faces, num_frames)
                    continue
                batch, mask = pad_faces(faces, num_frames, s)
                pending.append((p, batch, mask))
                if len(pending) >= video_batch:
                    flush()
        if fn is not None:
            flush()
        with self.timers.stage("device_forward"):
            for names, (y, y_val) in zip(in_flight_names,
                                         self._fetch_stacked(in_flight)):
                for i, p in enumerate(names):
                    ordered[p] = (int(y[i]), float(y_val[i]))
        return [(p, ordered[p]) for p in paths]

    def predict_videos_batched(self, faces_batch: np.ndarray, masks: np.ndarray,
                               ) -> Tuple[np.ndarray, np.ndarray]:
        """Pre-extracted [V,F,S,S,3] + [V,F] -> (y [V], y_val [V]). The
        throughput path used by the benchmark and sharded evaluation."""
        fn = self._forward_fn(faces_batch.shape[1], batched=True)
        y, y_val = fn(self.params, jnp.asarray(faces_batch), jnp.asarray(masks),
                      self._next_rng())
        return np.asarray(y), np.asarray(y_val)

    def _forward_fn_yuv(self, num_frames: int, stacked: bool = False):
        """Batched forward taking planar YUV420 — half the H2D bytes of RGB;
        colorspace conversion fuses into the on-device normalize
        (data/preprocess.normalize_yuv420). stacked=True returns one f32
        [2,V] array for single-fetch streaming."""
        key = ("yuv", num_frames, stacked, self.kernel_plan)
        if key in self._jit_cache:
            return self._jit_cache[key]
        net = self.net
        dtype = self.dtype
        sample = not self.deterministic_vae

        from genconvit_tpu.data.preprocess import normalize_yuv420
        from genconvit_tpu.ops.kernel_plan import plan_scope

        plan = self.kernel_plan

        def fn(params, yp, up, vp, matrix, mask, rng):
            v, f, hh, ww = yp.shape
            if matrix.ndim == 3:  # per-video transforms [V,3,3|4] -> per frame
                matrix = jnp.repeat(matrix, f, axis=0)
            x = normalize_yuv420(yp.reshape(v * f, hh, ww),
                                 up.reshape(v * f, hh // 2, ww // 2),
                                 vp.reshape(v * f, hh // 2, ww // 2),
                                 matrix, dtype)
            with plan_scope(plan):
                logits, _ = genconvit_apply(params, x, net=net, rng=rng, sample=sample)
            if net == "genconvit":
                ed, vae = logits[: v * f], logits[v * f:]
                per_video = jnp.concatenate(
                    [ed.reshape(v, f, 2), vae.reshape(v, f, 2)], axis=1)
                full_mask = jnp.concatenate([mask, mask], axis=1)
            else:
                per_video = logits.reshape(v, f, 2)
                full_mask = mask
            y, y_val = jax.vmap(aggregate_logits)(per_video, full_mask)
            if stacked:
                return jnp.stack([y.astype(jnp.float32), y_val.astype(jnp.float32)])
            return y, y_val

        jfn = jax.jit(fn)
        self._jit_cache[key] = jfn
        return jfn

    def predict_videos_stream_yuv(self, batches) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Pipelined scoring of ((y,u,v) planes [V,F,...], matrix [3,3|4],
        mask [V,F]) batches — the low-H2D production path. All launches are
        dispatched asynchronously; ONE stacked fetch syncs the stream."""
        fn = None
        in_flight: List[Any] = []
        staged = None
        for planes, matrix, masks in batches:
            nxt = (tuple(jax.device_put(p) for p in planes),
                   jax.device_put(matrix), jax.device_put(masks))
            if staged is not None:
                if fn is None:
                    fn = self._forward_fn_yuv(staged[0][0].shape[1], stacked=True)
                in_flight.append(fn(self.params, *staged[0], staged[1],
                                    staged[2], self._next_rng()))
            staged = nxt
        if staged is not None:
            if fn is None:
                fn = self._forward_fn_yuv(staged[0][0].shape[1], stacked=True)
            in_flight.append(fn(self.params, *staged[0], staged[1], staged[2],
                                self._next_rng()))
        return self._fetch_stacked(in_flight)

    def predict_videos_stream(self, batches: Iterable[Tuple[np.ndarray, np.ndarray]],
                              ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Pipelined scoring of a stream of ([V,F,S,S,3], [V,F]) batches.

        The next batch's H2D transfer is issued (async) while the current
        batch computes; per-launch verdicts stay on device and ONE stacked
        fetch syncs the whole stream (each fetch is a full relay/PCIe round
        trip). This is the production shape of dataset-scale eval.
        """
        fn = None
        in_flight: List[Any] = []
        staged = None  # device-resident (faces, masks)
        for faces, masks in batches:
            nxt = (jax.device_put(faces), jax.device_put(masks))
            if staged is not None:
                if fn is None:
                    fn = self._forward_fn(staged[0].shape[1], batched=True,
                                          stacked=True)
                in_flight.append(fn(self.params, staged[0], staged[1],
                                    self._next_rng()))
            staged = nxt
        if staged is not None:
            if fn is None:
                fn = self._forward_fn(staged[0].shape[1], batched=True,
                                      stacked=True)
            in_flight.append(fn(self.params, staged[0], staged[1],
                                self._next_rng()))
        return self._fetch_stacked(in_flight)
