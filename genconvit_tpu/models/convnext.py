"""ConvNeXt backbone, functional NHWC implementation.

Graph-equivalent to timm 0.6.5 `convnext_tiny`/`convnext_large` as consumed by
the reference (ref: model/genconvit_ed.py:68, model/genconvit_vae.py:97): stem
(4x4/4 conv + LN), 4 stages of [optional LN+2x2/2 downsample; blocks of
depthwise-7x7 conv -> LN -> MLP(4x, exact GELU) -> layer-scale -> residual],
head (global avg pool -> LN -> fc).

TPU-first notes: the reference permutes NCHW<->NHWC inside every block; we are
NHWC end-to-end so those permutes vanish. The 1x1 MLP convs are expressed as
matmuls over the channel axis (MXU). Layer-scale folds into the fc2 matmul
epilogue under XLA fusion.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from genconvit_tpu.ops import conv2d, gelu, layer_norm, linear
from genconvit_tpu.ops.init import conv_init, layer_norm_init, linear_init, trunc_normal_init

CONVNEXT_CFGS: Dict[str, Dict[str, Any]] = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}

_LN_EPS = 1e-6
_LS_INIT = 1e-6  # timm ls_init_value


def init_convnext(key: jax.Array, name: str = "convnext_tiny", num_classes: int = 1000) -> Dict:
    cfg = CONVNEXT_CFGS[name]
    depths, dims = cfg["depths"], cfg["dims"]
    keys = iter(jax.random.split(key, 4 + 2 * sum(depths) * 4))

    params: Dict[str, Any] = {
        "stem": {
            "conv": conv_init(next(keys), 4, 4, 3, dims[0]),
            "norm": layer_norm_init(dims[0]),
        },
        "stages": [],
        "head": {
            "norm": layer_norm_init(dims[-1]),
            "fc": linear_init(next(keys), dims[-1], num_classes),
        },
    }
    in_dim = dims[0]
    for si, (depth, dim) in enumerate(zip(depths, dims)):
        stage: Dict[str, Any] = {"blocks": []}
        if si > 0:
            stage["downsample"] = {
                "norm": layer_norm_init(in_dim),
                "conv": conv_init(next(keys), 2, 2, in_dim, dim),
            }
        for _ in range(depth):
            blk = {
                # timm inits conv/linear weights with trunc_normal(0.02); biases 0
                "conv_dw": {
                    "kernel": trunc_normal_init(next(keys), (7, 7, 1, dim)),
                    "bias": jnp.zeros((dim,), jnp.float32),
                },
                "norm": layer_norm_init(dim),
                "mlp": {
                    "fc1": {
                        "kernel": trunc_normal_init(next(keys), (dim, 4 * dim)),
                        "bias": jnp.zeros((4 * dim,), jnp.float32),
                    },
                    "fc2": {
                        "kernel": trunc_normal_init(next(keys), (4 * dim, dim)),
                        "bias": jnp.zeros((dim,), jnp.float32),
                    },
                },
                "gamma": jnp.full((dim,), _LS_INIT, jnp.float32),
            }
            stage["blocks"].append(blk)
        params["stages"].append(stage)
        in_dim = dim
    return params


def _dw_conv(p: Dict, x: jax.Array, groups: int) -> jax.Array:
    """Depthwise conv of a block — exact 7x7, or the rank-R separable
    approximation when the engine attached `conv_dw_sep` factors
    (ops/dwsep.py, KernelPlan.dw_rank). Dispatch is on tree PRESENCE, so
    traced code needs no knob and jit caches re-key automatically. Each
    rank costs a 1x7 row pass + a 7x1 column pass (14 taps vs 49); the
    bias is applied once at the end, as in the exact path."""
    sep = p.get("conv_dw_sep")
    if sep is None:
        return conv2d(x, p["conv_dw"]["kernel"].astype(x.dtype),
                      p["conv_dw"]["bias"], padding=3, groups=groups)
    kr, kc = sep["kr"], sep["kc"]
    acc = None
    for r in range(kr.shape[0]):
        t = conv2d(x, kr[r].astype(x.dtype), None, padding=(0, 3), groups=groups)
        t = conv2d(t, kc[r].astype(x.dtype), None, padding=(3, 0), groups=groups)
        acc = t if acc is None else acc + t
    return acc + p["conv_dw"]["bias"].astype(acc.dtype)


def _block_xla(p: Dict, x: jax.Array) -> jax.Array:
    shortcut = x
    dim = x.shape[-1]
    x = _dw_conv(p, x, dim)
    x = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps=_LN_EPS)
    x = linear(x, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"])
    x = gelu(x)
    x = linear(x, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"])
    x = x * p["gamma"].astype(x.dtype)
    return shortcut + x


def _block_xla_folded(p: Dict, x: jax.Array) -> jax.Array:
    """Inference block with the LayerNorm folded into the fc1 matmul.

    LN(x) @ W == x @ (gamma*W) followed by a per-row affine epilogue:
      z = x @ diag(gamma) W
      out = (z - mu * (gamma @ W)) * rsqrt(var+eps) + (beta @ W + b1)
    Mathematically identical to _block_xla (fp rounding order differs —
    validated to bf16/f32 tolerance in tests). Profiled on the v5e: the
    standalone LN pass at [240,56,56,96] costs ~2.5ms + layout-churn copies;
    folding removes it, leaving a ~0.4ms f32 stats reduction. Used on the
    bf16 inference path only; training and f32 keep the standard graph.
    """
    shortcut = x
    dim = x.shape[-1]
    x = _dw_conv(p, x, dim)

    # LN moments via plain f32 reductions. (MXU-matmul stats — x @ ones/C —
    # win standalone on the microbench, 0.55 vs 2.4ms, but measured WORSE
    # in-model: the extra dwconv-output consumer breaks XLA's dwconv+stats
    # fusion and adds layout churn. Kept reduce-based per profile,
    # tools/microbench_block.py vs tools/profile_forward.py.)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + _LN_EPS)

    gamma = p["norm"]["scale"].astype(jnp.float32)
    beta = p["norm"]["bias"].astype(jnp.float32)
    w1 = p["mlp"]["fc1"]["kernel"].astype(jnp.float32)
    b1 = p["mlp"]["fc1"]["bias"].astype(jnp.float32)
    wg = (gamma[:, None] * w1).astype(x.dtype)   # [C, 4C], fused weight prep
    gw = gamma @ w1                               # [4C]
    bw = beta @ w1 + b1                           # [4C]

    z = jnp.dot(x, wg, preferred_element_type=jnp.float32)
    y = ((z - mu * gw) * inv + bw).astype(x.dtype)
    y = gelu(y)
    y = linear(y, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"])
    y = y * p["gamma"].astype(y.dtype)
    return shortcut + y


@jax.custom_vjp
def _block_pallas_op(p: Dict, x: jax.Array) -> jax.Array:
    from genconvit_tpu.ops.pallas.convnext_block import fused_convnext_block

    return fused_convnext_block(x, p)


def _block_pallas_fwd(p, x):
    return _block_pallas_op(p, x), (p, x)


def _block_pallas_bwd(res, g):
    # Backward = XLA autodiff of the reference graph (recomputes the forward,
    # i.e. built-in rematerialization — training wraps blocks in remat anyway)
    p, x = res
    _, vjp = jax.vjp(_block_xla, p, x)
    return vjp(g)


_block_pallas_op.defvjp(_block_pallas_fwd, _block_pallas_bwd)


def _block(p: Dict, x: jax.Array) -> jax.Array:
    # Dispatch, fastest-first (v5e profile, tools/microbench_ops.py):
    #  * bf16 -> LN-folded XLA block + rational GELU (_block_xla_folded):
    #    beats both the plain XLA graph and the fused Pallas slab kernel,
    #    whose cost was dominated by the erf GELU / LN VPU passes anyway.
    #  * KernelPlan.pallas='1' force-on keeps the Pallas slab kernel
    #    selectable for the big stages (A/B harness + regression tracking).
    #  * f32 (CPU tests, default-dtype training) -> the standard graph,
    #    bit-comparable with the torch oracles.
    from genconvit_tpu.ops.kernel_plan import current_plan

    if x.dtype == jnp.bfloat16:
        if (current_plan().pallas == "1"
                and x.shape[1] >= 28 and x.shape[1] % 14 == 0):
            return _block_pallas_op(p, x)
        return _block_xla_folded(p, x)
    return _block_xla(p, x)


@jax.custom_vjp
def _stage_pallas_op(blocks, x: jax.Array) -> jax.Array:
    from genconvit_tpu.ops.pallas.convnext_stage import fused_convnext_stage

    return fused_convnext_stage(x, blocks)


def _stage_pallas_fwd(blocks, x):
    return _stage_pallas_op(blocks, x), (blocks, x)


def _stage_pallas_bwd(res, g):
    # Backward = XLA autodiff of the reference block chain (recomputes the
    # forward — training wraps stages in remat anyway)
    blocks, x = res

    def chain(bs, v):
        for b in bs:
            v = _block_xla(b, v)
        return v

    _, vjp = jax.vjp(chain, list(blocks), x)
    db, dx = vjp(g)
    return list(db), dx


_stage_pallas_op.defvjp(_stage_pallas_fwd, _stage_pallas_bwd)


def _stage_chain_chunks(blocks, c: int):
    """Split a stage's block list into VMEM-budgeted chains for the fused
    stage kernel: all chained blocks' MLP weights must stay resident
    (2*C*4C bf16 each), alongside the slab/acc/hidden buffers."""
    per_block = 2 * c * 4 * c * 2  # w1+w2 bf16 bytes
    budget = 6 * 1024 * 1024
    k = max(1, min(len(blocks), budget // max(per_block, 1)))
    return [blocks[i:i + k] for i in range(0, len(blocks), k)]


def _pad_block_params(p: Dict, c: int, c_pad: int) -> Dict:
    """Zero-pad a block's channel-indexed params to c_pad lanes. The zeros
    keep pad lanes exact end-to-end (see fused_ln_mlp_residual docstring);
    the pads are O(C^2) weight ops, constant-folded cheap next to the
    [N,56,56,C] activations."""
    if c_pad == c:
        return p
    pc = c_pad - c
    out = {
        "conv_dw": {
            "kernel": jnp.pad(p["conv_dw"]["kernel"], ((0, 0), (0, 0), (0, 0), (0, pc))),
            "bias": jnp.pad(p["conv_dw"]["bias"], (0, pc)),
        },
        "norm": {
            "scale": jnp.pad(p["norm"]["scale"], (0, pc)),
            "bias": jnp.pad(p["norm"]["bias"], (0, pc)),
        },
        "mlp": {
            "fc1": {"kernel": jnp.pad(p["mlp"]["fc1"]["kernel"], ((0, pc), (0, 0))),
                    "bias": p["mlp"]["fc1"]["bias"]},
            "fc2": {"kernel": jnp.pad(p["mlp"]["fc2"]["kernel"], ((0, 0), (0, pc))),
                    "bias": jnp.pad(p["mlp"]["fc2"]["bias"], (0, pc))},
        },
        "gamma": jnp.pad(p["gamma"], (0, pc)),
    }
    if "conv_dw_sep" in p:  # rank-R separable factors pad on C like the 7x7
        out["conv_dw_sep"] = {
            "kr": jnp.pad(p["conv_dw_sep"]["kr"],
                          ((0, 0),) * 4 + ((0, pc),)),
            "kc": jnp.pad(p["conv_dw_sep"]["kc"],
                          ((0, 0),) * 4 + ((0, pc),)),
        }
    return out


@jax.custom_vjp
def _apply_stage_mlp_kernel(blocks, x: jax.Array) -> jax.Array:
    """Hybrid stage: XLA depthwise conv + Pallas fused LN/MLP/residual tail
    per block, with the channel axis zero-padded to a lane multiple of 128
    for the whole stage (dense panel DMAs; the padded conv measured FASTER
    than the unpadded dw+LN-stats fusion — stats moving into the kernel
    un-burdens XLA's conv emitter).

    Layout note (profiled, tools/profile_forward.py): the TPU conv emitter
    prefers a {3,0,2,1} physical layout (C minor, then N, W, H) while the
    Pallas custom-call pins row-major operands — left alone, XLA inserts a
    ~2ms relayout copy per stage-1 ensemble block between them. The kernel
    is per-pixel, so we hand it the logically-transposed [H,W,N,C] view:
    that transpose of a {3,0,2,1} array IS row-major (a free bitcast), and
    transposing back feeds the next conv its preferred layout again."""
    c = x.shape[-1]
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

    for blk in blocks:
        bp = _pad_block_params(blk, c, c_pad)
        dw = _dw_conv(bp, x, c_pad)
        dw_t = jnp.transpose(dw, (1, 2, 0, 3))
        x_t = jnp.transpose(x, (1, 2, 0, 3))
        out_t = fused_ln_mlp_residual(dw_t, x_t, bp, real_c=c)
        x = jnp.transpose(out_t, (2, 0, 1, 3))
    return x[..., :c] if c_pad != c else x


def _apply_stage_mlp_fwd(blocks, x):
    return _apply_stage_mlp_kernel(blocks, x), (blocks, x)


def _apply_stage_mlp_bwd(res, g):
    # backward = XLA autodiff of the reference block chain (recomputes the
    # forward — training wraps stages in remat anyway)
    blocks, x = res

    def chain(bs, v):
        for b in bs:
            v = _block_xla(b, v)
        return v

    _, vjp = jax.vjp(chain, list(blocks), x)
    db, dx = vjp(g)
    return list(db), dx


_apply_stage_mlp_kernel.defvjp(_apply_stage_mlp_fwd, _apply_stage_mlp_bwd)


_KERNEL_SCOPE = __import__("contextvars").ContextVar("gcv_kernel_scope",
                                                     default=False)


def kernel_backbone_scope():
    """Context manager: while tracing inside it, convnext_features takes the
    Pallas kernel backbone even on multi-device processes. For manual-
    sharding contexts (shard_map) where every shard traces with local
    shapes, so the custom call is safe — XLA auto-sharding never sees it."""
    import contextlib

    @contextlib.contextmanager
    def scope():
        tok = _KERNEL_SCOPE.set(True)
        try:
            yield
        finally:
            _KERNEL_SCOPE.reset(tok)

    return scope()


@jax.custom_vjp
def _features_mlp_kernel(params: Dict, x: jax.Array) -> jax.Array:
    """Full backbone (stem LN onward) in the transposed, channel-padded
    space: every stage tensor lives as logical [H,W,N,C_pad] whose row-major
    layout equals the conv emitter's preferred {3,0,2,1} physical layout of
    the NHWC view — so the transposes around each conv are layout bitcasts,
    and the Pallas MLP-tail kernels see dense lane-aligned panels. The stem
    LN runs as the Pallas layer_norm_rows kernel and each downsample LN is
    fused into the previous stage's last MLP kernel (post_ln); all
    conv/LN/MLP weights are zero-padded so pad lanes stay exactly zero
    end-to-end. Profiled: removes the ~5ms of per-stage pad+relayout fusions
    the per-stage kernel path pays (tools/profile_forward.py)."""
    dims = [s["blocks"][0]["gamma"].shape[0] for s in params["stages"]]
    c = dims[0]
    c_pad = -(-c // 128) * 128
    stem_k = jnp.pad(params["stem"]["conv"]["kernel"], ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    stem_b = jnp.pad(params["stem"]["conv"]["bias"], (0, c_pad - c))
    x = conv2d(x, stem_k.astype(x.dtype), stem_b, stride=4)   # [N,H,W,c_pad]
    t = jnp.transpose(x, (1, 2, 0, 3))                        # [H,W,N,c_pad]
    from genconvit_tpu.ops.pallas.convnext_mlp import (fused_ln_mlp_residual,
                                                       layer_norm_rows)

    t = layer_norm_rows(
        t, jnp.pad(params["stem"]["norm"]["scale"], (0, c_pad - c)),
        jnp.pad(params["stem"]["norm"]["bias"], (0, c_pad - c)), real_c=c)

    n_stages = len(params["stages"])
    for si, stage in enumerate(params["stages"]):
        ds = stage.get("downsample")
        if ds is not None:
            # the downsample LN already ran fused into the previous stage's
            # last kernel (post_ln below) — conv directly
            c_new = dims[si]
            cn_pad = -(-c_new // 128) * 128
            dk = jnp.pad(ds["conv"]["kernel"],
                         ((0, 0), (0, 0), (0, c_pad - c), (0, cn_pad - c_new)))
            db = jnp.pad(ds["conv"]["bias"], (0, cn_pad - c_new))
            xn = jnp.transpose(t, (2, 0, 1, 3))
            xn = conv2d(xn, dk.astype(xn.dtype), db, stride=2)
            t = jnp.transpose(xn, (1, 2, 0, 3))
            c, c_pad = c_new, cn_pad
        for bi, blk in enumerate(stage["blocks"]):
            bp = _pad_block_params(blk, c, c_pad)
            xn = jnp.transpose(t, (2, 0, 1, 3))
            dw = _dw_conv(bp, xn, c_pad)
            dw_t = jnp.transpose(dw, (1, 2, 0, 3))
            post_ln = None
            if bi == len(stage["blocks"]) - 1 and si + 1 < n_stages:
                # guard: only fuse the next stage's downsample LN when that
                # stage actually has one (mirrors the plain path's `if ds`)
                nxt = params["stages"][si + 1].get("downsample")
                if nxt is not None:
                    post_ln = (jnp.pad(nxt["norm"]["scale"], (0, c_pad - c)),
                               jnp.pad(nxt["norm"]["bias"], (0, c_pad - c)))
            t = fused_ln_mlp_residual(dw_t, t, bp, real_c=c, post_ln=post_ln)
    out = jnp.transpose(t, (2, 0, 1, 3))
    return out[..., :c] if c_pad != c else out


def _features_mlp_fwd(params, x):
    return _features_mlp_kernel(params, x), (params, x)


def _features_mlp_bwd(res, g):
    # backward = XLA autodiff of the reference features graph (recompute)
    params, x = res

    def ref(p, v):
        v = conv2d(v, p["stem"]["conv"]["kernel"], p["stem"]["conv"]["bias"], stride=4)
        v = layer_norm(v, p["stem"]["norm"]["scale"], p["stem"]["norm"]["bias"], eps=_LN_EPS)
        for stage in p["stages"]:
            ds = stage.get("downsample")
            if ds is not None:
                v = layer_norm(v, ds["norm"]["scale"], ds["norm"]["bias"], eps=_LN_EPS)
                v = conv2d(v, ds["conv"]["kernel"], ds["conv"]["bias"], stride=2)
            for blk in stage["blocks"]:
                v = _block_xla(blk, v)
        return v

    _, vjp = jax.vjp(ref, params, x)
    return vjp(g)


_features_mlp_kernel.defvjp(_features_mlp_fwd, _features_mlp_bwd)


def _apply_stage(blocks, x: jax.Array, stage_idx: int = -1) -> jax.Array:
    """Apply a stage's blocks. The bf16-TPU default never reaches here (the
    whole-backbone kernel path intercepts in convnext_features);
    KernelPlan.pallas='mlp[:0,1]' selects the per-stage hybrid XLA-dw +
    Pallas-MLP-tail path by 0-based stage index (59.2 ms/launch vs the
    55.5 default, STATUS.md); 'stage'/'1' select the older fused-kernel A/B
    paths; anything else (incl. '0') is the plain XLA folded dispatch."""
    from genconvit_tpu.ops.kernel_plan import current_plan

    mode = current_plan().pallas
    if (x.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
            and mode.startswith("mlp") and mode != "mlpfull"):
        sel = mode.partition(":")[2]
        if not sel or str(stage_idx) in sel.split(","):
            return _apply_stage_mlp_kernel(blocks, x)
        mode = ""  # fall through to the default path for unselected stages
    if (x.dtype == jnp.bfloat16 and mode == "stage"
            and jax.default_backend() == "tpu" and x.shape[1] >= 7
            and x.shape[-1] % 128 == 0):
        # whole-stage VMEM residency — only Mosaic-compilable for C%128==0
        # shapes (s3/s4); measured slower than the hybrid there, kept for A/B
        for chunk in _stage_chain_chunks(blocks, x.shape[-1]):
            x = _stage_pallas_op(chunk, x)
        return x
    for blk in blocks:
        x = _block(blk, x)
    return x


def convnext_features(params: Dict, x: jax.Array) -> jax.Array:
    """[N,H,W,3] -> [N,H/32,W/32,C] feature map (pre-head).

    bf16 TPU single-device inference DEFAULTS to the whole-backbone
    transposed/padded kernel path (_features_mlp_kernel) — fastest measured:
    55.5 ms/launch on the V=8 ensemble vs 59.2 for the per-stage hybrid
    (KernelPlan.pallas='mlp[:stages]') and 74.7 for plain XLA ('0').
    Single-device only by default: the Pallas custom call is opaque to XLA
    *auto*-sharding; 'mlpfull' forces it, and kernel_backbone_scope() (the
    shard_map data-parallel eval path, where each shard traces with local
    shapes) enables it per-trace."""
    from genconvit_tpu.ops.kernel_plan import current_plan

    plan = current_plan()
    mode = plan.pallas
    if (x.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
            and plan.gelu != "exact"  # exact erf has no Mosaic lowering —
            # honor the knob by falling back to the XLA graph
            and (mode == "mlpfull"
                 or (mode == "" and (jax.device_count() == 1
                                     or _KERNEL_SCOPE.get())))):
        return _features_mlp_kernel(params, x)
    x = conv2d(x, params["stem"]["conv"]["kernel"], params["stem"]["conv"]["bias"], stride=4)
    x = layer_norm(x, params["stem"]["norm"]["scale"], params["stem"]["norm"]["bias"], eps=_LN_EPS)
    for si, stage in enumerate(params["stages"]):
        ds = stage.get("downsample")
        if ds is not None:
            x = layer_norm(x, ds["norm"]["scale"], ds["norm"]["bias"], eps=_LN_EPS)
            x = conv2d(x, ds["conv"]["kernel"], ds["conv"]["bias"], stride=2)
        x = _apply_stage(stage["blocks"], x, si)
    return x


def convnext_apply(params: Dict, x: jax.Array) -> jax.Array:
    """Full forward: [N,H,W,3] -> [N,num_classes] (timm head: pool->LN->fc)."""
    x = convnext_features(params, x)
    x = jnp.mean(x, axis=(1, 2))
    x = layer_norm(x, params["head"]["norm"]["scale"], params["head"]["norm"]["bias"], eps=_LN_EPS)
    return linear(x, params["head"]["fc"]["kernel"], params["head"]["fc"]["bias"])


def head_out_features(params: Dict) -> int:
    return int(params["head"]["fc"]["kernel"].shape[-1])
