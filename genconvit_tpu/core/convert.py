"""Torch .pth -> JAX param-tree converter.

Converts the reference's published checkpoints (HuggingFace
`genconvit_ed_inference.pth` / `genconvit_vae_inference.pth`, which are
timm-0.6.5-era GenConViTED/GenConViTVAE state dicts — ref: model/genconvit.py:18-21
accepts both bare and {'state_dict': ...}-nested layouts) into this
framework's param pytrees.

Layout transforms:
  conv   OIHW -> HWIO            (transpose 2,3,1,0)
  convT  (Cin,Cout,kh,kw) -> HWIO of the forward view (transpose 2,3,0,1)
  linear (out,in) -> (in,out)    (transpose)
  LN/BN  weight/bias(/running_*) -> scale/bias(/mean/var)

Dead parameter groups (SURVEY.md §8 B9) — the Swin `embedder`, the
`*.patch_embed.{backbone,proj}` HybridEmbed copy (shared tensors with
`embedder`), VAE `encoder.fc1/fc2`, `fc3` — are carried so checkpoints
round-trip; the inference engine prunes them before device upload
(core/pytree.live_params).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Set

import numpy as np

# Checkpoint keys that are legitimately not converted: torch bookkeeping and
# deterministic buffers we recompute (SURVEY.md §2: relative_position_index
# depends only on the window size; attn_mask only on the grid).
_EXPECTED_UNCONSUMED = re.compile(
    r".*(num_batches_tracked|relative_position_index|attn_mask)$")


class _TrackingDict(Mapping):
    """Records which checkpoint keys conversion actually reads, so strict
    mode can prove the converter consumed the whole state dict (a silent
    misreading of timm layouts would otherwise pass every oracle test —
    VERDICT r1 missing item 2)."""

    def __init__(self, sd: Mapping[str, Any]):
        self._sd = sd
        self.used: Set[str] = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self._sd[k]

    def __contains__(self, k):  # presence checks don't count as consumption
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)


def _np(t) -> np.ndarray:
    """torch tensor / array -> float32 numpy (fp16 checkpoints upcast)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    arr = np.asarray(t)
    if arr.dtype == np.float16:
        arr = arr.astype(np.float32)
    return arr


def _conv(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _convT(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 0, 1),
        "bias": _np(sd[f"{name}.bias"]),
    }


def _linear(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _norm(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _bn(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{name}.weight"]),
        "bias": _np(sd[f"{name}.bias"]),
        "mean": _np(sd[f"{name}.running_mean"]),
        "var": _np(sd[f"{name}.running_var"]),
    }


class _PrefixView(Mapping):
    """Prefix-stripped view of a state dict that forwards reads to the
    parent — so _TrackingDict consumption accounting survives _sub()."""

    def __init__(self, sd: Mapping[str, Any], prefix: str):
        self._sd = sd
        self._prefix = prefix
        self._keys = [k[len(prefix):] for k in sd if k.startswith(prefix)]

    def __getitem__(self, k):
        return self._sd[self._prefix + k]

    def __contains__(self, k):
        return (self._prefix + k) in self._sd

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)


def _sub(sd: Mapping[str, Any], prefix: str) -> Mapping[str, Any]:
    return _PrefixView(sd, prefix)


def _consume_hybrid_aliases(sd: Mapping[str, Any], backbone_prefix: str) -> None:
    """The reference's HybridEmbed registers the SAME Swin module under both
    `embedder.*` and `<backbone>.patch_embed.backbone.*` (ref
    model/genconvit_ed.py:69-70) — the latter keys are tensor aliases of the
    former. Mark them consumed so strict mode doesn't flag duplicates."""
    used = getattr(sd, "used", None)
    if used is None:
        return
    alias_prefix = f"{backbone_prefix}.patch_embed.backbone."
    for k in sd:
        if k.startswith(alias_prefix):
            used.add(k)


def _count(sd: Mapping[str, Any], pattern: str) -> int:
    """Number of distinct integer captures for a regex over the keys."""
    found = set()
    rx = re.compile(pattern)
    for k in sd:
        m = rx.match(k)
        if m:
            found.add(int(m.group(1)))
    return len(found)


# ---------------------------------------------------------------- ConvNeXt


def convert_convnext(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """timm-0.6.5 ConvNeXt state dict (keys: stem.*, stages.*, head.*) ->
    models/convnext.py param tree. Ignores foreign keys (e.g. patch_embed.*)."""
    params: Dict[str, Any] = {
        "stem": {"conv": _conv(sd, "stem.0"), "norm": _norm(sd, "stem.1")},
        "stages": [],
        "head": {"norm": _norm(sd, "head.norm"), "fc": _linear(sd, "head.fc")},
    }
    n_stages = _count(sd, r"stages\.(\d+)\.")
    for si in range(n_stages):
        stage: Dict[str, Any] = {"blocks": []}
        if f"stages.{si}.downsample.0.weight" in sd:
            stage["downsample"] = {
                "norm": _norm(sd, f"stages.{si}.downsample.0"),
                "conv": _conv(sd, f"stages.{si}.downsample.1"),
            }
        n_blocks = _count(sd, rf"stages\.{si}\.blocks\.(\d+)\.")
        for bi in range(n_blocks):
            p = f"stages.{si}.blocks.{bi}"
            stage["blocks"].append({
                "conv_dw": _conv(sd, f"{p}.conv_dw"),
                "norm": _norm(sd, f"{p}.norm"),
                "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                        "fc2": _linear(sd, f"{p}.mlp.fc2")},
                "gamma": _np(sd[f"{p}.gamma"]),
            })
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------- Swin


def convert_swin(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """timm-0.6.5 Swin state dict (patch_embed.*, layers.*, norm.*, head.*) ->
    models/swin.py param tree. relative_position_index buffers are recomputed,
    not converted."""
    params: Dict[str, Any] = {
        "patch_embed": {
            "proj": _conv(sd, "patch_embed.proj"),
            "norm": _norm(sd, "patch_embed.norm"),
        },
        "layers": [],
        "norm": _norm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    n_layers = _count(sd, r"layers\.(\d+)\.")
    for li in range(n_layers):
        layer: Dict[str, Any] = {"blocks": []}
        n_blocks = _count(sd, rf"layers\.{li}\.blocks\.(\d+)\.")
        for bi in range(n_blocks):
            p = f"layers.{li}.blocks.{bi}"
            layer["blocks"].append({
                "norm1": _norm(sd, f"{p}.norm1"),
                "attn": {
                    "qkv": _linear(sd, f"{p}.attn.qkv"),
                    "proj": _linear(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table": _np(
                        sd[f"{p}.attn.relative_position_bias_table"]),
                },
                "norm2": _norm(sd, f"{p}.norm2"),
                "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                        "fc2": _linear(sd, f"{p}.mlp.fc2")},
            })
        if f"layers.{li}.downsample.reduction.weight" in sd:
            layer["downsample"] = {
                "norm": _norm(sd, f"layers.{li}.downsample.norm"),
                "reduction": _linear(sd, f"layers.{li}.downsample.reduction"),
            }
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------- branches


def convert_ed(sd: Mapping[str, Any], carry_dead_params: bool = True) -> Dict[str, Any]:
    """GenConViTED state dict -> models/ed.py tree.
    Sequential indices: encoder convs at features.{0,3,6,9,12}; decoder convTs
    at features.{0,2,4,6,8} (ref model/genconvit_ed.py:8-61)."""
    params: Dict[str, Any] = {
        "encoder": [_conv(sd, f"encoder.features.{i}") for i in (0, 3, 6, 9, 12)],
        "decoder": [_convT(sd, f"decoder.features.{i}") for i in (0, 2, 4, 6, 8)],
        "backbone": convert_convnext(_sub(sd, "backbone.")),
        "fc": _linear(sd, "fc"),
        "fc2": _linear(sd, "fc2"),
    }
    if carry_dead_params and "embedder.patch_embed.proj.weight" in sd:
        params["embedder"] = convert_swin(_sub(sd, "embedder."))
        if "backbone.patch_embed.proj.weight" in sd:
            params["hybrid_proj"] = _conv(sd, "backbone.patch_embed.proj")
        _consume_hybrid_aliases(sd, "backbone")
    return params


def convert_vae(sd: Mapping[str, Any], carry_dead_params: bool = True) -> Dict[str, Any]:
    """GenConViTVAE state dict -> models/vae.py tree.
    Sequential indices: encoder convs at features.{0,3,6,9}, BNs at
    features.{1,4,7,10}; decoder convTs at features.{0,2,4,6}
    (ref model/genconvit_vae.py:10-88)."""
    enc: Dict[str, Any] = {
        "convs": [_conv(sd, f"encoder.features.{i}") for i in (0, 3, 6, 9)],
        "bns": [_bn(sd, f"encoder.features.{i}") for i in (1, 4, 7, 10)],
        "mu": _linear(sd, "encoder.mu"),
        "var": _linear(sd, "encoder.var"),
    }
    if carry_dead_params:
        enc["fc1"] = _linear(sd, "encoder.fc1")
        enc["fc2"] = _linear(sd, "encoder.fc2")
    params: Dict[str, Any] = {
        "encoder": enc,
        "decoder": [_convT(sd, f"decoder.features.{i}") for i in (0, 2, 4, 6)],
        "backbone": convert_convnext(_sub(sd, "convnext_backbone.")),
        "fc": _linear(sd, "fc"),
        "fc2": _linear(sd, "fc2"),
    }
    if carry_dead_params:
        params["fc3"] = _linear(sd, "fc3")
        if "embedder.patch_embed.proj.weight" in sd:
            params["embedder"] = convert_swin(_sub(sd, "embedder."))
        if "convnext_backbone.patch_embed.proj.weight" in sd:
            params["hybrid_proj"] = _conv(sd, "convnext_backbone.patch_embed.proj")
        _consume_hybrid_aliases(sd, "convnext_backbone")
    return params


# ---------------------------------------------------------------- entry


def convert_vae_updated(sd: Mapping[str, Any],
                        carry_dead_params: bool = True) -> Dict[str, Any]:
    """genconvit_vae_updated state dict -> models/vae.py updated tree.
    Layout (ref model/genconvit_vae_updated.py): encoder as the original;
    decoder.decoder_input Linear + decoder.features with ConvTs at
    {0,3,6,9} and BNs at {1,4,7} (the last ConvT feeds Tanh, no BN)."""
    enc: Dict[str, Any] = {
        "convs": [_conv(sd, f"encoder.features.{i}") for i in (0, 3, 6, 9)],
        "bns": [_bn(sd, f"encoder.features.{i}") for i in (1, 4, 7, 10)],
        "mu": _linear(sd, "encoder.mu"),
        "var": _linear(sd, "encoder.var"),
    }
    if carry_dead_params:
        enc["fc1"] = _linear(sd, "encoder.fc1")
        enc["fc2"] = _linear(sd, "encoder.fc2")
    params: Dict[str, Any] = {
        "encoder": enc,
        "decoder": {
            "input": _linear(sd, "decoder.decoder_input"),
            "convs": [_convT(sd, f"decoder.features.{i}") for i in (0, 3, 6, 9)],
            "bns": [_bn(sd, f"decoder.features.{i}") for i in (1, 4, 7)],
        },
        "backbone": convert_convnext(_sub(sd, "convnext_backbone.")),
        "fc": _linear(sd, "fc"),
        "fc2": _linear(sd, "fc2"),
    }
    if carry_dead_params:
        params["fc3"] = _linear(sd, "fc3")
        if "embedder.patch_embed.proj.weight" in sd:
            params["embedder"] = convert_swin(_sub(sd, "embedder."))
        if "convnext_backbone.patch_embed.proj.weight" in sd:
            params["hybrid_proj"] = _conv(sd, "convnext_backbone.patch_embed.proj")
        _consume_hybrid_aliases(sd, "convnext_backbone")
    return params


def unwrap_state_dict(obj: Any) -> Mapping[str, Any]:
    """Accept bare state dicts and {'state_dict': ...}-nested checkpoints
    (ref model/genconvit.py:18-21) and train.py-style
    {'epoch','state_dict','optimizer','min_loss'} dicts (ref train.py:110-121)."""
    if isinstance(obj, Mapping) and "state_dict" in obj:
        return obj["state_dict"]
    return obj


def detect_branch(sd: Mapping[str, Any]) -> str:
    """'ed' | 'vae' | 'vae_updated' from the key signature."""
    if "decoder.decoder_input.weight" in sd:
        return "vae_updated"
    if any(k.startswith("convnext_backbone.") for k in sd):
        return "vae"
    return "ed"


def convert_checkpoint(path_or_obj: Any, which: Optional[str] = None,
                       carry_dead_params: bool = True,
                       strict: bool = False) -> Dict[str, Any]:
    """Load a reference .pth (path or already-loaded object) and convert.
    Returns the branch param tree; `which` overrides auto-detection.

    strict=True asserts every checkpoint key was consumed by the conversion
    (modulo torch bookkeeping/recomputed buffers) — the guard against a
    systematic misreading of the timm-0.6.5 layout that would otherwise
    silently ignore real weights. Run against the published HuggingFace
    checkpoints as step 1 of the parity runbook (docs/parity_runbook.md)."""
    obj = path_or_obj
    if isinstance(obj, str):
        import torch  # local import: torch is only needed for .pth IO
        obj = torch.load(obj, map_location="cpu", weights_only=False)
    sd = unwrap_state_dict(obj)
    which = which or detect_branch(sd)
    tracked = _TrackingDict(sd)
    if which == "ed":
        params = convert_ed(tracked, carry_dead_params)
    elif which == "vae":
        params = convert_vae(tracked, carry_dead_params)
    elif which == "vae_updated":
        params = convert_vae_updated(tracked, carry_dead_params)
    else:
        raise ValueError(f"unknown branch {which!r}")
    if strict:
        unused = sorted(
            k for k in sd
            if k not in tracked.used and not _EXPECTED_UNCONSUMED.match(k))
        if unused:
            shown = ", ".join(unused[:20])
            more = f" (+{len(unused) - 20} more)" if len(unused) > 20 else ""
            raise ValueError(
                f"strict conversion: {len(unused)} checkpoint key(s) were "
                f"not consumed — layout mismatch or new parameter group: "
                f"{shown}{more}")
    return params


# ---------------------------------------------------------------- manifest
# Weights-run pre-flight (VERDICT r3 item 5): the torch-side recorder emits
# a key/shape/dtype manifest of the real checkpoints
# (tools/record_reference_torch.py --manifest — needs only torch, not timm);
# preflight_manifest() then dry-runs the FULL strict conversion against a
# zeros state dict rebuilt from that manifest, so any timm-0.6.5 naming or
# shape drift is pinpointed in seconds, offline, without shipping the
# multi-GB weights (ref risk: SURVEY.md §7.3-1).

def manifest_from_state_dict(sd: Mapping[str, Any]) -> Dict[str, Dict[str, Any]]:
    """{key: {"shape": [...], "dtype": "float32"}} for a state dict of
    torch tensors or numpy arrays (dtype normalized, 'torch.' stripped)."""
    out = {}
    for k, v in sd.items():
        dt = str(getattr(v, "dtype", "float32"))
        if dt.startswith("torch."):
            dt = dt[len("torch."):]
        out[k] = {"shape": [int(s) for s in getattr(v, "shape", ())],
                  "dtype": dt}
    return out


def state_dict_from_manifest(manifest: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Zeros state dict with the manifest's shapes/dtypes (torch dtype names
    map onto numpy's; unknown names fall back to float32)."""
    alias = {"float": "float32", "double": "float64", "half": "float16",
             "long": "int64", "int": "int32", "bfloat16": "float32"}
    sd = {}
    for k, spec in manifest.items():
        dt = alias.get(spec.get("dtype", "float32"), spec.get("dtype"))
        try:
            dtype = np.dtype(dt)
        except TypeError:
            dtype = np.float32
        sd[k] = np.zeros(tuple(spec.get("shape", ())), dtype)
    return sd


def _leaf_shapes(tree: Any, prefix: str = "") -> Dict[str, tuple]:
    """{'/'-joined path: shape} over a nested dict/list param tree (works
    for arrays and jax.eval_shape ShapeDtypeStructs alike)."""
    out: Dict[str, tuple] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_leaf_shapes(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_leaf_shapes(v, f"{prefix}{i}/"))
    elif tree is not None:
        out[prefix.rstrip("/")] = tuple(getattr(tree, "shape", ()))
    return out


def preflight_manifest(manifest: Mapping[str, Any],
                       which: Optional[str] = None,
                       carry_dead_params: bool = True,
                       expected: Any = None) -> Dict[str, Any]:
    """Dry-run the strict converter against a manifest (no weights needed).

    Returns {"ok", "branch", "keys", "error", "unused", "suggestions",
    "shape_mismatches"}:
      ok=False + error  — the converter failed (first missing key / bad
                          shape), with close-match suggestions from the
                          manifest's actual keys (names the drift);
      ok=False + unused — conversion ran but strict accounting found
                          checkpoint keys the converter never consumed
                          (new/renamed parameter groups);
      ok=False + shape_mismatches — conversion consumed everything but the
                          resulting tree's leaf shapes differ from
                          `expected` (a param tree or jax.eval_shape of the
                          target-config init — catches dimension drift the
                          shape-agnostic transposes pass through);
      ok=True           — the real conversion will consume this checkpoint
                          layout completely (and match `expected` if given).
    """
    import difflib

    sd = state_dict_from_manifest(manifest)
    report: Dict[str, Any] = {"ok": False, "keys": len(sd),
                              "error": None, "unused": [], "suggestions": {},
                              "shape_mismatches": []}
    try:
        report["branch"] = which or detect_branch(sd)
        params = convert_checkpoint(sd, which=report["branch"],
                                    carry_dead_params=carry_dead_params,
                                    strict=True)
        if expected is not None:
            exp, got = _leaf_shapes(expected), _leaf_shapes(params)
            report["shape_mismatches"] = (
                [f"{p}: checkpoint {got[p]} vs expected {exp[p]}"
                 for p in sorted(set(exp) & set(got)) if exp[p] != got[p]]
                + [f"{p}: missing from checkpoint (expected {exp[p]})"
                   for p in sorted(set(exp) - set(got))]
                + [f"{p}: not in the expected tree (checkpoint {got[p]})"
                   for p in sorted(set(got) - set(exp))])
            if report["shape_mismatches"]:
                report["error"] = (
                    f"{len(report['shape_mismatches'])} leaf shape/structure "
                    f"mismatch(es) vs the expected init tree")
                return report
        report["ok"] = True
    except ValueError as e:  # strict-unused (or unknown branch)
        msg = str(e)
        report["error"] = msg
        if "not consumed" in msg:
            # recover the machine-readable list by re-running non-strict
            # with tracking
            tracked = _TrackingDict(sd)
            try:
                if report["branch"] == "ed":
                    convert_ed(tracked, carry_dead_params)
                elif report["branch"] == "vae":
                    convert_vae(tracked, carry_dead_params)
                else:
                    convert_vae_updated(tracked, carry_dead_params)
                report["unused"] = sorted(
                    k for k in sd if k not in tracked.used
                    and not _EXPECTED_UNCONSUMED.match(k))
            except Exception:
                pass
    except KeyError as e:  # converter asked for a key the manifest lacks
        missing = str(e).strip("'\"")
        report["error"] = f"converter expects missing key: {missing}"
        close = difflib.get_close_matches(missing, list(sd), n=3, cutoff=0.6)
        if close:
            report["suggestions"][missing] = close
    except Exception as e:  # shape/transpose failure etc.
        report["error"] = f"{type(e).__name__}: {e}"
    return report
