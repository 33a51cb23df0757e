"""Kernel-selection plan: which compute-path variants trace into a program.

Round-2 selected Pallas/GELU/panel variants by reading os.environ inside
traced functions. That is a footgun twice over: (a) a long-lived process
mutating env between traces silently gets whichever variant traced first at
a given shape (the knobs are invisible to jit's cache key), and (b) the
selection is scattered instead of explicit. This module centralizes it:

  * `KernelPlan` — a frozen, hashable dataclass of every kernel knob;
  * `KernelPlan.from_env()` — the ONE place env vars are read. CLIs and
    the Predictor/train constructors call it once at construction;
  * `plan_scope(plan)` — binds a plan for the duration of a trace. The
    engine wraps its jitted bodies in it and keys its jit cache on the
    plan, so two Predictors with different plans can coexist in one
    process without aliasing;
  * `current_plan()` — what traced model code consults. Inside a
    plan_scope it returns the bound plan (no env read); outside (direct
    model calls in tools/tests) it falls back to a fresh from_env() so
    existing A/B harnesses that flip env between processes keep working.

The Pallas kernels with their own inner jit (ops/pallas/convnext_mlp.py)
take the knob values as explicit static arguments resolved by their caller,
so the knobs participate in their jit cache keys.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import json
import os
from typing import Any, Dict, Optional


@dataclasses.dataclass(frozen=True)
class KernelPlan:
    """Everything that selects a compute-path variant at trace time.

    pallas: backbone kernel selection (models/convnext.py dispatch):
        ''        auto — transposed/padded Pallas backbone on single-device
                  bf16 TPU (or inside kernel_backbone_scope), XLA otherwise
        '0'       plain XLA folded path everywhere
        'mlp[:i,j]' per-stage hybrid XLA-dw + Pallas-MLP-tail (A/B path)
        'mlpfull' force the whole-backbone kernel even multi-device
        'stage'   whole-stage VMEM-resident chain (A/B path)
        '1'       v1 fused block kernel (A/B path)
    gelu: 'default' (deg-3/2 rational) | 'hp' (deg-5/4) | 'exact' (erf)
    mlp_panel_mb: VMEM budget for the MLP-tail row panels
    mlp_split: independent row slices per panel (Mosaic overlap experiment)
    int8_mlp: int8 MLP tails inside the Pallas kernel:
        ''      off (bf16 matmuls)
        'fc1'   int8 fc1 only, FIXED activation scale (LN rows have exact
                unit variance, so the scale is a compile-time constant and
                quantization adds ~3 VPU ops with zero reduces/dequants)
        'full'  W8A8 both matmuls, per-row absmax activation scales
                (measured NET SLOWER on v5e: the absmax+dequant VPU passes
                over the 4C-wide hidden exceed the MXU saving — kept for
                A/B and future chips; tools/microbench_int8_dot.py)
    dw_rank: rank-R separable depthwise APPROXIMATION (ops/dwsep.py):
        0       off — exact 7x7 depthwise everywhere (default)
        R>0     the inference engine replaces each depthwise 7x7 with R
                SVD-separable 1x7+7x1 passes (14R taps vs 49; rank-1
                measured ~2x launch-equivalent on v5e). Inference-only;
                retained SVD energy of the actual checkpoint is logged at
                engine prep. Training and parity paths ignore it.
        "auto:<energy>[:<max_rank>]"  adaptive per-block rank: each block
                gets the smallest rank whose worst channel retains
                >= <energy> SVD energy; blocks needing more than
                <max_rank> (default 3) stay exact. Checkpoint-aware:
                the same spec gives different rank mixes per weights.
    """

    pallas: str = ""
    gelu: str = "default"
    mlp_panel_mb: int = 8
    mlp_split: int = 1
    int8_mlp: str = ""
    dw_rank: Any = 0  # int rank, or adaptive spec str "auto:<energy>[:<max>]"

    @staticmethod
    def from_env() -> "KernelPlan":
        """Resolve a plan from the environment — the ONE place env is read.

        Layering (most specific wins):
          1. defaults;
          2. the committed per-chip asset matching the current device kind
             (genconvit_tpu/assets/kernel_plan.<device_kind>.json — the
             autotuner's product; a fresh workspace reproduces the tuned
             configuration with zero hand-set knobs;
             GENCONVIT_KERNEL_PLAN_ASSET=0 disables);
          3. a tuned plan file named by GENCONVIT_KERNEL_PLAN (written by
             `tools/autotune.py` for the current chip generation);
          4. individual GENCONVIT_* knob vars, but only those EXPLICITLY set
             — an unset var never masks a tuned-file field.
        """
        base = KernelPlan()
        plan_file = os.environ.get("GENCONVIT_KERNEL_PLAN", "")
        if not plan_file and os.environ.get(
                "GENCONVIT_KERNEL_PLAN_ASSET", "1") == "1":
            plan_file = default_plan_asset()
        if plan_file:
            base = KernelPlan.load(plan_file)
        fields: Dict[str, Any] = {}
        if os.environ.get("GENCONVIT_EXACT_GELU", "0") == "1":
            fields["gelu"] = "exact"
        elif os.environ.get("GENCONVIT_GELU", "") == "hp":
            fields["gelu"] = "hp"
        if "GENCONVIT_PALLAS" in os.environ:
            fields["pallas"] = os.environ["GENCONVIT_PALLAS"]
        # "0"/"" mean "unset" for the integer knobs (historical contract)
        if int(os.environ.get("GENCONVIT_MLP_PANEL", "0") or 0):
            fields["mlp_panel_mb"] = int(os.environ["GENCONVIT_MLP_PANEL"])
        if int(os.environ.get("GENCONVIT_MLP_SPLIT", "0") or 0):
            fields["mlp_split"] = int(os.environ["GENCONVIT_MLP_SPLIT"])
        if "GENCONVIT_INT8_MLP" in os.environ:
            raw = os.environ["GENCONVIT_INT8_MLP"]
            fields["int8_mlp"] = {"0": "", "": "", "1": "full"}.get(raw, raw)
        if "GENCONVIT_DW_RANK" in os.environ:
            raw = os.environ["GENCONVIT_DW_RANK"] or "0"
            if raw.startswith("auto"):
                # validate eagerly so a typo fails at construction, not
                # deep inside engine init
                from genconvit_tpu.ops.dwsep import parse_rank_spec

                parse_rank_spec(raw)
                fields["dw_rank"] = raw
            else:
                fields["dw_rank"] = int(raw)
        return dataclasses.replace(base, **fields) if fields else base

    @staticmethod
    def load(path: str) -> "KernelPlan":
        """Read a plan from a JSON file written by `save_plan` (unknown and
        underscore-prefixed keys — e.g. the autotuner's `_meta` block — are
        ignored, so the format can grow without breaking older readers)."""
        with open(path) as f:
            data = json.load(f)
        names = {f.name for f in dataclasses.fields(KernelPlan)}
        return KernelPlan(**{k: v for k, v in data.items() if k in names})


_PLAN_ASSET_CACHE: Dict[str, str] = {}


def default_plan_asset() -> str:
    """Path of the committed per-chip tuned plan for the CURRENT backend's
    device kind, or '' when none ships. Memoized per kind (jax backend init
    happens once anyway; the lookup itself is one isfile)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return ""
    if kind not in _PLAN_ASSET_CACHE:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets", f"kernel_plan.{kind}.json")
        _PLAN_ASSET_CACHE[kind] = path if os.path.isfile(path) else ""
    return _PLAN_ASSET_CACHE[kind]


def save_plan(plan: KernelPlan, path: str,
              meta: Optional[Dict[str, Any]] = None) -> None:
    """Write `plan` as JSON consumable by `KernelPlan.load` /
    GENCONVIT_KERNEL_PLAN; `meta` (measurement provenance: chip, date,
    per-candidate timings) is stored under `_meta` and ignored on load."""
    data: Dict[str, Any] = dataclasses.asdict(plan)
    if meta:
        data["_meta"] = meta
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)


_ACTIVE: contextvars.ContextVar[Optional[KernelPlan]] = contextvars.ContextVar(
    "gcv_kernel_plan", default=None)


def current_plan() -> KernelPlan:
    """The plan bound by the innermost plan_scope, else a fresh env read
    (compat fallback for direct model calls outside the engine/train
    wrappers — those see env changes per trace, as before)."""
    plan = _ACTIVE.get()
    return plan if plan is not None else KernelPlan.from_env()


@contextlib.contextmanager
def plan_scope(plan: KernelPlan):
    tok = _ACTIVE.set(plan)
    try:
        yield
    finally:
        _ACTIVE.reset(tok)
