#!/usr/bin/env python
"""Activation-level parity harness — the first-class successor of the
reference's compare_activations.sh A/B flow (SURVEY.md §4 item 4).

Two modes:

  record   Run THIS framework on given weights + input and dump named
           intermediate activations to an .npz:
             python tools/compare_activations.py record \
                 --weights weight/genconvit_ed_inference.pth --which ed \
                 --input input.npy --out acts_jax.npz [--deterministic]

  compare  Diff two activation dumps (e.g. ours vs a torch-side dump recorded
           with the reference implementation in a torch+timm environment):
             python tools/compare_activations.py compare acts_torch.npz \
                 acts_jax.npz [--rtol 1e-3 --atol 1e-3]

Recorded tensors are NHWC float32. A torch-side recorder only needs to save
the same names (transpose NCHW->NHWC): ed: encimg, decimg, x1, x2, logits;
vae: mu, logvar, z, x_hat, x1, x2, logits.
"""

import argparse
import os
import sys

import numpy as np

# runnable as a script from anywhere: the package lives one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def record(args):
    import jax
    import jax.numpy as jnp

    from genconvit_tpu.core.checkpoint import load_params
    from genconvit_tpu.models import convnext as cnx
    from genconvit_tpu.models.ed import ed_decode, ed_encode
    from genconvit_tpu.models.vae import vae_decode, vae_encode
    from genconvit_tpu.ops import gelu, linear, relu

    params, _ = load_params(args.weights, which=args.which)
    x = jnp.asarray(np.load(args.input).astype(np.float32))
    if x.ndim == 3:
        x = x[None]
    if x.shape[1] == 3:  # NCHW input -> NHWC
        x = jnp.transpose(x, (0, 2, 3, 1))

    acts = {}
    if args.which == "ed":
        enc = ed_encode(params, x)
        dec = ed_decode(params, enc)
        x1 = cnx.convnext_apply(params["backbone"], dec)
        x2 = cnx.convnext_apply(params["backbone"], x)
        h = gelu(jnp.concatenate([x1, x2], axis=1))
        h = gelu(linear(h, params["fc"]["kernel"], params["fc"]["bias"]))
        logits = linear(h, params["fc2"]["kernel"], params["fc2"]["bias"])
        acts = {"encimg": enc, "decimg": dec, "x1": x1, "x2": x2, "logits": logits}
    else:
        rng = None if args.deterministic else jax.random.PRNGKey(args.seed)
        z, aux = vae_encode(params, x, rng, sample=not args.deterministic)
        x_hat = vae_decode(params, z)
        x1 = cnx.convnext_apply(params["backbone"], x)
        x2 = cnx.convnext_apply(params["backbone"], x_hat)
        h = relu(jnp.concatenate([x1, x2], axis=1))
        h = relu(linear(h, params["fc"]["kernel"], params["fc"]["bias"]))
        logits = linear(h, params["fc2"]["kernel"], params["fc2"]["bias"])
        acts = {"mu": aux["mu"], "logvar": aux["logvar"], "z": z,
                "x_hat": x_hat, "x1": x1, "x2": x2, "logits": logits}

    np.savez(args.out, **{k: np.asarray(v, dtype=np.float32) for k, v in acts.items()})
    print(f"recorded {sorted(acts)} -> {args.out}")


def compare(args):
    a = np.load(args.a)
    b = np.load(args.b)
    keys = sorted(set(a.files) & set(b.files))
    if not keys:
        print("no common activation names", file=sys.stderr)
        sys.exit(2)
    worst = 0.0
    failed = []
    for k in keys:
        x, y = a[k], b[k]
        if x.shape != y.shape:
            print(f"{k:10s} SHAPE MISMATCH {x.shape} vs {y.shape}")
            failed.append(k)
            continue
        denom = np.maximum(np.abs(x), 1e-6)
        rel = (np.abs(x - y) / denom).max()
        ab = np.abs(x - y).max()
        ok = ab <= args.atol + args.rtol * np.abs(y).max()
        worst = max(worst, rel)
        print(f"{k:10s} max_abs={ab:.3e} max_rel={rel:.3e} {'OK' if ok else 'FAIL'}")
        if not ok:
            failed.append(k)
    only = sorted(set(a.files) ^ set(b.files))
    if only:
        print(f"(unmatched names ignored: {only})")
    sys.exit(1 if failed else 0)


def main():
    p = argparse.ArgumentParser("compare_activations")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("record")
    r.add_argument("--weights", required=True)
    r.add_argument("--which", choices=["ed", "vae"], required=True)
    r.add_argument("--input", required=True, help=".npy image(s), NHWC or NCHW, normalized")
    r.add_argument("--out", default="acts_jax.npz")
    r.add_argument("--deterministic", action="store_true",
                   help="VAE z = mu (needed for cross-framework comparison)")
    r.add_argument("--seed", type=int, default=0)
    r.set_defaults(fn=record)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--rtol", type=float, default=1e-3)
    c.add_argument("--atol", type=float, default=1e-3)
    c.set_defaults(fn=compare)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
