#!/usr/bin/env python
"""Torch-side recorder — run this in a *weights-enabled* environment (torch +
timm 0.6.5 + the reference repo + the HuggingFace .pth files; optionally
face_recognition/dlib) to produce the artifacts the offline parity harness
consumes. This script deliberately has ZERO dependencies on genconvit_tpu:
it is the other half of the A/B comparison.

Outputs:
  1. acts_torch_{ed,vae}.npz — named intermediate activations (NHWC fp32),
     the names tools/compare_activations.py expects:
       ed:  encimg, decimg, x1, x2, logits
       vae: mu, logvar, z, x_hat, x1, x2, logits   (z = mu: deterministic)
  2. boxes.json — dlib-HOG face boxes per sampled frame for each video, in
     the RecordedDetector sidecar schema
     {"<video basename>": [[[t,r,b,l], ...] per frame]} — reproduces the
     reference's BGR-input quirk (B6) and frame stepping exactly
     (ref model/pred_func.py:67-92,138-143).
  3. manifest_{ed,vae}.json — key/shape/dtype manifests of the loaded
     checkpoints (--manifest; needs only torch, NOT timm/the model code —
     the weights-run PRE-FLIGHT artifact: ship these tiny JSONs back and
     `convert_weights.py --preflight manifest_ed.json` dry-runs the full
     strict conversion offline, pinpointing any timm-0.6.5 naming drift
     before the real weights ever move).

Usage (from the reference repo root, weights in weight/):
  python record_reference_torch.py --ref /path/to/GenConViT \
      --input input.npy --videos sample_prediction_data --out-dir parity/
  # input.npy: float32 NCHW or NHWC normalized batch (save the same file
  # fed to tools/compare_activations.py record)
"""

import argparse
import json
import os
import sys

import numpy as np


def _nhwc(t):
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1)).astype(np.float32)


def record_activations(ref_root, input_path, out_dir):
    import torch

    sys.path.insert(0, ref_root)
    os.chdir(ref_root)  # config.yaml / weight/ are CWD-relative (quirk B11)
    from model.config import load_config
    from model.genconvit_ed import GenConViTED
    from model.genconvit_vae import GenConViTVAE

    config = load_config()
    x = np.load(input_path).astype(np.float32)
    if x.ndim == 3:
        x = x[None]
    if x.shape[-1] == 3:  # NHWC input -> torch NCHW
        x = np.transpose(x, (0, 3, 1, 2))
    xt = torch.from_numpy(x)

    def load_sd(name):
        obj = torch.load(os.path.join("weight", name), map_location="cpu",
                         weights_only=False)
        return obj["state_dict"] if "state_dict" in obj else obj

    # --- ED (ref model/genconvit_ed.py:77-88, stepwise for intermediates;
    # pretrained=False skips the timm download — load_state_dict overwrites)
    ed = GenConViTED(config, pretrained=False)
    ed.load_state_dict(load_sd("genconvit_ed_inference.pth"), strict=True)
    ed.eval()
    with torch.no_grad():
        encimg = ed.encoder(xt)
        decimg = ed.decoder(encimg)
        x1 = ed.backbone(decimg)
        x2 = ed.backbone(xt)
        cat = torch.cat([x1, x2], dim=1)
        # NB: the reference names its GELU "relu" (model/genconvit_ed.py:75)
        logits = ed.fc2(ed.relu(ed.fc(ed.relu(cat))))
    np.savez(os.path.join(out_dir, "acts_torch_ed.npz"),
             encimg=_nhwc(encimg), decimg=_nhwc(decimg),
             x1=x1.numpy().astype(np.float32), x2=x2.numpy().astype(np.float32),
             logits=logits.numpy().astype(np.float32))

    # --- VAE (ref model/genconvit_vae.py:107-115); z = mu (deterministic)
    vae = GenConViTVAE(config)
    vae.load_state_dict(load_sd("genconvit_vae_inference.pth"), strict=True)
    vae.eval()
    with torch.no_grad():
        feats = vae.encoder.features(xt)
        flat = torch.flatten(feats, start_dim=1)
        mu = vae.encoder.mu(flat)
        logvar = vae.encoder.var(flat)
        z = mu
        x_hat = vae.decoder(z)
        x1 = vae.convnext_backbone(xt)
        x2 = vae.convnext_backbone(x_hat)
        cat = torch.cat([x1, x2], dim=1)
        logits = vae.fc2(vae.relu(vae.fc(vae.relu(cat))))
    np.savez(os.path.join(out_dir, "acts_torch_vae.npz"),
             mu=mu.numpy().astype(np.float32),
             logvar=logvar.numpy().astype(np.float32),
             z=z.numpy().astype(np.float32), x_hat=_nhwc(x_hat),
             x1=x1.numpy().astype(np.float32), x2=x2.numpy().astype(np.float32),
             logits=logits.numpy().astype(np.float32))
    print(f"activations -> {out_dir}/acts_torch_{{ed,vae}}.npz")


def record_manifests(ref_root, out_dir):
    """Emit manifest_{ed,vae}.json — key/shape/dtype of each checkpoint's
    state dict. Needs only torch + the .pth files (no timm, no model build),
    so it works even where the reference models can't be constructed."""
    import torch

    def manifest(sd):
        out = {}
        for k, v in sd.items():
            dt = str(v.dtype)
            out[k] = {"shape": [int(s) for s in v.shape],
                      "dtype": dt[len("torch."):] if dt.startswith("torch.")
                      else dt}
        return out

    for which in ("ed", "vae"):
        path = os.path.join(ref_root, "weight",
                            f"genconvit_{which}_inference.pth")
        if not os.path.isfile(path):
            print(f"manifest: {path} not found, skipping")
            continue
        try:  # mmap avoids materializing the multi-GB VAE heads in RAM
            obj = torch.load(path, map_location="cpu", weights_only=False,
                             mmap=True)
        except (TypeError, RuntimeError):  # older torch / non-mmapable zip
            obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj["state_dict"] if isinstance(obj, dict) and "state_dict" in obj else obj
        out_path = os.path.join(out_dir, f"manifest_{which}.json")
        with open(out_path, "w") as f:
            json.dump(manifest(sd), f, indent=0, sort_keys=True)
        print(f"manifest ({len(sd)} keys) -> {out_path}")


def record_boxes(videos_dir, out_path, num_frames):
    """dlib-HOG boxes with the reference's exact quirks: evenly-stepped frame
    subset (ref model/pred_func.py:138-143) and detection on the
    BGR-converted frame (quirk B6, ref :73-76)."""
    import cv2
    import face_recognition
    from decord import VideoReader, cpu

    sidecar = {}
    for name in sorted(os.listdir(videos_dir)):
        if not name.lower().endswith((".mp4", ".avi", ".mov")):
            continue
        path = os.path.join(videos_dir, name)
        vr = VideoReader(path, ctx=cpu(0))
        step = max(1, len(vr) // num_frames)
        idx = list(range(0, len(vr), step))[:num_frames]
        frames = vr.get_batch(idx).asnumpy()  # RGB
        per_frame = []
        for frame in frames:
            bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            locs = face_recognition.face_locations(bgr, model="hog")
            per_frame.append([[int(v) for v in box] for box in locs])
        sidecar[name] = per_frame
        print(f"{name}: {sum(len(b) for b in per_frame)} boxes "
              f"over {len(per_frame)} frames")
    with open(out_path, "w") as f:
        json.dump(sidecar, f)
    print(f"boxes -> {out_path}")


def main():
    p = argparse.ArgumentParser("record_reference_torch")
    p.add_argument("--ref", required=True, help="reference repo root")
    p.add_argument("--input", help=".npy normalized input batch for activations")
    p.add_argument("--videos", help="video dir for dlib box recording")
    p.add_argument("--f", type=int, default=15)
    p.add_argument("--out-dir", default="parity")
    p.add_argument("--manifest", action="store_true",
                   help="emit checkpoint key/shape manifests (pre-flight; "
                        "needs only torch, not timm)")
    args = p.parse_args()

    out_dir = os.path.abspath(args.out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if args.manifest:
        record_manifests(os.path.abspath(args.ref), out_dir)
    if args.input:
        record_activations(args.ref, os.path.abspath(args.input), out_dir)
    if args.videos:
        record_boxes(os.path.abspath(args.videos),
                     os.path.join(out_dir, "boxes.json"), args.f)
    if not args.input and not args.videos and not args.manifest:
        p.error("pass --input, --videos and/or --manifest")


if __name__ == "__main__":
    main()
