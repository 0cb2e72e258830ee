#!/usr/bin/env python
"""Convert public torch checkpoints to splat_one_tpu .npz weight files.

Offline tool (this environment has no egress): run it wherever the
original checkpoints live, copy the .npz files into ``weights/``.

Subcommands and expected inputs (reference surfaces in parentheses):

  lpips    --alexnet alexnet.pth --lpips lpips_alex.pth --out lpips_alex.npz
           torchvision AlexNet ``state_dict`` + the LPIPS repo's linear
           heads (``lins.{i}.model.1.weight``); feeds Trainer.eval
           (reference gsplat_trainer.py:29-31, 421-433).
  depth    --ckpt depth_anything_v2_vits.pth --encoder vits --out dav2_vits.npz
           Depth-Anything-V2 checkpoint (``pretrained.*`` DINOv2 backbone +
           ``depth_head.*`` DPT head; reference app/tabs/depth_tab.py:92-123).
  lightglue --ckpt superpoint_lightglue.pth --out lightglue.npz
  aliked    --ckpt aliked-n16.pth --out aliked.npz
  sam2      --ckpt sam2.1_hiera_large.pt --out sam2_hiera_l.npz
           (``model`` key inside the torch file; image encoder trunk+neck,
           prompt encoder, mask decoder; reference app/mask_manager.py:235-243.)

Each converter writes a flat npz with this package's parameter names; the
model modules load them via their ``checkpoint=`` arguments. Conversion is
pure tensor renaming/transposition — torch is only used to unpickle.
"""

from __future__ import annotations

import argparse

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy().astype(np.float32)
    return np.asarray(x, np.float32)


# ---------------------------------------------------------------- lpips
def convert_lpips(alexnet_path: str, lpips_path: str, out: str):
    """torchvision AlexNet features + LPIPS linear heads -> models.lpips
    schema: conv{i}_w [kh,kw,cin,cout], conv{i}_b [cout], lin{i}_w
    [1,1,c,1]."""
    import torch

    anet = torch.load(alexnet_path, map_location="cpu")
    if hasattr(anet, "state_dict"):
        anet = anet.state_dict()
    lp = torch.load(lpips_path, map_location="cpu")
    if hasattr(lp, "state_dict"):
        lp = lp.state_dict()
    # torchvision AlexNet features conv layer indices
    conv_idx = [0, 3, 6, 8, 10]
    outp = {}
    for i, j in enumerate(conv_idx):
        w = _t(anet[f"features.{j}.weight"])  # [cout,cin,kh,kw]
        b = _t(anet[f"features.{j}.bias"])
        outp[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)  # HWIO
        outp[f"conv{i}_b"] = b
    for i in range(5):
        # lpips repo: lins.{i}.model.1.weight [1, c, 1, 1]
        for k in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"):
            if k in lp:
                w = _t(lp[k])
                outp[f"lin{i}_w"] = w.transpose(2, 3, 1, 0)  # [1,1,c,1]
                break
        else:
            raise KeyError(f"lin head {i} not found in {lpips_path}")
    np.savez(out, **outp)
    print(f"wrote {out} ({len(outp)} tensors)")


# ---------------------------------------------------------------- depth
def convert_depth(ckpt_path: str, encoder: str, out: str):
    """Depth-Anything-V2 -> models.depth_tpu schema.

    Backbone keys (DINOv2): pretrained.patch_embed.proj.{weight,bias},
    pretrained.pos_embed, pretrained.blocks.{d}.(norm1|attn.qkv|attn.proj|
    norm2|mlp.fc1|mlp.fc2).{weight,bias}, pretrained.norm.*"""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    outp = {}

    def lin(name, wkey, bkey, transpose=True):
        w = _t(sd[wkey])
        outp[f"{name}_w"] = w.T if transpose else w
        outp[f"{name}_b"] = _t(sd[bkey])

    # patch embed: conv [C,3,14,14] -> linear [14*14*3, C] matching the
    # reshape order in depth_forward (ph, pw, 3 -> flat)
    w = _t(sd["pretrained.patch_embed.proj.weight"])  # [C,3,14,14]
    outp["patch_w"] = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
    outp["patch_b"] = _t(sd["pretrained.patch_embed.proj.bias"])
    pos = _t(sd["pretrained.pos_embed"])  # [1, 1+n*n, C] (cls first)
    outp["pos"] = pos[:, 1:]
    outp["pos_cls"] = pos[:, :1]  # cls token keeps its own pos embed
    outp["cls_token"] = _t(sd["pretrained.cls_token"])
    d = 0
    while f"pretrained.blocks.{d}.norm1.weight" in sd:
        p = f"pretrained.blocks.{d}"
        outp[f"b{d}_ln1_scale"] = _t(sd[f"{p}.norm1.weight"])
        outp[f"b{d}_ln1_bias"] = _t(sd[f"{p}.norm1.bias"])
        lin(f"b{d}_qkv", f"{p}.attn.qkv.weight", f"{p}.attn.qkv.bias")
        lin(f"b{d}_attn_out", f"{p}.attn.proj.weight", f"{p}.attn.proj.bias")
        outp[f"b{d}_ln2_scale"] = _t(sd[f"{p}.norm2.weight"])
        outp[f"b{d}_ln2_bias"] = _t(sd[f"{p}.norm2.bias"])
        lin(f"b{d}_mlp1", f"{p}.mlp.fc1.weight", f"{p}.mlp.fc1.bias")
        lin(f"b{d}_mlp2", f"{p}.mlp.fc2.weight", f"{p}.mlp.fc2.bias")
        if f"{p}.ls1.gamma" in sd:  # DINOv2 LayerScale
            outp[f"b{d}_ls1"] = _t(sd[f"{p}.ls1.gamma"])
            outp[f"b{d}_ls2"] = _t(sd[f"{p}.ls2.gamma"])
        d += 1
    outp["ln_f_scale"] = _t(sd["pretrained.norm.weight"])
    outp["ln_f_bias"] = _t(sd["pretrained.norm.bias"])
    # DPT head: projects.{i} are 1x1 convs C->out_ch[i]
    i = 0
    while f"depth_head.projects.{i}.weight" in sd:
        w = _t(sd[f"depth_head.projects.{i}.weight"])  # [co,C,1,1]
        outp[f"tap{i}_w"] = w[:, :, 0, 0].T
        outp[f"tap{i}_b"] = _t(sd[f"depth_head.projects.{i}.bias"])
        i += 1
    # remaining DPT tensors pass through under their original names for
    # the faithful head (scratch.*, resize_layers.*)
    for k, v in sd.items():
        if k.startswith("depth_head.") and "projects." not in k:
            outp[k] = _t(v)
    np.savez(out, _encoder=np.array(encoder), **outp)
    print(f"wrote {out} ({len(outp)} tensors, {d} blocks)")


# ------------------------------------------------------------- lightglue
def convert_lightglue(ckpt_path: str, out: str):
    """Official LightGlue checkpoint -> models.lightglue_tpu schema.

    Keys: self_attn.{i}.Wqkv / out_proj, cross_attn.{i}.to_qk / to_v /
    to_out, ffn ... log_assignment.{i}.matchability / final_proj."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    outp = {k: _t(v) for k, v in sd.items()}
    np.savez(out, **outp)
    print(f"wrote {out} ({len(outp)} tensors; raw names — loader maps)")


# --------------------------------------------------------------- aliked
def convert_aliked(ckpt_path: str, out: str):
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    outp = {}
    for k, v in sd.items():
        a = _t(v)
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        outp[k] = a
    np.savez(out, **outp)
    print(f"wrote {out} ({len(outp)} tensors)")


# ----------------------------------------------------------------- sam2
_SAM2_CONV_KEYS = (
    "patch_embed.proj.weight", ".conv.weight", "conv_s0.weight",
    "conv_s1.weight", "output_upscaling.0.weight",
    "output_upscaling.3.weight", "mask_downscaling.0.weight",
    "mask_downscaling.3.weight", "mask_downscaling.6.weight",
)


def convert_sam2(ckpt_path: str, out: str):
    """SAM 2.1 checkpoint -> models.sam2_hiera schema: original key names;
    conv weights OIHW->HWIO, pos embeds NCHW->NHWC, everything else
    verbatim (ConvTranspose2d [cin,cout,kh,kw] -> [kh,kw,cout,cin], which
    models.sam2_hiera._conv_transpose expects)."""
    import torch

    z = torch.load(ckpt_path, map_location="cpu")
    sd = z.get("model", z)
    outp = {}
    for k, v in sd.items():
        a = _t(v)
        if a.ndim == 4 and any(k.endswith(c) for c in _SAM2_CONV_KEYS):
            a = a.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
        elif a.ndim == 4 and "pos_embed" in k:
            a = a.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        elif a.ndim == 4 and "output_upscaling" in k:
            a = a.transpose(2, 3, 1, 0)
        outp[k] = a
    np.savez(out, **outp)
    print(f"wrote {out} ({len(outp)} tensors)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("lpips")
    p.add_argument("--alexnet", required=True)
    p.add_argument("--lpips", required=True)
    p.add_argument("--out", default="weights/lpips_alex.npz")
    p = sub.add_parser("depth")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--encoder", default="vits",
                   choices=["vits", "vitb", "vitl", "vitg"])
    p.add_argument("--out", default="weights/dav2.npz")
    for name in ("lightglue", "aliked", "sam2"):
        p = sub.add_parser(name)
        p.add_argument("--ckpt", required=True)
        p.add_argument("--out", default=f"weights/{name}.npz")
    a = ap.parse_args()
    if a.cmd == "lpips":
        convert_lpips(a.alexnet, a.lpips, a.out)
    elif a.cmd == "depth":
        convert_depth(a.ckpt, a.encoder, a.out)
    elif a.cmd == "lightglue":
        convert_lightglue(a.ckpt, a.out)
    elif a.cmd == "aliked":
        convert_aliked(a.ckpt, a.out)
    elif a.cmd == "sam2":
        convert_sam2(a.ckpt, a.out)


if __name__ == "__main__":
    main()
