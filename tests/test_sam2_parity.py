"""SAM2 converter activation parity (VERDICT r2 item 6, final entry).

A mini SAM 2.1 (Hiera trunk + FPN neck + prompt encoder + two-way mask
decoder) is run in torch.nn.functional following the published
formulation (facebookresearch/sam2 modeling code; reference surface
app/mask_manager.py:235-243), with a random state_dict under the ORIGINAL
checkpoint key names. The state_dict goes through
``scripts/convert_weights.py convert_sam2`` and our faithful JAX forward
(models.sam2_hiera) must reproduce the torch mask logits / IoU / object
score — so a real converted ``sam2.1_hiera_*.pt`` is guaranteed faithful
numerics the day it arrives."""

import math
import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

# mini config: embed 8, stages (1,1,2,1), 5 blocks, q-pool at 1/2/4,
# global attention at block 3, d_model 16
MINI = dict(embed_dim=8, num_heads=1, stages=(1, 1, 2, 1),
            global_att=(3,), window_spec=(4, 2, 4, 2))
DM = 16  # mini d_model (decoder width)


def _sd_mini(rng):
    """Random mini-SAM2.1 state_dict in torch layouts/names."""
    t = lambda *s: torch.tensor(
        rng.normal(scale=0.15, size=s).astype(np.float32))
    E = MINI["embed_dim"]
    sd = {}
    tr = "image_encoder.trunk"
    sd[f"{tr}.patch_embed.proj.weight"] = t(E, 3, 7, 7)
    sd[f"{tr}.patch_embed.proj.bias"] = t(E) * 0.1
    sd[f"{tr}.pos_embed"] = t(1, E, 7, 7)
    sd[f"{tr}.pos_embed_window"] = t(1, E, 8, 8)
    stages = MINI["stages"]
    stage_ends = [sum(stages[:i + 1]) - 1 for i in range(len(stages))]
    q_pool = [e + 1 for e in stage_ends[:-1]]
    dim = E
    for i in range(sum(stages)):
        dim_out = dim * 2 if i in q_pool else dim
        b = f"{tr}.blocks.{i}"
        sd[f"{b}.norm1.weight"] = 1 + 0.1 * t(dim)
        sd[f"{b}.norm1.bias"] = 0.1 * t(dim)
        sd[f"{b}.attn.qkv.weight"] = t(3 * dim_out, dim)
        sd[f"{b}.attn.qkv.bias"] = t(3 * dim_out) * 0.1
        sd[f"{b}.attn.proj.weight"] = t(dim_out, dim_out)
        sd[f"{b}.attn.proj.bias"] = t(dim_out) * 0.1
        if dim_out != dim:
            sd[f"{b}.proj.weight"] = t(dim_out, dim)
            sd[f"{b}.proj.bias"] = t(dim_out) * 0.1
        sd[f"{b}.norm2.weight"] = 1 + 0.1 * t(dim_out)
        sd[f"{b}.norm2.bias"] = 0.1 * t(dim_out)
        sd[f"{b}.mlp.layers.0.weight"] = t(4 * dim_out, dim_out)
        sd[f"{b}.mlp.layers.0.bias"] = t(4 * dim_out) * 0.1
        sd[f"{b}.mlp.layers.1.weight"] = t(dim_out, 4 * dim_out)
        sd[f"{b}.mlp.layers.1.bias"] = t(dim_out) * 0.1
        dim = dim_out
    chans = [E * 2 ** s for s in range(len(stages))]
    for j, c in enumerate(reversed(chans)):
        sd[f"image_encoder.neck.convs.{j}.conv.weight"] = t(DM, c, 1, 1)
        sd[f"image_encoder.neck.convs.{j}.conv.bias"] = t(DM) * 0.1
    pe = "sam_prompt_encoder"
    sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"] = t(2, DM // 2)
    for i in range(4):
        sd[f"{pe}.point_embeddings.{i}.weight"] = t(1, DM)
    sd[f"{pe}.not_a_point_embed.weight"] = t(1, DM)
    sd[f"{pe}.no_mask_embed.weight"] = t(1, DM)
    sd["no_mem_embed"] = t(1, 1, DM)
    d = "sam_mask_decoder"
    sd[f"{d}.iou_token.weight"] = t(1, DM)
    sd[f"{d}.mask_tokens.weight"] = t(4, DM)
    sd[f"{d}.obj_score_token.weight"] = t(1, DM)
    trm = f"{d}.transformer"
    for li in range(2):
        l = f"{trm}.layers.{li}"
        for att, ds in (("self_attn", 1), ("cross_attn_token_to_image", 2),
                        ("cross_attn_image_to_token", 2)):
            inner = DM // ds
            for nm, ci, co in (("q_proj", DM, inner), ("k_proj", DM, inner),
                               ("v_proj", DM, inner),
                               ("out_proj", inner, DM)):
                sd[f"{l}.{att}.{nm}.weight"] = t(co, ci)
                sd[f"{l}.{att}.{nm}.bias"] = t(co) * 0.1
        for i in range(1, 5):
            sd[f"{l}.norm{i}.weight"] = 1 + 0.1 * t(DM)
            sd[f"{l}.norm{i}.bias"] = 0.1 * t(DM)
        sd[f"{l}.mlp.lin1.weight"] = t(4 * DM, DM)
        sd[f"{l}.mlp.lin1.bias"] = t(4 * DM) * 0.1
        sd[f"{l}.mlp.lin2.weight"] = t(DM, 4 * DM)
        sd[f"{l}.mlp.lin2.bias"] = t(DM) * 0.1
    f = f"{trm}.final_attn_token_to_image"
    inner = DM // 2
    for nm, ci, co in (("q_proj", DM, inner), ("k_proj", DM, inner),
                       ("v_proj", DM, inner), ("out_proj", inner, DM)):
        sd[f"{f}.{nm}.weight"] = t(co, ci)
        sd[f"{f}.{nm}.bias"] = t(co) * 0.1
    sd[f"{trm}.norm_final_attn.weight"] = 1 + 0.1 * t(DM)
    sd[f"{trm}.norm_final_attn.bias"] = 0.1 * t(DM)
    # upscaling (ConvTranspose2d native layout [cin, cout, kh, kw])
    sd[f"{d}.output_upscaling.0.weight"] = t(DM, DM // 4, 2, 2)
    sd[f"{d}.output_upscaling.0.bias"] = t(DM // 4) * 0.1
    sd[f"{d}.output_upscaling.1.weight"] = 1 + 0.1 * t(DM // 4)
    sd[f"{d}.output_upscaling.1.bias"] = 0.1 * t(DM // 4)
    sd[f"{d}.output_upscaling.3.weight"] = t(DM // 4, DM // 8, 2, 2)
    sd[f"{d}.output_upscaling.3.bias"] = t(DM // 8) * 0.1
    sd[f"{d}.conv_s0.weight"] = t(DM // 8, DM, 1, 1)
    sd[f"{d}.conv_s0.bias"] = t(DM // 8) * 0.1
    sd[f"{d}.conv_s1.weight"] = t(DM // 4, DM, 1, 1)
    sd[f"{d}.conv_s1.bias"] = t(DM // 4) * 0.1
    for i in range(4):
        m = f"{d}.output_hypernetworks_mlps.{i}"
        for j, (ci, co) in enumerate(((DM, DM), (DM, DM), (DM, DM // 8))):
            sd[f"{m}.layers.{j}.weight"] = t(co, ci)
            sd[f"{m}.layers.{j}.bias"] = t(co) * 0.1
    for m, co in ((f"{d}.iou_prediction_head", 4),
                  (f"{d}.pred_obj_score_head", 1)):
        for j, (ci, cj) in enumerate(((DM, DM), (DM, DM), (DM, co))):
            sd[f"{m}.layers.{j}.weight"] = t(cj, ci)
            sd[f"{m}.layers.{j}.bias"] = t(cj) * 0.1
    return sd


# ------------------------------------------------ torch reference forward
def _win_part(x, ws):
    """[B, H, W, C] -> windows [B*nw, ws, ws, C], published Hiera padding."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = TF.pad(x.permute(0, 3, 1, 2), (0, pw, 0, ph)).permute(0, 2, 3, 1)
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def _win_unpart(w, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = w.shape[0] // (Hp // ws * (Wp // ws))
    x = w.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _t_msa(sd, name, x, heads, dim_out, q_stride=None):
    B, H, W, _ = x.shape
    qkv = TF.linear(x, sd[f"{name}.qkv.weight"], sd[f"{name}.qkv.bias"])
    qkv = qkv.reshape(B, H * W, 3, heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, h, HW, d]
    if q_stride:
        q = q.permute(0, 2, 1, 3).reshape(B, H, W, -1)
        q = TF.max_pool2d(q.permute(0, 3, 1, 2), q_stride).permute(
            0, 2, 3, 1)
        H, W = H // q_stride, W // q_stride
        hd = q.shape[-1] // heads
        q = q.reshape(B, H * W, heads, hd).permute(0, 2, 1, 3)
    out = TF.scaled_dot_product_attention(q, k, v)
    out = out.permute(0, 2, 1, 3).reshape(B, H, W, dim_out)
    return TF.linear(out, sd[f"{name}.proj.weight"],
                     sd[f"{name}.proj.bias"])


def _t_hiera(sd, image):
    cfg = MINI
    stages = cfg["stages"]
    stage_ends = [sum(stages[:i + 1]) - 1 for i in range(len(stages))]
    q_pool = [e + 1 for e in stage_ends[:-1]]
    tr = "image_encoder.trunk"
    x = TF.conv2d(image, sd[f"{tr}.patch_embed.proj.weight"],
                  sd[f"{tr}.patch_embed.proj.bias"], stride=4, padding=3)
    x = x.permute(0, 2, 3, 1)  # NHWC
    B, H, W, C = x.shape
    pos = TF.interpolate(sd[f"{tr}.pos_embed"], size=(H, W),
                         mode="bicubic")  # align_corners=False default
    pw = sd[f"{tr}.pos_embed_window"]
    pos = pos + pw.tile(
        [x // y for x, y in zip(pos.shape, pw.shape)]
    )
    x = x + pos.permute(0, 2, 3, 1)
    dim, heads, cur_stage = cfg["embed_dim"], cfg["num_heads"], 0
    outs = []
    for i in range(sum(stages)):
        dim_out = dim
        ws = cfg["window_spec"][cur_stage]
        q_stride = None
        if i in q_pool:
            dim_out, heads, cur_stage, q_stride = (
                dim * 2, heads * 2, cur_stage + 1, 2)
        if i in cfg["global_att"]:
            ws = 0
        b = f"{tr}.blocks.{i}"
        xn = TF.layer_norm(x, (dim,), sd[f"{b}.norm1.weight"],
                           sd[f"{b}.norm1.bias"], eps=1e-6)
        if dim_out != dim:
            shortcut = TF.linear(xn, sd[f"{b}.proj.weight"],
                                 sd[f"{b}.proj.bias"])
            shortcut = TF.max_pool2d(
                shortcut.permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1)
        else:
            shortcut = x
        H, W = xn.shape[1], xn.shape[2]
        if ws > 0:
            xw, pad_hw = _win_part(xn, ws)
            aw = _t_msa(sd, f"{b}.attn", xw, heads, dim_out, q_stride)
            ows = ws // q_stride if q_stride else ws
            opad = (pad_hw[0] // (q_stride or 1),
                    pad_hw[1] // (q_stride or 1))
            ohw = (H // (q_stride or 1), W // (q_stride or 1))
            a = _win_unpart(aw, ows, opad, ohw)
        else:
            a = _t_msa(sd, f"{b}.attn", xn, heads, dim_out, q_stride)
        x = shortcut + a
        xn2 = TF.layer_norm(x, (dim_out,), sd[f"{b}.norm2.weight"],
                            sd[f"{b}.norm2.bias"], eps=1e-6)
        h = TF.gelu(TF.linear(xn2, sd[f"{b}.mlp.layers.0.weight"],
                              sd[f"{b}.mlp.layers.0.bias"]))
        x = x + TF.linear(h, sd[f"{b}.mlp.layers.1.weight"],
                          sd[f"{b}.mlp.layers.1.bias"])
        dim = dim_out
        if i in stage_ends:
            outs.append(x)
    return outs


def _t_neck(sd, feats, top_down=(2, 3)):
    n = len(feats)
    outs = [None] * n
    prev = None
    for i in range(n - 1, -1, -1):
        x = feats[i].permute(0, 3, 1, 2)
        lat = TF.conv2d(x, sd[f"image_encoder.neck.convs.{n-1-i}.conv.weight"],
                        sd[f"image_encoder.neck.convs.{n-1-i}.conv.bias"])
        if prev is not None and i in top_down:
            lat = lat + TF.interpolate(prev, scale_factor=2.0,
                                       mode="nearest")
        prev = lat
        outs[i] = lat
    return outs


def _t_pe(sd, coords01):
    mat = sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    c = coords01 * 2 - 1
    proj = (2 * math.pi) * (c @ mat)
    return torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)


def _t_attn_ds(sd, name, q, k, v, heads=8):
    B, Nq, _ = q.shape
    qq = TF.linear(q, sd[f"{name}.q_proj.weight"], sd[f"{name}.q_proj.bias"])
    kk = TF.linear(k, sd[f"{name}.k_proj.weight"], sd[f"{name}.k_proj.bias"])
    vv = TF.linear(v, sd[f"{name}.v_proj.weight"], sd[f"{name}.v_proj.bias"])
    qq = qq.reshape(B, Nq, heads, -1).transpose(1, 2)
    kk = kk.reshape(B, k.shape[1], heads, -1).transpose(1, 2)
    vv = vv.reshape(B, v.shape[1], heads, -1).transpose(1, 2)
    out = TF.scaled_dot_product_attention(qq, kk, vv)
    out = out.transpose(1, 2).reshape(B, Nq, -1)
    return TF.linear(out, sd[f"{name}.out_proj.weight"],
                     sd[f"{name}.out_proj.bias"])


def _t_mlp3(sd, name, x, n=3):
    for i in range(n):
        x = TF.linear(x, sd[f"{name}.layers.{i}.weight"],
                      sd[f"{name}.layers.{i}.bias"])
        if i < n - 1:
            x = TF.relu(x)
    return x


def _t_ln(sd, name, x):
    return TF.layer_norm(x, (x.shape[-1],), sd[f"{name}.weight"],
                         sd[f"{name}.bias"], eps=1e-6)


def _t_decode(sd, embed, s0, s1, coords01, labels):
    d = "sam_mask_decoder"
    B, C, S, _ = embed.shape
    pe_pts = _t_pe(sd, coords01)
    pos = sd["sam_prompt_encoder.point_embeddings.1.weight"][0]
    neg = sd["sam_prompt_encoder.point_embeddings.0.weight"][0]
    nap = sd["sam_prompt_encoder.not_a_point_embed.weight"][0]
    lab = labels[..., None]
    sparse = torch.where(
        lab == 1, pe_pts + pos, torch.where(lab == 0, pe_pts + neg, nap))
    src = embed + sd["sam_prompt_encoder.no_mask_embed.weight"][0].view(
        1, C, 1, 1)
    gy, gx = torch.meshgrid(
        (torch.arange(S, dtype=torch.float32) + 0.5) / S,
        (torch.arange(S, dtype=torch.float32) + 0.5) / S, indexing="ij")
    pos_img = _t_pe(sd, torch.stack([gx, gy], -1)).reshape(1, S * S, C)
    out_toks = torch.cat([sd[f"{d}.obj_score_token.weight"],
                          sd[f"{d}.iou_token.weight"],
                          sd[f"{d}.mask_tokens.weight"]], dim=0)
    tokens = torch.cat(
        [out_toks[None].expand(B, -1, -1), sparse], dim=1)
    src = src.flatten(2).transpose(1, 2)  # [B, S*S, C]
    tok_pe = tokens
    t = f"{d}.transformer"
    q = tokens
    for li in range(2):
        l = f"{t}.layers.{li}"
        if li == 0:
            q = _t_attn_ds(sd, f"{l}.self_attn", q, q, q)
        else:
            qp = q + tok_pe
            q = q + _t_attn_ds(sd, f"{l}.self_attn", qp, qp, q)
        q = _t_ln(sd, f"{l}.norm1", q)
        a = _t_attn_ds(sd, f"{l}.cross_attn_token_to_image", q + tok_pe,
                       src + pos_img, src)
        q = _t_ln(sd, f"{l}.norm2", q + a)
        h = TF.relu(TF.linear(q, sd[f"{l}.mlp.lin1.weight"],
                              sd[f"{l}.mlp.lin1.bias"]))
        q = _t_ln(sd, f"{l}.norm3",
                  q + TF.linear(h, sd[f"{l}.mlp.lin2.weight"],
                                sd[f"{l}.mlp.lin2.bias"]))
        a = _t_attn_ds(sd, f"{l}.cross_attn_image_to_token", src + pos_img,
                       q + tok_pe, q)
        src = _t_ln(sd, f"{l}.norm4", src + a)
    a = _t_attn_ds(sd, f"{t}.final_attn_token_to_image", q + tok_pe,
                   src + pos_img, src)
    q = _t_ln(sd, f"{t}.norm_final_attn", q + a)
    obj = _t_mlp3(sd, f"{d}.pred_obj_score_head", q[:, 0])[:, 0]
    iou = _t_mlp3(sd, f"{d}.iou_prediction_head", q[:, 1])
    mask_out = q[:, 2:6]
    img = src.transpose(1, 2).reshape(B, C, S, S)
    up = TF.conv_transpose2d(img, sd[f"{d}.output_upscaling.0.weight"],
                             sd[f"{d}.output_upscaling.0.bias"], stride=2)
    up = up + s1
    up = TF.layer_norm(up.permute(0, 2, 3, 1), (up.shape[1],),
                       sd[f"{d}.output_upscaling.1.weight"],
                       sd[f"{d}.output_upscaling.1.bias"],
                       eps=1e-6).permute(0, 3, 1, 2)
    up = TF.gelu(up)
    up = TF.conv_transpose2d(up, sd[f"{d}.output_upscaling.3.weight"],
                             sd[f"{d}.output_upscaling.3.bias"], stride=2)
    up = TF.gelu(up + s0)
    hyper = torch.stack(
        [_t_mlp3(sd, f"{d}.output_hypernetworks_mlps.{i}", mask_out[:, i])
         for i in range(4)], dim=1)  # [B, 4, C/8]
    logits = torch.einsum("bchw,bmc->bmhw", up, hyper)
    return logits, iou, obj


def _t_forward(sd, image, coords01, labels):
    feats = _t_hiera(sd, image)
    fpn = _t_neck(sd, feats)
    d = "sam_mask_decoder"
    s0 = TF.conv2d(fpn[0], sd[f"{d}.conv_s0.weight"],
                   sd[f"{d}.conv_s0.bias"])
    s1 = TF.conv2d(fpn[1], sd[f"{d}.conv_s1.weight"],
                   sd[f"{d}.conv_s1.bias"])
    embed = fpn[2] + sd["no_mem_embed"][0].view(1, -1, 1, 1)
    return _t_decode(sd, embed, s0, s1, coords01, labels)


def test_sam2_converter_parity(tmp_path, rng, monkeypatch):
    import jax.numpy as jnp

    from convert_weights import convert_sam2
    from splat_one_tpu.models import sam2_hiera as sm

    sd = _sd_mini(rng)
    ck = tmp_path / "sam2_mini.pt"
    torch.save(sd, ck)
    out = tmp_path / "sam2_mini.npz"
    convert_sam2(str(ck), str(out))

    monkeypatch.setitem(sm.CONFIGS, "mini", MINI)
    S = 64  # mini input resolution -> trunk stages 16/8/4/2
    img = rng.normal(scale=0.6, size=(1, 3, S, S)).astype(np.float32)
    coords = rng.uniform(0.1, 0.9, size=(1, 2, 2)).astype(np.float32)
    labels = np.array([[1.0, 0.0]], np.float32)
    with torch.no_grad():
        rl, ri, ro = _t_forward(sd, torch.tensor(img),
                                torch.tensor(coords),
                                torch.tensor(labels))
    rl, ri, ro = rl.numpy(), ri.numpy(), ro.numpy()

    z = np.load(out)
    params = {k: jnp.asarray(z[k]) for k in z.files}
    embed, (s0, s1) = sm.image_encoder_forward(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)), "mini")
    logits, iou, obj = sm.decode_masks(
        params, embed, (s0, s1), jnp.asarray(coords), jnp.asarray(labels))
    logits = np.asarray(logits)

    scale = np.abs(rl).max() + 1e-8
    assert np.abs(logits - rl).max() / scale < 3e-4, (
        np.abs(logits - rl).max(), scale)
    np.testing.assert_allclose(np.asarray(iou), ri, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(obj), ro, rtol=2e-3, atol=2e-4)
