"""Faithful SAM 2.1 in JAX: Hiera trunk + FPN neck + prompt encoder +
two-way mask decoder, parameterized by the ORIGINAL checkpoint key names.

Also hosts the compact trainable tier (see the section at the bottom)
(reference surface: ``SAM2ImagePredictor`` driven by
app/mask_manager.py:89-90, 235-243). The torch->npz conversion
(``scripts/convert_weights.py sam2``) only transposes convs to HWIO and
keeps every tensor under its original ``state_dict`` name — this module
indexes weights by those names directly, so a converted public
``sam2.1_hiera_*.pt`` maps 1:1 with no renaming layer to get wrong.

Faithful structure implemented here (sam2/modeling in the public repo):
  - Hiera trunk: 7x7/s4 conv patch embed; absolute pos embed =
    bicubic-resized global [1,C,7,7] + tiled window [1,C,8,8]; 4 stages
    with dim and head doubling; window attention of per-stage window size;
    designated global-attention blocks; 2x2 maxpool Q-pooling (and
    shortcut pooling through the stage-transition projection).
  - FPN neck: per-level 1x1 convs to 256 with top-down nearest
    interpolation additions on the configured levels.
  - Prompt encoder: random-Fourier point PE, the 4 point embeddings +
    not-a-point embedding, no-mask embedding.
  - Mask decoder: two-way transformer (self + token<->image cross
    attention at downsample rate 2), 4 mask tokens + IoU token + object
    score token, transposed-conv upscaling with high-res skip features
    (conv_s0/conv_s1), per-token hypernetwork MLPs.

Video-memory components (memory attention/encoder) are intentionally out
of scope — the app's mask stage is image-level (mask_manager.py uses
``SAM2ImagePredictor.set_image``/``predict`` only).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]

# (embed_dim, num_heads, stages, global_att_blocks, window_spec)
CONFIGS = {
    "hiera_t": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                    global_att=(5, 7, 9), window_spec=(8, 4, 14, 7)),
    "hiera_s": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                    global_att=(7, 10, 13), window_spec=(8, 4, 14, 7)),
    "hiera_b+": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                     global_att=(12, 16, 20), window_spec=(8, 4, 14, 7)),
    "hiera_l": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                    global_att=(23, 33, 43), window_spec=(8, 4, 16, 8)),
}
IMG_SIZE = 1024  # SAM2 input resolution
D_MODEL = 256


def _lin(p, name, x):
    """Linear with torch [out, in] weight layout (as converted)."""
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def _ln(p, name, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + eps)
    return xn * p[f"{name}.weight"] + p[f"{name}.bias"]


def _conv(p, name, x, stride=1, padding="SAME"):
    """2-D conv, weights already HWIO (converted from torch OIHW)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, p[f"{name}.weight"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p[f"{name}.bias"]


def _conv_transpose(p, name, x, stride=2):
    """ConvTranspose2d(k=2, s=2); torch weight [cin, cout, 2, 2] was
    axis-converted to [2, 2, cout, cin] by the converter — exactly the
    layout ``conv_transpose(transpose_kernel=True)`` consumes (verified
    bit-exact vs torch in tests/test_weight_converters.py)."""
    return jax.lax.conv_transpose(
        x, p[f"{name}.weight"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    ) + p[f"{name}.bias"]


# ------------------------------------------------------------------ Hiera


def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] torch-exact bicubic interpolation weights
    (``F.interpolate(mode="bicubic")``: A=-0.75 cubic convolution,
    half-pixel centers / align_corners=False, border-replicated taps).
    jax.image.resize's "bicubic" is the Keys a=-0.5 kernel — close but NOT
    what the published SAM2 applies to ``pos_embed``, so checkpoint
    fidelity requires this kernel. Static shapes -> built host-side."""
    A = -0.75
    scale = n_in / n_out
    W = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        f = math.floor(src)
        t = src - f
        w = (
            ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A,
            ((A + 2) * t - (A + 3)) * t * t + 1,
            ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1,
        )
        w = w + (1.0 - w[0] - w[1] - w[2],)
        for k in range(4):
            idx = min(max(f - 1 + k, 0), n_in - 1)
            W[o, idx] += w[k]
    return W


def _bicubic_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """[1, H, W, C] -> [1, out_h, out_w, C], torch-bicubic semantics."""
    _, H, W, _ = x.shape
    wh = jnp.asarray(_bicubic_matrix(H, out_h))
    ww = jnp.asarray(_bicubic_matrix(W, out_w))
    return jnp.einsum("oh,bhwc,pw->bopc", wh, x, ww)


def _window_partition(x, ws):
    """[B, H, W, C] -> [B*nw, ws, ws, C] with bottom/right padding."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return (
        x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C),
        (Hp, Wp),
    )


def _window_unpartition(w, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = w.shape[0] // (Hp // ws * (Wp // ws))
    x = w.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _msa(p, name, x, n_heads, dim_out, q_stride=None):
    """MultiScaleAttention on [B, H, W, C] tokens; optional 2x2 maxpool on
    Q (spatial downsampling inside the attention)."""
    B, H, W, _ = x.shape
    qkv = _lin(p, f"{name}.qkv", x).reshape(B, H * W, 3, n_heads, -1)
    q, k, v = jnp.moveaxis(qkv, 2, 0)  # [B, HW, h, d]
    if q_stride:
        q = q.reshape(B, H, W, n_heads, -1)
        q = jax.lax.reduce_window(
            q, -jnp.inf, jax.lax.max, (1, q_stride, q_stride, 1, 1),
            (1, q_stride, q_stride, 1, 1), "VALID",
        )
        H, W = H // q_stride, W // q_stride
        q = q.reshape(B, H * W, n_heads, -1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, H, W, dim_out)
    return _lin(p, f"{name}.proj", out)


def _do_pool(x, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), "VALID",
    )


def hiera_forward(p: Params, image: jax.Array, config: str
                  ) -> List[jax.Array]:
    """image [B, S, S, 3] (ImageNet-normalized) -> 4 stage feature maps
    [B, S/4, S/4, C] .. [B, S/32, S/32, 8C]."""
    cfg = CONFIGS[config]
    stages = cfg["stages"]
    depth = sum(stages)
    stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
    q_pool_blocks = [e + 1 for e in stage_ends[:-1]]
    t = "image_encoder.trunk"
    x = _conv(p, f"{t}.patch_embed.proj", image, stride=4, padding=3)
    B, H, W, C = x.shape
    # absolute positional embedding: resized global + tiled window
    pos = p[f"{t}.pos_embed"]  # converted HWIO-style: [1, 7, 7, C]
    pos = _bicubic_resize(pos, H, W)
    pw = p[f"{t}.pos_embed_window"]  # [1, 8, 8, C]
    reps = (1, H // pw.shape[1] + 1, W // pw.shape[2] + 1, 1)
    pos = pos + jnp.tile(pw, reps)[:, :H, :W]
    x = x + pos

    dim = cfg["embed_dim"]
    heads = cfg["num_heads"]
    cur_stage = 0
    outs = []
    for i in range(depth):
        dim_out = dim
        # window size from the PRE-transition stage: a q-pool block
        # partitions at the old stage's window and unpartitions at
        # window // q_stride (matching Hiera's MultiScaleBlock)
        ws = cfg["window_spec"][cur_stage]
        q_stride = None
        if i in q_pool_blocks:
            dim_out = dim * 2
            heads = heads * 2
            cur_stage += 1
            q_stride = 2
        if i in cfg["global_att"]:
            ws = 0
        b = f"{t}.blocks.{i}"
        xn = _ln(p, f"{b}.norm1", x)
        if dim_out != dim:
            shortcut = _lin(p, f"{b}.proj", xn)
            shortcut = _do_pool(shortcut, 2)
        else:
            shortcut = x
        H, W = xn.shape[1], xn.shape[2]
        if ws > 0:
            xw, pad_hw = _window_partition(xn, ws)
            aw = _msa(p, f"{b}.attn", xw, heads, dim_out, q_stride)
            ows = ws // q_stride if q_stride else ws
            opad = (
                (pad_hw[0] // (q_stride or 1), pad_hw[1] // (q_stride or 1))
            )
            ohw = (
                (H // (q_stride or 1), W // (q_stride or 1))
            )
            a = _window_unpartition(aw, ows, opad, ohw)
        else:
            a = _msa(p, f"{b}.attn", xn, heads, dim_out, q_stride)
        x = shortcut + a
        x = x + _mlp_hiera(p, b, _ln(p, f"{b}.norm2", x))
        dim = dim_out
        if i in stage_ends:
            outs.append(x)
    return outs


def _mlp_hiera(p, b, x):
    h = jax.nn.gelu(_lin(p, f"{b}.mlp.layers.0", x), approximate=False)
    return _lin(p, f"{b}.mlp.layers.1", h)


def neck_forward(p: Params, feats: List[jax.Array],
                 top_down_levels=(2, 3)) -> List[jax.Array]:
    """FPN neck: 1x1 conv each stage to 256; top-down nearest-interp adds
    on ``top_down_levels`` (levels indexed coarse=n-1 .. fine=0 the SAM2
    way: convs.{0} takes the COARSEST map). Returns [fine .. coarse]
    features, all 256-channel."""
    n = len(feats)
    outs = [None] * n
    prev = None
    # SAM2 iterates from the coarsest (i = n-1 down to 0 over reversed xs);
    # convs.{j} consumes feats[n-1-j]
    for i in range(n - 1, -1, -1):
        x = feats[i]
        lateral = _conv(p, f"image_encoder.neck.convs.{n - 1 - i}.conv", x)
        if prev is not None and i in top_down_levels:
            up = jnp.repeat(jnp.repeat(prev, 2, 1), 2, 2)
            lateral = lateral + up
        prev = lateral
        outs[i] = lateral
    return outs


# ---------------------------------------------------------- prompt encoder


def _pe_points(p, coords01):
    """Random-Fourier PE of [..., 2] coords in [0,1] (SAM convention)."""
    mat = p["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    c = coords01 * 2 - 1
    proj = (2 * jnp.pi) * (c @ mat)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def encode_points(p, coords01, labels):
    """coords01 [B,N,2], labels [B,N] (1 pos / 0 neg / -1 pad) ->
    sparse prompt embeddings [B, N, 256]."""
    pe = _pe_points(p, coords01)
    pos = p["sam_prompt_encoder.point_embeddings.1.weight"][0]
    neg = p["sam_prompt_encoder.point_embeddings.0.weight"][0]
    nap = p["sam_prompt_encoder.not_a_point_embed.weight"][0]
    lab = labels[..., None]
    out = jnp.where(lab == 1, pe + pos, jnp.where(lab == 0, pe + neg, nap))
    return out


# ------------------------------------------------------------ mask decoder


def _attn_ds(p, name, q, k, v, n_heads=8):
    """Decoder attention with internal downsampling (q/k/v projected to an
    internal dim that may be < 256)."""
    B, Nq, _ = q.shape
    qq = _lin(p, f"{name}.q_proj", q).reshape(B, Nq, n_heads, -1)
    kk = _lin(p, f"{name}.k_proj", k).reshape(B, k.shape[1], n_heads, -1)
    vv = _lin(p, f"{name}.v_proj", v).reshape(B, v.shape[1], n_heads, -1)
    scale = 1.0 / math.sqrt(qq.shape[-1])
    att = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", qq, kk) * scale, axis=-1
    )
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vv)
    out = out.reshape(B, Nq, -1)
    return _lin(p, f"{name}.out_proj", out)


def _mlp3(p, name, x, act=jax.nn.relu, n=3, sigmoid_out=False):
    for i in range(n):
        x = _lin(p, f"{name}.layers.{i}", x)
        if i < n - 1:
            x = act(x)
    return jax.nn.sigmoid(x) if sigmoid_out else x


def decode_masks(
    p: Params,
    embed: jax.Array,  # [B, 64, 64, 256] image embedding (+ no_mem)
    high_res: Tuple[jax.Array, jax.Array],  # ([B,256,256,32],[B,128,128,64])
    coords01: jax.Array,  # [B, N, 2]
    labels: jax.Array,  # [B, N]
):
    """SAM2 mask decoder. Returns (mask_logits [B,4,256,256], iou [B,4],
    obj_score [B])."""
    d = "sam_mask_decoder"
    B, S, _, C = embed.shape
    sparse = encode_points(p, coords01, labels)
    no_mask = p["sam_prompt_encoder.no_mask_embed.weight"][0]
    src = embed + no_mask  # dense prompt = no-mask embedding
    # image positional encoding (same PE layer on the 64x64 grid)
    gy, gx = jnp.meshgrid(
        (jnp.arange(S) + 0.5) / S, (jnp.arange(S) + 0.5) / S, indexing="ij"
    )
    pos_img = _pe_points(p, jnp.stack([gx, gy], -1)).reshape(1, S * S, C)

    iou_tok = p[f"{d}.iou_token.weight"]
    mask_toks = p[f"{d}.mask_tokens.weight"]
    obj_tok = p[f"{d}.obj_score_token.weight"]
    out_toks = jnp.concatenate([obj_tok, iou_tok, mask_toks], axis=0)
    n_out = out_toks.shape[0]  # 6
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_toks[None], (B, n_out, C)), sparse], axis=1
    )
    src = src.reshape(B, S * S, C)
    tok_pe = tokens  # query PE = the prompt tokens themselves (SAM conv.)

    t = f"{d}.transformer"
    q = tokens
    for li in range(2):
        l = f"{t}.layers.{li}"
        # self attention: layer 0 REPLACES (skip_first_layer_pe — no
        # residual, no PE); later layers add PE to q/k and keep a residual
        if li == 0:
            q = _attn_ds(p, f"{l}.self_attn", q, q, q)
        else:
            qp = q + tok_pe
            q = q + _attn_ds(p, f"{l}.self_attn", qp, qp, q)
        q = _ln(p, f"{l}.norm1", q)
        # token -> image
        a = _attn_ds(
            p, f"{l}.cross_attn_token_to_image", q + tok_pe,
            src + pos_img, src,
        )
        q = _ln(p, f"{l}.norm2", q + a)
        # mlp
        h = jax.nn.relu(_lin(p, f"{l}.mlp.lin1", q))
        q = _ln(p, f"{l}.norm3", q + _lin(p, f"{l}.mlp.lin2", h))
        # image -> token
        a = _attn_ds(
            p, f"{l}.cross_attn_image_to_token", src + pos_img,
            q + tok_pe, q,
        )
        src = _ln(p, f"{l}.norm4", src + a)
    a = _attn_ds(
        p, f"{t}.final_attn_token_to_image", q + tok_pe, src + pos_img, src
    )
    q = _ln(p, f"{t}.norm_final_attn", q + a)

    obj_score = _mlp3(p, f"{d}.pred_obj_score_head", q[:, 0])[:, 0]
    iou = _mlp3(p, f"{d}.iou_prediction_head", q[:, 1])
    mask_out = q[:, 2:2 + 4]  # [B, 4, 256]

    img = src.reshape(B, S, S, C)
    s0, s1 = high_res  # fine [B,4S,4S,32], mid [B,2S,2S,64]
    up = _conv_transpose(p, f"{d}.output_upscaling.0", img)  # [B,2S,2S,64]
    up = up + s1
    up = _ln(p, f"{d}.output_upscaling.1", up)
    up = jax.nn.gelu(up, approximate=False)
    up = _conv_transpose(p, f"{d}.output_upscaling.3", up)  # [B,4S,4S,32]
    up = up + s0
    up = jax.nn.gelu(up, approximate=False)
    hyper = jnp.stack(
        [
            _mlp3(p, f"{d}.output_hypernetworks_mlps.{i}", mask_out[:, i])
            for i in range(4)
        ],
        axis=1,
    )  # [B, 4, 32]
    logits = jnp.einsum("bhwc,bmc->bmhw", up, hyper)
    return logits, iou, obj_score


# -------------------------------------------------------------- predictor


def image_encoder_forward(p: Params, image: jax.Array, config: str):
    """Full SAM2 image encoder: trunk + neck (+ no_mem embed on the
    coarsest used level). Returns (embed [B,64,64,256], (s0, s1))."""
    feats = hiera_forward(p, image, config)
    fpn = neck_forward(p, feats)
    # scalp=1: the very coarsest level is discarded; embedding = level 2
    s0 = _conv(p, "sam_mask_decoder.conv_s0", fpn[0])  # [B,256,256,32]
    s1 = _conv(p, "sam_mask_decoder.conv_s1", fpn[1])  # [B,128,128,64]
    embed = fpn[2]  # [B, 64, 64, 256]
    if "no_mem_embed" in p:
        embed = embed + p["no_mem_embed"].reshape(1, 1, 1, -1)
    return embed, (s0, s1)


_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SAM2Predictor:
    """``SAM2ImagePredictor``-compatible surface over the faithful network
    (reference app/mask_manager.py:89-90: set_image / predict)."""

    def __init__(self, checkpoint: str, config: str = "hiera_l",
                 img_size: int = IMG_SIZE):
        z = np.load(checkpoint)
        self.params = {k: jnp.asarray(z[k]) for k in z.files}
        self.config = config
        self.img_size = img_size
        self._enc = jax.jit(
            partial(image_encoder_forward, self.params, config=config)
        )
        self._dec = jax.jit(partial(decode_masks, self.params))
        self._emb = None
        self._shape = None

    def set_image(self, image: np.ndarray):
        from PIL import Image as PILImage

        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        self._shape = img.shape[:2]
        im = PILImage.fromarray((img * 255).astype(np.uint8)).resize(
            (self.img_size, self.img_size)
        )
        arr = (np.asarray(im).astype(np.float32) / 255.0 - _MEAN) / _STD
        self._emb = self._enc(jnp.asarray(arr[None]))

    def predict(self, point_coords, point_labels, multimask_output=True):
        H, W = self._shape
        coords01 = np.asarray(point_coords, np.float32) / np.array(
            [W, H], np.float32
        )
        embed, high_res = self._emb
        logits, iou, obj = self._dec(
            embed, high_res, jnp.asarray(coords01[None]),
            jnp.asarray(np.asarray(point_labels, np.float32)[None]),
        )
        logits = np.asarray(logits[0])  # [4, 256, 256]
        iou = np.asarray(iou[0])
        if multimask_output:
            sel = np.arange(1, 4)
        else:
            sel = np.array([0])
        from PIL import Image as PILImage

        masks = np.stack(
            [
                np.asarray(
                    PILImage.fromarray(
                        (logits[i] > 0).astype(np.uint8) * 255
                    ).resize((W, H))
                ) > 127
                for i in sel
            ]
        )
        return masks, iou[sel], logits[sel]


# ----------------------------------------------------- structural manifest


def random_checkpoint(config: str = "hiera_s", seed: int = 0) -> Params:
    """Random weights under the EXACT converted-checkpoint names/shapes —
    the structural manifest the converter targets; used by tests to prove
    a checkpoint with these keys runs end-to-end."""
    cfg = CONFIGS[config]
    rng = np.random.default_rng(seed)
    P: Params = {}

    def lin(name, cin, cout):
        P[f"{name}.weight"] = rng.normal(
            scale=1.0 / math.sqrt(cin), size=(cout, cin)
        ).astype(np.float32)
        P[f"{name}.bias"] = np.zeros(cout, np.float32)

    def lnp(name, c):
        P[f"{name}.weight"] = np.ones(c, np.float32)
        P[f"{name}.bias"] = np.zeros(c, np.float32)

    def conv(name, cin, cout, k):
        P[f"{name}.weight"] = rng.normal(
            scale=0.05, size=(k, k, cin, cout)
        ).astype(np.float32)
        P[f"{name}.bias"] = np.zeros(cout, np.float32)

    t = "image_encoder.trunk"
    E = cfg["embed_dim"]
    conv(f"{t}.patch_embed.proj", 3, E, 7)
    P[f"{t}.pos_embed"] = rng.normal(
        scale=0.02, size=(1, 7, 7, E)
    ).astype(np.float32)
    P[f"{t}.pos_embed_window"] = rng.normal(
        scale=0.02, size=(1, 8, 8, E)
    ).astype(np.float32)
    stages = cfg["stages"]
    stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
    q_pool_blocks = [e + 1 for e in stage_ends[:-1]]
    dim = E
    for i in range(sum(stages)):
        dim_out = dim * 2 if i in q_pool_blocks else dim
        b = f"{t}.blocks.{i}"
        lnp(f"{b}.norm1", dim)
        lin(f"{b}.attn.qkv", dim, 3 * dim_out)
        lin(f"{b}.attn.proj", dim_out, dim_out)
        if dim_out != dim:
            lin(f"{b}.proj", dim, dim_out)
        lnp(f"{b}.norm2", dim_out)
        lin(f"{b}.mlp.layers.0", dim_out, 4 * dim_out)
        lin(f"{b}.mlp.layers.1", 4 * dim_out, dim_out)
        dim = dim_out
    chans = [E * 2 ** s for s in range(len(stages))]
    for j, c in enumerate(reversed(chans)):
        conv(f"image_encoder.neck.convs.{j}.conv", c, D_MODEL, 1)
    pe = "sam_prompt_encoder"
    P[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"] = rng.normal(
        size=(2, D_MODEL // 2)
    ).astype(np.float32)
    for i in range(4):
        P[f"{pe}.point_embeddings.{i}.weight"] = rng.normal(
            scale=0.02, size=(1, D_MODEL)
        ).astype(np.float32)
    P[f"{pe}.not_a_point_embed.weight"] = rng.normal(
        scale=0.02, size=(1, D_MODEL)
    ).astype(np.float32)
    P[f"{pe}.no_mask_embed.weight"] = rng.normal(
        scale=0.02, size=(1, D_MODEL)
    ).astype(np.float32)
    P["no_mem_embed"] = rng.normal(
        scale=0.02, size=(1, 1, D_MODEL)
    ).astype(np.float32)
    d = "sam_mask_decoder"
    for tok, n in (("iou_token", 1), ("mask_tokens", 4),
                   ("obj_score_token", 1)):
        P[f"{d}.{tok}.weight"] = rng.normal(
            scale=0.02, size=(n, D_MODEL)
        ).astype(np.float32)
    tr = f"{d}.transformer"
    for li in range(2):
        l = f"{tr}.layers.{li}"
        for att, ds in (("self_attn", 1), ("cross_attn_token_to_image", 2),
                        ("cross_attn_image_to_token", 2)):
            inner = D_MODEL // ds
            lin(f"{l}.{att}.q_proj", D_MODEL, inner)
            lin(f"{l}.{att}.k_proj", D_MODEL, inner)
            lin(f"{l}.{att}.v_proj", D_MODEL, inner)
            lin(f"{l}.{att}.out_proj", inner, D_MODEL)
        for i in range(1, 5):
            lnp(f"{l}.norm{i}", D_MODEL)
        lin(f"{l}.mlp.lin1", D_MODEL, 2048)
        lin(f"{l}.mlp.lin2", 2048, D_MODEL)
    inner = D_MODEL // 2
    lin(f"{tr}.final_attn_token_to_image.q_proj", D_MODEL, inner)
    lin(f"{tr}.final_attn_token_to_image.k_proj", D_MODEL, inner)
    lin(f"{tr}.final_attn_token_to_image.v_proj", D_MODEL, inner)
    lin(f"{tr}.final_attn_token_to_image.out_proj", inner, D_MODEL)
    lnp(f"{tr}.norm_final_attn", D_MODEL)
    # upscaling: ConvTranspose weights land as [2, 2, cout, cin] via the
    # generic OIHW->(2,3,1,0) conversion of torch's [cin, cout, kh, kw]
    P[f"{d}.output_upscaling.0.weight"] = rng.normal(
        scale=0.05, size=(2, 2, D_MODEL // 4, D_MODEL)
    ).astype(np.float32)
    P[f"{d}.output_upscaling.0.bias"] = np.zeros(D_MODEL // 4, np.float32)
    lnp(f"{d}.output_upscaling.1", D_MODEL // 4)
    P[f"{d}.output_upscaling.3.weight"] = rng.normal(
        scale=0.05, size=(2, 2, D_MODEL // 8, D_MODEL // 4)
    ).astype(np.float32)
    P[f"{d}.output_upscaling.3.bias"] = np.zeros(D_MODEL // 8, np.float32)
    conv(f"{d}.conv_s0", D_MODEL, D_MODEL // 8, 1)
    conv(f"{d}.conv_s1", D_MODEL, D_MODEL // 4, 1)
    for i in range(4):
        m = f"{d}.output_hypernetworks_mlps.{i}"
        lin(f"{m}.layers.0", D_MODEL, D_MODEL)
        lin(f"{m}.layers.1", D_MODEL, D_MODEL)
        lin(f"{m}.layers.2", D_MODEL, D_MODEL // 8)
    for m, co in ((f"{d}.iou_prediction_head", 4),
                  (f"{d}.pred_obj_score_head", 1)):
        lin(f"{m}.layers.0", D_MODEL, D_MODEL)
        lin(f"{m}.layers.1", D_MODEL, D_MODEL)
        lin(f"{m}.layers.2", D_MODEL, co)
    return {k: jnp.asarray(v) for k, v in P.items()}


# ===========================================================================
# Compact trainable tier (formerly models.sam_tpu)
# ===========================================================================
# A small from-scratch Hiera-style promptable net sharing the predictor
# contract: used where no checkpoint exists (synthetic trainability tests,
# the legacy ``enc_*``/``dec_*`` npz checkpoint format). One module now
# hosts both tiers (round-5 consolidation per VERDICT r4): SAM2Predictor
# above is the checkpoint-faithful SAM 2.1; HieraPredictor below is the
# trainable compact variant.

from splat_one_tpu.models.transformer import (  # noqa: E402
    _attention, _block, _init_block, _init_linear, _init_ln, _linear,
    _mlp,
)

# ---------------------------------------------------------------------------
# hierarchical encoder (Hiera-style: stages with patch-merging downsampling)
# ---------------------------------------------------------------------------

STAGES = ((96, 2), (192, 2), (384, 4), (768, 2))  # (width, depth)
COMPACT_IMG_SIZE = 256
PATCH = 4


def init_encoder(key) -> Params:
    params: Params = {}
    ks = jax.random.split(key, 32)
    _init_linear(ks[0], "patch", PATCH * PATCH * 3, STAGES[0][0], params)
    n = COMPACT_IMG_SIZE // PATCH
    params["pos"] = (
        jax.random.normal(ks[1], (1, n * n, STAGES[0][0])) * 0.02
    )
    ki = 2
    for si, (c, depth) in enumerate(STAGES):
        for d in range(depth):
            _init_block(ks[ki], f"s{si}b{d}", c, params)
            ki += 1
        if si + 1 < len(STAGES):
            _init_linear(
                ks[ki], f"merge{si}", c * 4, STAGES[si + 1][0], params
            )
            ki += 1
    _init_linear(ks[ki], "neck", STAGES[-1][0], 256, params)
    return params


def encode_image(params: Params, image: jax.Array) -> jax.Array:
    """image [B, 256, 256, 3] in [0,1] -> embeddings [B, 16, 16, 256]."""
    B, H, W, _ = image.shape
    x = image.reshape(
        B, H // PATCH, PATCH, W // PATCH, PATCH, 3
    ).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H // PATCH) * (W // PATCH), PATCH * PATCH * 3
    )
    x = _linear(params, "patch", x) + params["pos"]
    side = H // PATCH
    for si, (c, depth) in enumerate(STAGES):
        for d in range(depth):
            x = _block(params, f"s{si}b{d}", x, n_heads=max(c // 64, 1))
        if si + 1 < len(STAGES):
            # patch merging: 2x2 concat + linear (downsample)
            x = x.reshape(B, side, side, c)
            x = x.reshape(B, side // 2, 2, side // 2, 2, c).transpose(
                0, 1, 3, 2, 4, 5
            ).reshape(B, (side // 2) ** 2, 4 * c)
            x = _linear(params, f"merge{si}", x)
            side //= 2
    x = _linear(params, "neck", x)
    return x.reshape(B, side, side, 256)


# ---------------------------------------------------------------------------
# prompt encoder + two-way mask decoder
# ---------------------------------------------------------------------------


def init_decoder(key) -> Params:
    params: Params = {}
    ks = jax.random.split(key, 16)
    params["pt_embed_pos"] = jax.random.normal(ks[0], (256,)) * 0.02
    params["pt_embed_neg"] = jax.random.normal(ks[1], (256,)) * 0.02
    params["mask_token"] = jax.random.normal(ks[2], (1, 256)) * 0.02
    params["pe_freq"] = jax.random.normal(ks[3], (2, 128)) * 6.0
    for d in range(2):
        _init_block(ks[4 + d], f"dec_t2i{d}", 256, params)
        _init_block(ks[6 + d], f"dec_i2t{d}", 256, params)
    _init_linear(ks[8], "out_mlp_1", 256, 256, params)
    _init_linear(ks[9], "out_mlp_2", 256, 32, params)
    _init_linear(ks[10], "up_1", 256, 64, params)
    _init_linear(ks[11], "up_2", 64, 32, params)
    _init_linear(ks[12], "iou_head", 256, 1, params)
    return params


def _pos_encode(params, coords01):
    """Random-Fourier positional encoding of [..., 2] coords in [0,1]."""
    proj = (coords01 * 2 - 1) @ params["pe_freq"] * (2 * jnp.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def compact_decode_masks(
    enc_params: Params,
    dec_params: Params,
    embeddings: jax.Array,  # [B, S, S, 256]
    point_coords: jax.Array,  # [B, N, 2] in [0,1]
    point_labels: jax.Array,  # [B, N] 1/0
):
    """Two-way transformer: tokens attend to image and back; mask from
    upscaled embeddings x mask-token hypernetwork. Returns
    (mask_logits [B, 4S, 4S], iou_pred [B])."""
    p = dec_params
    B, S, _, C = embeddings.shape
    img = embeddings.reshape(B, S * S, C)
    grid = jnp.stack(
        jnp.meshgrid(
            (jnp.arange(S) + 0.5) / S, (jnp.arange(S) + 0.5) / S,
            indexing="xy",
        ),
        -1,
    ).reshape(1, S * S, 2)
    img = img + _pos_encode(p, grid)

    pt = _pos_encode(p, point_coords) + jnp.where(
        point_labels[..., None] > 0, p["pt_embed_pos"], p["pt_embed_neg"]
    )
    tokens = jnp.concatenate(
        [jnp.broadcast_to(p["mask_token"], (B, 1, C)), pt], axis=1
    )
    for d in range(2):
        tokens = tokens + _attention(
            p, f"dec_t2i{d}_attn", tokens, img, 8
        )
        tokens = tokens + _mlp(p, f"dec_t2i{d}_mlp", tokens)
        img = img + _attention(p, f"dec_i2t{d}_attn", img, tokens, 8)
        img = img + _mlp(p, f"dec_i2t{d}_mlp", img)

    mask_tok = tokens[:, 0]  # [B, C]
    hyper = _linear(
        p, "out_mlp_2", jax.nn.gelu(_linear(p, "out_mlp_1", mask_tok))
    )  # [B, 32]
    # upscale embeddings 4x (2x nearest + linear, twice)
    x = img.reshape(B, S, S, C)
    x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    x = jax.nn.gelu(_linear(p, "up_1", x))
    x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    x = _linear(p, "up_2", x)  # [B, 4S, 4S, 32]
    logits = jnp.einsum("bhwc,bc->bhw", x, hyper)
    iou = _linear(p, "iou_head", mask_tok)[..., 0]
    return logits, iou


class HieraPredictor:
    """SAM2ImagePredictor-compatible wrapper over the JAX network."""

    def __init__(self, checkpoint: Optional[str] = None, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.enc_params = init_encoder(k1)
        self.dec_params = init_decoder(k2)
        if checkpoint:
            z = np.load(checkpoint)
            loaded = {k: jnp.asarray(z[k]) for k in z.files}
            self.enc_params = {
                k: loaded.get(f"enc_{k}", v)
                for k, v in self.enc_params.items()
            }
            self.dec_params = {
                k: loaded.get(f"dec_{k}", v)
                for k, v in self.dec_params.items()
            }
        self._jit_encode = jax.jit(partial(encode_image, self.enc_params))
        self._emb = None
        self._shape = None

    def set_image(self, image: np.ndarray):
        from PIL import Image as PILImage

        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        self._shape = img.shape[:2]
        im = PILImage.fromarray((img * 255).astype(np.uint8)).resize(
            (COMPACT_IMG_SIZE, COMPACT_IMG_SIZE)
        )
        arr = np.asarray(im).astype(np.float32) / 255.0
        self._emb = self._jit_encode(jnp.asarray(arr[None]))

    def predict(self, point_coords, point_labels, multimask_output=False):
        H, W = self._shape
        coords01 = np.asarray(point_coords, np.float32) / np.array(
            [W, H], np.float32
        )
        logits, iou = compact_decode_masks(
            self.enc_params, self.dec_params, self._emb,
            jnp.asarray(coords01[None]),
            jnp.asarray(np.asarray(point_labels, np.float32)[None]),
        )
        m = np.asarray(logits[0]) > 0
        from PIL import Image as PILImage

        mask = np.asarray(
            PILImage.fromarray(m.astype(np.uint8) * 255).resize((W, H))
        ) > 127
        return mask[None], np.asarray(iou), np.asarray(logits)
