"""EGVSR / FRNet — frame-recurrent video super-resolution.

Capability parity with reference src/upscale/model/egvsr/egvsr.py:12-265:
FNet (3-level conv encoder/decoder optical flow, tanh * 24 max velocity),
SRNet (space-to-depth concat of the warped previous HR frame -> 16 residual
blocks -> PixelShuffle(4) -> out conv), and the FRNet recurrence
flow -> upsample-flow -> backward-warp(hr_prev) -> space_to_depth -> SRNet.

TPU design: the training unroll (`forward_sequence`, reference :214-265)
and streaming inference (`infer_sequence`, :267+) are both `lax.scan`s over
the time axis with an (lr_prev, hr_prev) carry pytree — the recurrence
state stays in HBM across frames.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    backward_warp,
    backward_warp_fast,
    pixel_shuffle_folded_dil,
    pixel_shuffle_mxu,
    conv2d,
    leaky_relu,
    pad2d,
    pixel_shuffle,
    resize,
    space_to_depth,
    space_to_depth_mxu,
    upsample_tecogan,
)
from .torch_import import conv_from_torch


def _s2d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """The HR->LR space-to-depth of the warped previous frame: on TPU
    the one-hot-conv form runs the big relayout on the MXU (18.6 ->
    6.6 ms at 2880x5120 on v5e, bit-identical); elsewhere the reshape
    form."""
    if jax.default_backend() == "tpu":
        return space_to_depth_mxu(x, r)
    return space_to_depth(x, r)


class EGVSRConfig(NamedTuple):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    scale: int = 4
    degradation: str = "BI"  # flow upsample: bilinear (BI); BD uses bicubic


DEFAULT = EGVSRConfig()
# the reference's PRODUCTION instantiation (egvsr_upscaler.py:26):
# FRNet(in_nc=3, out_nc=3, nf=64, nb=10, degradation='BD', scale=4) —
# 10 residual blocks (not the class default 16) and the TecoGAN bicubic
# flow upsample.  EGVSR_iter420000.pth is trained at this shape.
PRODUCTION = EGVSRConfig(nb=10, degradation="BD")


def _upsample_flow(flow: jnp.ndarray, h: int, w: int, cfg: EGVSRConfig) -> jnp.ndarray:
    """scale * upsample(flow) per the reference's get_upsampling_func
    (net_utils.py:36-166): BI -> bilinear align_corners=False; BD -> the
    TecoGAN grouped-conv bicubic (upsample_tecogan)."""
    s = cfg.scale
    if cfg.degradation == "BD":
        up = upsample_tecogan(flow, s)
    else:
        up = resize(flow, (h * s, w * s), "bilinear")
    return jnp.asarray(float(s), flow.dtype) * up


def _conv_init(key, kh, kw, i, o):
    fan_in = i * kh * kw
    w = jax.random.normal(key, (kh, kw, i, o), jnp.float32) * np.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((o,), jnp.float32)}


def init_params(key: jax.Array, cfg: EGVSRConfig = DEFAULT) -> dict:
    ks = iter(jax.random.split(key, 64))
    c = cfg.in_nc

    fnet = {
        "enc1": [_conv_init(next(ks), 3, 3, 2 * c, 32), _conv_init(next(ks), 3, 3, 32, 32)],
        "enc2": [_conv_init(next(ks), 3, 3, 32, 64), _conv_init(next(ks), 3, 3, 64, 64)],
        "enc3": [_conv_init(next(ks), 3, 3, 64, 128), _conv_init(next(ks), 3, 3, 128, 128)],
        "dec1": [_conv_init(next(ks), 3, 3, 128, 256), _conv_init(next(ks), 3, 3, 256, 256)],
        "dec2": [_conv_init(next(ks), 3, 3, 256, 128), _conv_init(next(ks), 3, 3, 128, 128)],
        "dec3": [_conv_init(next(ks), 3, 3, 128, 64), _conv_init(next(ks), 3, 3, 64, 64)],
        # final flow layer small-init: a fresh FNet predicts ~zero flow
        # (standard for flow nets — large random flows destabilize the
        # early recurrence AND push the banded warp kernel off its FAST
        # window; trained flows on real video are small except at cuts)
        "flow": [
            _conv_init(next(ks), 3, 3, 64, 32),
            jax.tree_util.tree_map(
                lambda v: v * 1e-2, _conv_init(next(ks), 3, 3, 32, 2)
            ),
        ],
    }
    srnet = {
        "conv_in": _conv_init(next(ks), 3, 3, (cfg.scale**2 + 1) * c, cfg.nf),
        "blocks": [
            [_conv_init(next(ks), 3, 3, cfg.nf, cfg.nf), _conv_init(next(ks), 3, 3, cfg.nf, cfg.nf)]
            for _ in range(cfg.nb)
        ],
        # output small-init: a fresh net emits ~zero HR, so the training
        # unroll's hr_prev feedback starts stable instead of amplifying
        # the random init geometrically over T steps (measured: default
        # init starts the derived-data run at mean |err| ~775 and burns
        # thousands of iters recovering)
        "conv_out": jax.tree_util.tree_map(
            lambda v: v * 0.1,
            _conv_init(next(ks), 3, 3, cfg.nf // 16, cfg.out_nc),
        ),
    }
    return {"fnet": fnet, "srnet": srnet}


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def _enc(p, x):
    x = leaky_relu(conv2d(x, **p[0], padding=1), 0.2)
    x = leaky_relu(conv2d(x, **p[1], padding=1), 0.2)
    return x


def fnet_apply(params: dict, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Optical flow x1 -> x2. Inputs NHWC in [0,1]; output (N, H', W', 2)
    with H' = H//8*8 (restored to H by the caller's reflect pad).

    The full-resolution narrow stages (enc1: 6->32->32 and the flow
    head: 64->32->2) run lane-folded on TPU (ops/lanefold.py) — they are
    the MXU-starved part of FNet's cost at 720p."""
    from ..ops.lanefold import (
        conv3x3_folded,
        fold_lanes,
        lanefold_enabled,
        unfold_lanes,
    )

    p = params
    x = jnp.concatenate([x1, x2], axis=-1)
    if lanefold_enabled(x.shape[-2], 4):
        xf = fold_lanes(x, 4)
        xf = leaky_relu(conv3x3_folded(xf, *_wb(p["enc1"][0]), 4), 0.2)
        xf = leaky_relu(conv3x3_folded(xf, *_wb(p["enc1"][1]), 4), 0.2)
        out = _maxpool2(unfold_lanes(xf, 4))
    else:
        out = _maxpool2(_enc(p["enc1"], x))
    out = _maxpool2(_enc(p["enc2"], out))
    out = _maxpool2(_enc(p["enc3"], out))
    h, w = out.shape[-3], out.shape[-2]
    out = resize(_enc(p["dec1"], out), (h * 2, w * 2), "bilinear")
    out = resize(_enc(p["dec2"], out), (h * 4, w * 4), "bilinear")
    out = resize(_enc(p["dec3"], out), (h * 8, w * 8), "bilinear")
    if lanefold_enabled(out.shape[-2], 2):
        of = fold_lanes(out, 2)
        of = leaky_relu(conv3x3_folded(of, *_wb(p["flow"][0]), 2), 0.2)
        of = conv3x3_folded(of, *_wb(p["flow"][1]), 2)
        out = unfold_lanes(of, 2)
    else:
        out = leaky_relu(conv2d(out, **p["flow"][0], padding=1), 0.2)
        out = conv2d(out, **p["flow"][1], padding=1)
    return jnp.tanh(out) * jnp.asarray(24.0, out.dtype)


def _wb(p: dict):
    return p["w"], p.get("b")


def _fold_conv_out(w: jnp.ndarray, b: jnp.ndarray, s: int):
    """Fold the post-pixel-shuffle 3x3 conv_out back to LR resolution.

    conv_out(relu(pixel_shuffle(y, s))) == pixel_shuffle(conv3x3_lr(
    relu(y), W_lr), s) exactly: each HR output phase (i, j) taps HR
    neighbours that live in adjacent LR pixels' shuffle channels, so
    W_lr[(dY,dX), (c,a,b), (o,i,j)] = W[(a-i+s*dY, b-j+s*dX), c, o]
    where the HR offset is within the 3x3 support, else 0.  The HR-
    resolution conv ran with C_in=s*s-fold fewer channels than the MXU
    lane width (C=4 at 2160p: ~10 ms); the folded conv is a dense
    C64->48 LR conv (~1.4 ms) — measured 21.3 -> ~11 ms for the tail."""
    kh, kw, c_hr, o_hr = w.shape
    off = kh // 2
    dY = np.arange(-(off // s + 1), off // s + 2)  # LR taps that can hit
    a = np.arange(s)
    grid = a[None, :, None] - a[None, None, :] + s * dY[:, None, None]
    valid = np.abs(grid) <= off                     # (D, a, i)
    idx = np.clip(grid + off, 0, kh - 1)
    iy = idx[:, :, :, None, None, None]
    ix = idx[None, None, None, :, :, :]
    wg = w[iy, ix]                                  # (D,a,i, E,b,j, c, o)
    m = (valid[:, :, :, None, None, None] & valid[None, None, None]).astype(w.dtype)
    wg = wg * m[..., None, None]
    wg = wg.transpose(0, 3, 6, 1, 4, 7, 2, 5)       # D,E,c,a,b,o,i,j
    d = len(dY)
    w_lr = wg.reshape(d, d, c_hr * s * s, o_hr * s * s)
    b_lr = jnp.repeat(b, s * s)
    return w_lr, b_lr, d // 2


def _srnet_body(p: dict, y: jnp.ndarray) -> jnp.ndarray:
    for blk in p["blocks"]:
        r = jnp.maximum(conv2d(y, **blk[0], padding=1), 0)
        y = conv2d(r, **blk[1], padding=1) + y
    w_lr, b_lr, pad = _fold_conv_out(p["conv_out"]["w"], p["conv_out"]["b"], 4)
    z = conv2d(jnp.maximum(y, 0), w_lr, b_lr, padding=pad)
    # one-hot-conv shuffle: the big HR relayout on the MXU (9.7 -> 6.6 ms)
    return pixel_shuffle_mxu(z, 4)


def _srnet_body_folded(p: dict, yf: jnp.ndarray) -> jnp.ndarray:
    """Residual chain + folded conv_out in W-pair lane-folded layout
    (ops/lanefold.py): the N=1 C=64 chain is the EGVSR hot spot (58 ms of
    112 at 720p, BASELINE.md) and the dense 128-lane form measured ~24 %
    faster on v5e (1.62 -> 1.23 ms/conv at N=1); exact
    re-parametrization."""
    from ..ops.lanefold import conv3x3_folded, unfold_lanes

    for blk in p["blocks"]:
        r = jnp.maximum(conv3x3_folded(yf, blk[0]["w"], blk[0]["b"], 2), 0)
        yf = conv3x3_folded(r, blk[1]["w"], blk[1]["b"], 2) + yf
    w_lr, b_lr, _pad = _fold_conv_out(p["conv_out"]["w"], p["conv_out"]["b"], 4)
    zf = conv3x3_folded(jnp.maximum(yf, 0), w_lr, b_lr, 2)
    # ps4 as an (r,1) lhs-dilated one-hot on the still-folded z: no
    # transpose, no 3-lane HR conv (18.4 -> 12.5 ms tail, round-5 probe)
    return unfold_lanes(pixel_shuffle_folded_dil(zf, 4, 2), 8)


def srnet_apply(params: dict, lr_curr: jnp.ndarray, hr_prev_tran: jnp.ndarray) -> jnp.ndarray:
    """lr_curr (N,H,W,c) + space-to-depth'd warped hr_prev (N,H,W,s^2*c)."""
    from ..ops.lanefold import conv3x3_folded, fold_lanes, lanefold_enabled

    p = params
    x = jnp.concatenate([lr_curr, hr_prev_tran], -1)
    if lanefold_enabled(x.shape[-2], 2):
        yf = jnp.maximum(
            conv3x3_folded(fold_lanes(x, 2), p["conv_in"]["w"], p["conv_in"]["b"], 2), 0
        )
        return _srnet_body_folded(p, yf)
    y = jnp.maximum(conv2d(x, **p["conv_in"], padding=1), 0)
    return _srnet_body(p, y)


def frnet_step(
    params: dict,
    lr_curr: jnp.ndarray,
    lr_prev: jnp.ndarray,
    hr_prev: jnp.ndarray,
    *,
    cfg: EGVSRConfig = DEFAULT,
    fast_warp: bool = False,
    cut_threshold: float | None = None,
) -> jnp.ndarray:
    """One recurrence step (reference FRNet.forward, egvsr.py:180-212).

    fast_warp routes the HR warp through the gather-free banded Pallas
    kernel (exact-fallback semantics; inference only — the gather path
    stays the differentiable/training formulation).

    cut_threshold (inference improvement over the reference, off by
    default): when mean |lr_curr - lr_prev| exceeds it, the frame is a
    scene cut — FNet's flow is then meaningless, frame-recurrent SR
    degenerates to zero-flow anyway, and a garbage flow field forces the
    banded warp onto its expensive FULL window.  The whole flow+warp
    branch is skipped under lax.cond (hr_warp := hr_prev, exactly the
    zero-flow warp), bounding per-frame cost at cuts BELOW the smooth-
    flow cost instead of +50 ms above it (BASELINE.md r2 EGVSR note)."""
    s = cfg.scale
    h, w = lr_curr.shape[-3], lr_curr.shape[-2]

    def flow_warp():
        flow = fnet_apply(params["fnet"], lr_curr, lr_prev)
        pad_h, pad_w = h - flow.shape[-3], w - flow.shape[-2]
        if pad_h or pad_w:
            flow_p = pad2d(flow, (0, pad_w, 0, pad_h), mode="reflect")
        else:
            flow_p = flow
        hr_flow = _upsample_flow(flow_p, h, w, cfg)
        # NOTE: two s2d-avoidance reformulations are measured negatives:
        # (a) planar-warp-output + strided-conv_in fold — 17.3 vs 11.1 ms at
        # 2160p, the 12x12/s4 C_in=3 conv is MXU-hostile
        # (experiments/planar_warp.py); (b) fusing s2d into the warp kernel's
        # output tiles via one-hot permutation matmuls (warp_band s2d_out) —
        # 165 vs 112.6 ms full-step at 720p, the 12 tiny per-tile matmuls
        # cost more than XLA's relayout.  s2d + conv stays the fastest.
        warp = backward_warp_fast if fast_warp else backward_warp
        # both cond branches must agree on dtype (the banded kernel
        # computes in bf16; the skip branch passes hr_prev through)
        return warp(hr_prev, hr_flow).astype(lr_curr.dtype)

    if cut_threshold is None:
        hr_warp = flow_warp()
    else:
        diff = jnp.mean(
            jnp.abs(
                lr_curr.astype(jnp.float32) - lr_prev.astype(jnp.float32)
            )
        )
        hr_warp = jax.lax.cond(
            diff > cut_threshold, lambda: hr_prev.astype(lr_curr.dtype), flow_warp
        )
    return srnet_apply(params["srnet"], lr_curr, _s2d(hr_warp, s))


def init_recurrent_state(n: int, h: int, w: int, cfg: EGVSRConfig = DEFAULT, dtype=jnp.float32):
    """(lr_prev, hr_prev) zero state for a fresh stream."""
    s = cfg.scale
    return (
        jnp.zeros((n, h, w, cfg.in_nc), dtype),
        jnp.zeros((n, h * s, w * s, cfg.out_nc), dtype),
    )


def infer_step(
    params,
    state,
    lr_curr,
    *,
    cfg: EGVSRConfig = DEFAULT,
    fast_warp: bool = True,
    cut_threshold: float | None = None,
):
    """Streaming step carrying (lr_prev, hr_prev) — the service-side analogue
    of reference egvsr_upscaler.py:197-207.  Uses the banded warp kernel
    on TPU by default (falls back to the exact gather warp off-TPU, for
    kernel-unfriendly shapes, and for rough flow fields); cut_threshold
    enables the scene-cut skip-warp fallback (see frnet_step)."""
    lr_prev, hr_prev = state
    hr = frnet_step(
        params, lr_curr, lr_prev, hr_prev, cfg=cfg, fast_warp=fast_warp,
        cut_threshold=cut_threshold,
    )
    return hr, (lr_curr, hr)


def forward_sequence(params: dict, lr_data: jnp.ndarray, *, cfg: EGVSRConfig = DEFAULT) -> dict:
    """Training unroll (reference forward_sequence, egvsr.py:214-265).

    lr_data: (N, T, H, W, C).  Returns hr_data (N,T,sH,sW,C), plus the flow
    tensors used by the warping loss.  Flow for all pairs is computed in one
    batched fnet call (MXU-friendly), then the SR recurrence runs as a scan.
    """
    n, t, h, w, c = lr_data.shape
    s = cfg.scale

    lr_prev = lr_data[:, :-1].reshape(n * (t - 1), h, w, c)
    lr_curr = lr_data[:, 1:].reshape(n * (t - 1), h, w, c)
    lr_flow = fnet_apply(params["fnet"], lr_curr, lr_prev)
    pad_h, pad_w = h - lr_flow.shape[-3], w - lr_flow.shape[-2]
    if pad_h or pad_w:
        lr_flow = pad2d(lr_flow, (0, pad_w, 0, pad_h), mode="reflect")
    hr_flow = _upsample_flow(lr_flow, h, w, cfg)
    hr_flow_seq = hr_flow.reshape(n, t - 1, h * s, w * s, 2)

    # first frame: zero hr_prev_tran
    hr_first = srnet_apply(
        params["srnet"],
        lr_data[:, 0],
        jnp.zeros((n, h, w, s * s * c), lr_data.dtype),
    )

    def body(hr_prev, inputs):
        lr_i, flow_i = inputs
        hr_warp = backward_warp(hr_prev, flow_i)
        hr_i = srnet_apply(params["srnet"], lr_i, _s2d(hr_warp, s))
        return hr_i, hr_i

    lr_seq = jnp.moveaxis(lr_data[:, 1:], 1, 0)        # (T-1, N, H, W, C)
    flow_seq = jnp.moveaxis(hr_flow_seq, 1, 0)
    _, hr_rest = jax.lax.scan(body, hr_first, (lr_seq, flow_seq))
    hr_data = jnp.concatenate([hr_first[None], hr_rest], axis=0)  # (T, N, ...)
    return {
        "hr_data": jnp.moveaxis(hr_data, 0, 1),
        "hr_flow": hr_flow_seq,
        "lr_prev": lr_prev,
        "lr_curr": lr_curr,
        "lr_flow": lr_flow,
    }


def infer_sequence(params: dict, lr_data: jnp.ndarray, *, cfg: EGVSRConfig = DEFAULT) -> jnp.ndarray:
    """Whole-clip streaming inference under one scan.
    lr_data: (T, N, H, W, C) -> (T, N, sH, sW, C)."""
    t, n, h, w, _ = lr_data.shape
    state = init_recurrent_state(n, h, w, cfg, lr_data.dtype)

    def body(st, lr):
        hr, st = infer_step(params, st, lr, cfg=cfg)
        return st, hr

    _, hr = jax.lax.scan(body, state, lr_data)
    return hr


def infer_chunk(
    params: dict,
    state: tuple,
    lr_chunk: jnp.ndarray,
    *,
    cfg: EGVSRConfig = DEFAULT,
    fast_warp: bool = True,
    cut_threshold: float | None = None,
) -> tuple[jnp.ndarray, tuple]:
    """Streaming inference over a micro-batch with BATCHED flow.

    lr_chunk: (T, N, H, W, C) -> ((T, N, sH, sW, C), new_state).

    Same recurrence as T x infer_step, but FNet (which depends only on
    the lr frames, all co-resident in the micro-batch — no added
    latency) runs ONCE at batch T*N instead of T times at N — the same
    trick the training unroll uses (forward_sequence above).  Only the
    warp + SRNet recurrence scans.  NOTE: measured NEUTRAL on the dev
    v5e at 720p (fnet N=4 18.1 ms/frame vs N=1 16.4 — the fnet is
    HBM-bound there, not MXU-lane-bound), so the live service keeps the
    per-frame step by default.
    cut_threshold keeps the per-frame skip-warp cond (the flow for a cut
    frame is computed-but-unused here; the batched call amortizes it).
    """
    t, n, h, w, c = lr_chunk.shape
    s = cfg.scale
    lr_prev0, hr_prev = state
    prevs = jnp.concatenate([lr_prev0[None], lr_chunk[:-1]], axis=0)

    flow = fnet_apply(
        params["fnet"],
        lr_chunk.reshape(t * n, h, w, c),
        prevs.reshape(t * n, h, w, c),
    )
    pad_h, pad_w = h - flow.shape[-3], w - flow.shape[-2]
    if pad_h or pad_w:
        flow = pad2d(flow, (0, pad_w, 0, pad_h), mode="reflect")
    hr_flow = _upsample_flow(flow, h, w, cfg).reshape(t, n, h * s, w * s, 2)
    warp = backward_warp_fast if fast_warp else backward_warp

    def body(carry, inp):
        lr_i, prev_i, flow_i = inp

        def do_warp():
            return warp(carry, flow_i).astype(lr_i.dtype)

        if cut_threshold is None:
            hr_warp = do_warp()
        else:
            diff = jnp.mean(
                jnp.abs(lr_i.astype(jnp.float32) - prev_i.astype(jnp.float32))
            )
            hr_warp = jax.lax.cond(
                diff > cut_threshold, lambda: carry.astype(lr_i.dtype), do_warp
            )
        hr = srnet_apply(params["srnet"], lr_i, _s2d(hr_warp, s))
        return hr, hr

    hr_last, hrs = jax.lax.scan(body, hr_prev, (lr_chunk, prevs, hr_flow))
    return hrs, (lr_chunk[-1], hr_last)


def config_from_torch(sd: dict[str, np.ndarray]) -> EGVSRConfig:
    """Infer the FRNet shape from a torch state dict, so any checkpoint
    (the reference's production nb=10 EGVSR_iter420000.pth, the class-
    default nb=16, or a locally-minted net) loads without a hand-matched
    config:
    - nb   = count of srnet.resblocks.<i> entries,
    - nf   = conv_in output width, in/out_nc from conv shapes,
    - degradation: the reference's BD mode registers the BicubicUpsample
      'kernels' buffer under upsample_func (net_utils.py:143), so its
      presence in the state dict identifies a BD-trained net; absence
      means BI (bilinear flow upsample)."""
    nb = len({
        int(k.split(".")[2])
        for k in sd
        if k.startswith("srnet.resblocks.") and k.endswith(".conv.0.weight")
    })
    w_in = sd["srnet.conv_in.0.weight"]          # (nf, (s^2+1)*c, 3, 3)
    nf = int(w_in.shape[0])
    w_out = sd["srnet.conv_out.weight"]          # (out_nc, nf/16*?, 3, 3)
    out_nc = int(w_out.shape[0])
    scale = 4
    in_nc = int(w_in.shape[1]) // (scale**2 + 1)
    bd = any("upsample_func.kernels" in k for k in sd)
    return EGVSRConfig(
        in_nc=in_nc, out_nc=out_nc, nf=nf, nb=nb, scale=scale,
        degradation="BD" if bd else "BI",
    )


def from_torch(sd: dict[str, np.ndarray], cfg: EGVSRConfig = DEFAULT) -> dict:
    """Key map per reference FNet/SRNet module layout (egvsr.py:16-130)."""
    fnet = {
        "enc1": [conv_from_torch(sd, "fnet.encoder1.0."), conv_from_torch(sd, "fnet.encoder1.2.")],
        "enc2": [conv_from_torch(sd, "fnet.encoder2.0."), conv_from_torch(sd, "fnet.encoder2.2.")],
        "enc3": [conv_from_torch(sd, "fnet.encoder3.0."), conv_from_torch(sd, "fnet.encoder3.2.")],
        "dec1": [conv_from_torch(sd, "fnet.decoder1.0."), conv_from_torch(sd, "fnet.decoder1.2.")],
        "dec2": [conv_from_torch(sd, "fnet.decoder2.0."), conv_from_torch(sd, "fnet.decoder2.2.")],
        "dec3": [conv_from_torch(sd, "fnet.decoder3.0."), conv_from_torch(sd, "fnet.decoder3.2.")],
        "flow": [conv_from_torch(sd, "fnet.flow.0."), conv_from_torch(sd, "fnet.flow.2.")],
    }
    srnet = {
        "conv_in": conv_from_torch(sd, "srnet.conv_in.0."),
        "blocks": [
            [
                conv_from_torch(sd, f"srnet.resblocks.{i}.conv.0."),
                conv_from_torch(sd, f"srnet.resblocks.{i}.conv.2."),
            ]
            for i in range(cfg.nb)
        ],
        "conv_out": conv_from_torch(sd, "srnet.conv_out."),
    }
    return {"fnet": fnet, "srnet": srnet}


def pad_sequence(
    lr_data: "jnp.ndarray", n_pad_front: int = 0, padding_mode: str = "reflect"
):
    """Temporal padding for streaming inference (reference
    models/base_model.py:91-117): prepend n_pad_front frames so the
    recurrence warms up before the first real frame.

    lr_data: (T, ...) frame-major. Returns (padded, n_pad_front)."""
    if n_pad_front == 0:
        return lr_data, 0
    if padding_mode == "reflect":
        head = jnp.flip(lr_data[1 : 1 + n_pad_front], axis=0)
        return jnp.concatenate([head, lr_data], axis=0), n_pad_front
    if padding_mode == "replicate":
        head = jnp.broadcast_to(
            lr_data[:1], (n_pad_front,) + lr_data.shape[1:]
        )
        return jnp.concatenate([head, lr_data], axis=0), n_pad_front
    if padding_mode == "dual-reflect":
        head = jnp.flip(lr_data[1 : 1 + n_pad_front], axis=0)
        tail = jnp.flip(lr_data[-1 - n_pad_front : -1], axis=0)
        return jnp.concatenate([head, lr_data, tail], axis=0), n_pad_front
    raise ValueError(f"unrecognized padding mode: {padding_mode}")
