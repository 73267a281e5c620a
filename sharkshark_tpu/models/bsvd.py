"""BSVD streaming video denoiser, re-derived for TPU as a scan-carried
delay-line network.

Capability parity with reference src/upscale/model/bsvd/model.py:22-588
(and its fixed-shape TRT rewrite model_volatile.py): two U-Net DenBlocks
whose 3x3 convs inside the down/up stages are *temporal-shift buffered*
convs — each holds the previous frame's features (`center`) and a
1/8-channel slice of the frame before that (`left`), and convolves
[right_fold | left_fold | center_rest].  The reference implements this with
stateful nn.Modules and a None-propagation warm-up/flush protocol driven
from Python (model.py:94-138, 526-580).

TPU reformulation — no Nones, no Python-side state:

* Every buffered conv `i` (16 total = `SHIFT_NUM`) is assigned its pipeline
  depth `d_i` = number of buffered convs upstream.  In the reference's
  None protocol, layer i's first real input arrives at step d_i, its first
  real output at d_i + 1, and the final output stream is valid from step
  SHIFT_NUM on (model.py:566-576).  We run every conv every step and use
  that static schedule to gate *state updates only* (two jnp.where on
  scalar predicates), so warm-up garbage never enters state and the
  outputs match the reference bit-for-bit at every valid step.
* The MemSkip FIFOs (model.py:332-350) become fixed-depth ring buffers
  (skip3: 4 frames, skip1/skip2: 8) — depth = buffered-conv count between
  push and pop, read-before-write at slot `t mod depth`.
* Flushing at end-of-clip (the reference's None feeds) is zero-masking the
  right input once the per-layer input window [d_i, T + d_i) closes.
* The whole clip runs under one `jax.lax.scan`; per-frame state lives in
  HBM between steps, so arbitrarily long streams run at fixed memory —
  the same O(1)-state streaming the reference gets from BiBufferConv.

The production service path (one frame per call, full flush + reset every
call — reference fsrcnn_upscaler.py:277, bsvd streaming_forward with a
1-element sequence) collapses algebraically to a *single* feed-forward
pass in which every shift conv sees zeros in its first 2*fold channels:
`apply_single` below.  One jitted call replaces the reference's 17
Python feedins per frame.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d, conv2d_pairfold, pixel_shuffle, relu6
from .torch_import import conv_from_torch, subdict


class BSVDConfig(NamedTuple):
    chns: tuple[int, int, int] = (32, 64, 128)
    mid_ch: int = 32
    in_ch: int = 4       # RGB + noise map
    out_ch: int = 3
    interm_ch: int = 30
    act: str = "relu6"   # production config uses relu6, norm='none'


BSVD_32 = BSVDConfig()
BSVD_64 = BSVDConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64)

SHIFT_NUM = 16  # buffered convs in temp1+temp2 == reference count_shift()

# ring-buffer depths: buffered convs between push and pop inside a DenBlock
_SKIP3_DEPTH = 4   # downc1 (2) + upc2 (2)
_SKIP12_DEPTH = 8  # downc0..upc1


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu6":
        return relu6(x)
    if kind == "relu":
        return jnp.maximum(x, 0)
    raise ValueError(kind)


# ---------------------------------------------------------------- params


def _conv_init(key, kh, kw, i, o):
    fan_in = i * kh * kw
    w = jax.random.normal(key, (kh, kw, i, o), jnp.float32) * np.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((o,), jnp.float32)}


def _init_denblock(key, in_ch, out_ch, cfg: BSVDConfig) -> dict:
    c0, c1, c2 = cfg.chns
    ks = jax.random.split(key, 12)
    return {
        "inc0": _conv_init(ks[0], 3, 3, in_ch, cfg.interm_ch),
        "inc1": _conv_init(ks[1], 3, 3, cfg.interm_ch, c0),
        "down0": _conv_init(ks[2], 3, 3, c0, c1),
        "down0_mem": {"c1": _conv_init(ks[3], 3, 3, c1, c1), "c2": _conv_init(ks[4], 3, 3, c1, c1)},
        "down1": _conv_init(ks[5], 3, 3, c1, c2),
        "down1_mem": {"c1": _conv_init(ks[6], 3, 3, c2, c2), "c2": _conv_init(ks[7], 3, 3, c2, c2)},
        "up2_mem": {"c1": _conv_init(ks[8], 3, 3, c2, c2), "c2": _conv_init(ks[9], 3, 3, c2, c2)},
        "up2": _conv_init(ks[10], 3, 3, c2, c1 * 4),
        "up1_mem": {"c1": _conv_init(ks[11], 3, 3, c1, c1), "c2": _conv_init(jax.random.fold_in(key, 99), 3, 3, c1, c1)},
        "up1": _conv_init(jax.random.fold_in(key, 100), 3, 3, c1, c0 * 4),
        "outc0": _conv_init(jax.random.fold_in(key, 101), 3, 3, c0, c0),
        "outc1": _conv_init(jax.random.fold_in(key, 102), 3, 3, c0, out_ch),
    }


def init_params(key: jax.Array, cfg: BSVDConfig = BSVD_32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "temp1": _init_denblock(k1, cfg.in_ch, cfg.mid_ch, cfg),
        "temp2": _init_denblock(k2, cfg.mid_ch, cfg.out_ch, cfg),
    }


def _denblock_from_torch(sd: dict, cfg: BSVDConfig) -> dict:
    """Checkpoint layout per reference load functions (model.py:276-306):
    down blocks store [conv, norm, act, memconv] so memconv keys live under
    convblock.3 with `net.` as the conv name; up blocks are
    [memconv, conv] -> convblock.{0,1}."""

    def mem(prefix):
        return {
            "c1": conv_from_torch(sd, prefix + "c1.net."),
            "c2": conv_from_torch(sd, prefix + "c2.net."),
        }

    return {
        "inc0": conv_from_torch(sd, "inc.convblock.0."),
        "inc1": conv_from_torch(sd, "inc.convblock.3."),
        "down0": conv_from_torch(sd, "downc0.convblock.0."),
        "down0_mem": mem("downc0.convblock.3."),
        "down1": conv_from_torch(sd, "downc1.convblock.0."),
        "down1_mem": mem("downc1.convblock.3."),
        "up2_mem": mem("upc2.convblock.0."),
        "up2": conv_from_torch(sd, "upc2.convblock.1."),
        "up1_mem": mem("upc1.convblock.0."),
        "up1": conv_from_torch(sd, "upc1.convblock.1."),
        "outc0": conv_from_torch(sd, "outc.convblock.0."),
        "outc1": conv_from_torch(sd, "outc.convblock.3."),
    }


def from_torch(sd: dict[str, np.ndarray], cfg: BSVDConfig = BSVD_32) -> dict:
    """Split the two-net checkpoint (reference model.py:487-499)."""
    base = "module.base_model." if any(k.startswith("module.") for k in sd) else "base_model."
    return {
        "temp1": _denblock_from_torch(subdict(sd, base + "nets_list.0."), cfg),
        "temp2": _denblock_from_torch(subdict(sd, base + "nets_list.1."), cfg),
    }


# ------------------------------------------------------- single-frame path


def _shift_conv_single(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Shift conv in the collapsed single-frame regime: the temporal
    neighbours are empty, so the first 2*fold input channels are zeros."""
    fold = x.shape[-1] // 8
    zeros = jnp.zeros(x.shape[:-1] + (2 * fold,), x.dtype)
    inp = jnp.concatenate([zeros, x[..., 2 * fold :]], axis=-1)
    return conv2d(inp, **p, padding=1)


def _denblock_single(p: dict, x: jnp.ndarray, act: str) -> jnp.ndarray:
    a = lambda v: _act(v, act)
    skip1 = x[..., :3]
    x0 = a(conv2d(a(conv2d(x, **p["inc0"], padding=1)), **p["inc1"], padding=1))
    # down 0  (reference DownBlock: conv/2 -> act -> memconv)
    x1 = a(conv2d(x0, **p["down0"], stride=2, padding=1))
    x1 = a(_shift_conv_single(p["down0_mem"]["c1"], x1))
    x1 = a(_shift_conv_single(p["down0_mem"]["c2"], x1))
    # down 1
    x2 = a(conv2d(x1, **p["down1"], stride=2, padding=1))
    x2 = a(_shift_conv_single(p["down1_mem"]["c1"], x2))
    x2 = a(_shift_conv_single(p["down1_mem"]["c2"], x2))
    # up 2
    u2 = a(_shift_conv_single(p["up2_mem"]["c1"], x2))
    u2 = a(_shift_conv_single(p["up2_mem"]["c2"], u2))
    u2 = pixel_shuffle(conv2d(u2, **p["up2"], padding=1), 2)
    # up 1
    u1 = u2 + x1
    u1 = a(_shift_conv_single(p["up1_mem"]["c1"], u1))
    u1 = a(_shift_conv_single(p["up1_mem"]["c2"], u1))
    u1 = pixel_shuffle(conv2d(u1, **p["up1"], padding=1), 2)
    # out
    y = conv2d(a(conv2d(u1 + x0, **p["outc0"], padding=1)), **p["outc1"], padding=1)
    return y.at[..., :3].set(skip1 - y[..., :3])


def apply_single(params: dict, x: jnp.ndarray, *, cfg: BSVDConfig = BSVD_32) -> jnp.ndarray:
    """Denoise one frame exactly as the reference production path does
    (fresh state + full flush per call): x (N, H, W, in_ch) -> (N, H, W, out_ch)."""
    mid = _denblock_single(params["temp1"], x, cfg.act)
    return _denblock_single(params["temp2"], mid, cfg.act)


# ----------------------------------------------------------- streaming path


def _bibuffer_step(p, st, x, t, d, t_end, act: str):
    """One buffered conv step.  st = {'left': (..., fold), 'center': x-like}.
    t: global step; d: this conv's pipeline depth; t_end: exclusive end of
    this conv's real-input window (T + d), or None for endless streams."""
    fold = x.shape[-1] // 8
    if t_end is not None:
        x = jnp.where(t < t_end, x, jnp.zeros_like(x))
    inp = jnp.concatenate([x[..., :fold], st["left"], st["center"][..., 2 * fold :]], axis=-1)
    y = _act(conv2d(inp, **p, padding=1), act)
    new_left = jnp.where(t >= d + 1, st["center"][..., fold : 2 * fold], st["left"])
    new_center = jnp.where(t >= d, x, st["center"])
    return y, {"left": new_left, "center": new_center}


def _mem_step(p, st, x, t, d, t_end, act):
    y, s1 = _bibuffer_step(p["c1"], st["c1"], x, t, d, None if t_end is None else t_end, act)
    y, s2 = _bibuffer_step(p["c2"], st["c2"], y, t, d + 1, None if t_end is None else t_end + 1, act)
    return y, {"c1": s1, "c2": s2}


def _ring_pop_push(buf, val, t):
    depth = buf.shape[0]
    slot = jnp.mod(t, depth)
    popped = jax.lax.dynamic_index_in_dim(buf, slot, axis=0, keepdims=False)
    return popped, jax.lax.dynamic_update_index_in_dim(buf, val, slot, axis=0)


def _conv_fullres_step(p, x):
    """Full-resolution narrow conv (inc*/outc*, C<=32) for the per-frame
    streaming path.  Routes through the f=4 lane-folded lowering
    (ops/lanefold.py) when enabled — the per-frame path's convs are the
    same C<=32 720p convs the warm chunk folds, just at T=1; the folded
    kernel is exact (ROADMAP 'not yet routed' straggler, round 4)."""
    from ..ops.lanefold import conv3x3_folded, fold_lanes, lanefold_enabled, unfold_lanes

    w = x.shape[-2]
    wt = p["w"]
    if (
        wt.shape[:2] == (3, 3)
        and wt.shape[2] <= 32
        and wt.shape[3] <= 32
        and lanefold_enabled(w, 4)
    ):
        return unfold_lanes(conv3x3_folded(fold_lanes(x, 4), wt, p.get("b"), 4), 4)
    return conv2d(x, **p, padding=1)


def _denblock_step(p, st, x, t, d0, t_end0, act):
    """One streaming step of a DenBlock. d0: depth of the block's first
    buffered conv; t_end0: input-window end for that conv (or None)."""
    a = lambda v: _act(v, act)

    def te(offset):
        return None if t_end0 is None else t_end0 + offset

    skip1, st_skip1 = _ring_pop_push(st["skip1"], x[..., :3], t)
    x0 = a(_conv_fullres_step(p["inc1"], a(_conv_fullres_step(p["inc0"], x))))
    skip2, st_skip2 = _ring_pop_push(st["skip2"], x0, t)

    x1 = a(conv2d(x0, **p["down0"], stride=2, padding=1))
    x1, st_d0 = _mem_step(p["down0_mem"], st["down0"], x1, t, d0, te(0), act)
    skip3, st_skip3 = _ring_pop_push(st["skip3"], x1, t)

    x2 = a(conv2d(x1, **p["down1"], stride=2, padding=1))
    x2, st_d1 = _mem_step(p["down1_mem"], st["down1"], x2, t, d0 + 2, te(2), act)

    u2, st_u2 = _mem_step(p["up2_mem"], st["up2"], x2, t, d0 + 4, te(4), act)
    u2 = pixel_shuffle(conv2d(u2, **p["up2"], padding=1), 2)

    u1, st_u1 = _mem_step(p["up1_mem"], st["up1"], u2 + skip3, t, d0 + 6, te(6), act)
    u1 = pixel_shuffle(conv2d(u1, **p["up1"], padding=1), 2)

    y = _conv_fullres_step(p["outc1"], a(_conv_fullres_step(p["outc0"], u1 + skip2)))
    y = _residual3(y, skip1)
    new_st = {
        "skip1": st_skip1, "skip2": st_skip2, "skip3": st_skip3,
        "down0": st_d0, "down1": st_d1, "up2": st_u2, "up1": st_u1,
    }
    return y, new_st


def _zeros_mem(n, h, w, c, dtype):
    fold = c // 8
    return {
        "c1": {"left": jnp.zeros((n, h, w, fold), dtype), "center": jnp.zeros((n, h, w, c), dtype)},
        "c2": {"left": jnp.zeros((n, h, w, fold), dtype), "center": jnp.zeros((n, h, w, c), dtype)},
    }


def _init_denblock_state(n, h, w, cfg: BSVDConfig, dtype) -> dict:
    c0, c1, c2 = cfg.chns
    h2, w2, h4, w4 = h // 2, w // 2, h // 4, w // 4
    return {
        "skip1": jnp.zeros((_SKIP12_DEPTH, n, h, w, 3), dtype),
        "skip2": jnp.zeros((_SKIP12_DEPTH, n, h, w, c0), dtype),
        "skip3": jnp.zeros((_SKIP3_DEPTH, n, h2, w2, c1), dtype),
        "down0": _zeros_mem(n, h2, w2, c1, dtype),
        "down1": _zeros_mem(n, h4, w4, c2, dtype),
        "up2": _zeros_mem(n, h4, w4, c2, dtype),
        "up1": _zeros_mem(n, h2, w2, c1, dtype),
    }


def init_stream_state(
    n: int, h: int, w: int, cfg: BSVDConfig = BSVD_32, dtype=jnp.float32
) -> dict[str, Any]:
    """Fresh streaming state (all buffers zero, t=0).  H and W must be
    multiples of 4 (two stride-2 stages)."""
    return {
        "t": jnp.zeros((), jnp.int32),
        "temp1": _init_denblock_state(n, h, w, cfg, dtype),
        "temp2": _init_denblock_state(n, h, w, cfg, dtype),
    }


def stream_step(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    *,
    cfg: BSVDConfig = BSVD_32,
    t_end: int | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Feed one frame (N, H, W, in_ch); returns (y, new_state).  y is the
    denoised frame from SHIFT_NUM steps ago — valid once state['t'] >=
    SHIFT_NUM.  For endless live streams leave t_end=None; to flush a
    T-frame clip, keep stepping with zero frames and t_end=T."""
    t = state["t"]
    mid, st1 = _denblock_step(params["temp1"], state["temp1"], x, t, 0, t_end, cfg.act)
    y, st2 = _denblock_step(params["temp2"], state["temp2"], mid, t, 8, None if t_end is None else t_end + 8, cfg.act)
    return y, {"t": t + 1, "temp1": st1, "temp2": st2}


# ------------------------------------------------------------ chunked path
#
# BSVD's BiBufferConv is a *bidirectional* temporal-shift conv: the
# output aligned to frame g reads [x_{g+1}[:fold] | x_{g-1}[fold:2fold]
# | x_g[2fold:]] of its own layer's input features — one frame of
# lookahead per conv, which is where the SHIFT_NUM(16)-frame stream
# latency comes from (it is inherent lookahead, not a pipelining
# artifact).  The reference evaluates this one frame per wall step, one
# frame in flight per conv (model.py:526-580), because TRT engines are
# single-frame.  On TPU the natural evaluation is LAYER-MAJOR over a
# chunk of T consecutive frames: every conv runs ONCE per chunk,
# batched (T*N) on the MXU; the temporal taps become slices along the
# chunk axis seeded by the same 2-frame carry the streaming path keeps;
# the MemSkip rings become FIFO carries consumed with plain concat+
# slice; warm-up/flush become a per-conv window mask on the chunk axis
# (global frame index in [0, t_end)), reproducing stream_step's gating.
# Outputs are identical to the per-frame pipeline — chaining chunk_step
# over any split of a clip equals denoise_clip on the whole clip — but
# state traffic is paid once per chunk instead of once per frame and
# every conv sees a T-fold larger batch.


def _window_mask(x: jnp.ndarray, first_idx, t_end) -> jnp.ndarray:
    """Zero chunk positions whose global frame index falls outside
    [0, t_end): below 0 = warm-up garbage must not reach taps/carries
    (stream_step gates state updates for the same reason); >= t_end =
    the reference's flush protocol feeds zeros at EVERY level."""
    t = x.shape[0]
    idx = first_idx + jnp.arange(t, dtype=jnp.int32)
    ok = idx >= 0
    if t_end is not None:
        ok = ok & (idx < t_end)
    return jnp.where(ok[(...,) + (None,) * (x.ndim - 1)], x, jnp.zeros_like(x))


def _shift_conv_chunk(p: dict, st: dict, x: jnp.ndarray, act: str):
    """Bidirectional temporal-shift conv over a chunk.

    x: (T, N, H, W, C) = this conv's inputs for frames [a, a+T);
    st = {'left': (N,H,W,fold) == x_{a-2}[fold:2fold],
          'center': (N,H,W,C) == x_{a-1}} — the same carry layout as the
    streaming path.  Output j is aligned to frame a-1+j (one-frame
    lookahead): fut tap = x[j], center tap = x[j-1], left = x[j-2]."""
    t = x.shape[0]
    fold = x.shape[-1] // 8
    fut = x[..., :fold]
    hist = jnp.stack([st["left"], st["center"][..., fold : 2 * fold]])
    left = jnp.concatenate([hist, x[: max(t - 2, 0), ..., fold : 2 * fold]], axis=0)[:t]
    rest = jnp.concatenate(
        [st["center"][None, ..., 2 * fold :], x[: t - 1, ..., 2 * fold :]], axis=0
    )
    inp = jnp.concatenate([fut, left, rest], axis=-1)
    tn, n, h, w, c = inp.shape
    xb = inp.reshape(tn * n, h, w, c)
    from ..ops.lanefold import conv3x3_folded, fold_lanes, lanefold_enabled, unfold_lanes

    if c <= 64 and lanefold_enabled(w, 2):
        # W-pair folded conv on the materialized shift input.  This is
        # the FALLBACK formulation (cold/warm-up chunks, T=1 tails,
        # SHARKSHARK_TSM=0, kernel-unsupported shapes) — the warm path
        # routes C=64/128 to the fused Pallas tsm kernel first, which
        # still beats construct+folded-conv (16.0 vs 18.9 ms/frame at
        # T=8, BASELINE.md round 3)
        y = unfold_lanes(conv3x3_folded(fold_lanes(xb, 2), p["w"], p.get("b"), 2), 2)
    else:
        y = conv2d(xb, **p, padding=1)
    y = _act(y, act).reshape(tn, n, h, w, -1)
    new_center = x[-1]
    new_left = x[-2, ..., fold : 2 * fold] if t >= 2 else st["center"][..., fold : 2 * fold]
    return y, {"left": new_left, "center": new_center}


def _tsm_channels() -> tuple[int, ...]:
    """Channel widths routed to the fused Pallas temporal-shift conv on
    the warm path.  Default: both C=64 and C=128 — measured IN-GRAPH at
    720p/T=4 the fused kernel beats XLA conv + shift-input construction
    at both widths (41.3 -> 36.5 ms/frame warm chunk; r2's isolated-conv
    comparison had C=128 losing only because it ignored the construction
    the XLA path pays).  Override via SHARKSHARK_TSM ('0' disables,
    '64' = C=64 only)."""
    import os

    v = os.environ.get("SHARKSHARK_TSM", "64,128")
    if v in ("0", ""):
        return ()
    return tuple(int(c) for c in v.split(",") if c.strip())


def _shift_conv_chunk_fused(p: dict, st: dict, x: jnp.ndarray, act: str):
    """Pallas fused equivalent of _shift_conv_chunk (warm regime): the
    temporal channel mix is assembled in VMEM on the way into the MXU
    instead of materialized in HBM (ops/pallas/tsm_conv.py)."""
    from ..ops.pallas.tsm_conv import tsm_conv

    t = x.shape[0]
    fold = x.shape[-1] // 8
    b = p.get("b")
    if b is None:
        b = jnp.zeros((p["w"].shape[-1],), x.dtype)
    y = tsm_conv(x[:, 0], st["center"][0], st["left"][0], p["w"], b, act=act)
    new_center = x[-1]
    new_left = (
        x[-2, ..., fold : 2 * fold] if t >= 2 else st["center"][..., fold : 2 * fold]
    )
    return y[:, None], {"left": new_left, "center": new_center}


def _pair_chunk_fused(p, st, x, act):
    """Both mem convs in ONE Pallas call: the intermediate y1 lives in a
    VMEM ring across the chunk's t loop and never touches HBM."""
    from ..ops.pallas.tsm_conv import tsm_conv_pair

    t = x.shape[0]
    fold = x.shape[-1] // 8
    y2, y1_last2 = tsm_conv_pair(
        x[:, 0],
        st["c1"]["center"][0], st["c1"]["left"][0],
        st["c2"]["center"][0], st["c2"]["left"][0],
        p["c1"]["w"],
        p["c1"].get("b", jnp.zeros((p["c1"]["w"].shape[-1],), x.dtype)),
        p["c2"]["w"],
        p["c2"].get("b", jnp.zeros((p["c2"]["w"].shape[-1],), x.dtype)),
        act=act,
    )
    new_c1 = {
        "center": x[-1],
        "left": x[-2, ..., fold : 2 * fold]
        if t >= 2
        else st["c1"]["center"][..., fold : 2 * fold],
    }
    new_c2 = {
        "center": y1_last2[1][None],
        "left": y1_last2[0][None, ..., fold : 2 * fold],
    }
    return y2[:, None], {"c1": new_c1, "c2": new_c2}


def _mem_chunk(p, st, x, act, first_idx, t_end, warm=False):
    import os

    from ..ops.pallas.tsm_conv import tsm_conv_pair_supported, tsm_conv_supported

    if (
        warm
        and jax.default_backend() == "tpu"
        and x.shape[-1] in _tsm_channels()
    ):
        # pair fusion measured SLOWER at production shapes (37.8 vs 36.4
        # ms/frame warm chunk at 720p/T=4, outputs bit-identical): its
        # doubled VMEM footprint forces tile_h 6 vs 15, and the extra
        # grid steps cost more than the saved y1 HBM round-trip.
        # Kept behind the env gate for future tuning (BASELINE.md r3).
        if (
            os.environ.get("SHARKSHARK_TSM_PAIR", "0") == "1"
            and tsm_conv_pair_supported(x.shape, x.dtype)
            and x.shape[0] >= 2
        ):
            return _pair_chunk_fused(p, st, x, act)
        if tsm_conv_supported(x.shape, x.dtype):
            y, s1 = _shift_conv_chunk_fused(p["c1"], st["c1"], x, act)
            y, s2 = _shift_conv_chunk_fused(p["c2"], st["c2"], y, act)
            return y, {"c1": s1, "c2": s2}
    if not warm:
        x = _window_mask(x, first_idx, t_end)
    y, s1 = _shift_conv_chunk(p["c1"], st["c1"], x, act)
    if not warm:
        y = _window_mask(y, first_idx - 1, t_end)
    y, s2 = _shift_conv_chunk(p["c2"], st["c2"], y, act)
    return y, {"c1": s1, "c2": s2}


def _lanefold_on(x_shape, c0: int) -> bool:
    """Route the warm chunk's full-res stage through the lane-folded
    convs (ops/lanefold.py; SHARKSHARK_LANEFOLD gate).  Only pays when
    f=4 folding lands AT the 128-lane MXU width, i.e. the stage width
    c0 (cfg.chns[0]) <= 32 — BSVD_64's C=64 stage would fold to 256+
    lanes and pay 4x MACs for nothing.  Measured on the dev v5e the
    folded C=32 stage runs ~2x faster (chained conv 8.5 -> 4.3 ms at
    720p/N=4, BASELINE.md round 3)."""
    from ..ops.lanefold import lanefold_enabled

    t, n, h, w, c = x_shape
    return c0 <= 32 and h % 4 == 0 and lanefold_enabled(w, 4)


def _fold_batched(fn, p, x, act, f):
    """Apply a lanefold conv over the (T, N) leading dims of a folded
    tensor x: (T, N, H, Wp, lanes).  Stride-1 convs optionally ride the
    H-split batch trick (SHARKSHARK_HSPLIT row bands; XLA's conv
    lowering underutilizes at small batch on v5e)."""
    import os

    from ..ops.lanefold import conv3x3_folded, conv3x3_folded_hsplit

    t, n = x.shape[:2]
    xb = x.reshape(t * n, *x.shape[2:])
    parts = int(os.environ.get("SHARKSHARK_HSPLIT", "0"))
    if fn is conv3x3_folded and parts > 1 and x.shape[2] % parts == 0:
        y = conv3x3_folded_hsplit(xb, p["w"], p.get("b"), f, parts=parts)
    else:
        y = fn(xb, p["w"], p.get("b"), f)
    if act is not None:
        y = _act(y, act)
    return y.reshape(t, n, *y.shape[1:])


def _conv_batched(p, x, act=None, stride=1):
    t, n, h, w, c = x.shape
    xb = x.reshape(t * n, h, w, c)
    wt = p["w"]
    # narrow full-res convs (inc1/outc0, C<=32) run W-pair-folded: exact,
    # 2x MACs at 2x the MXU channel width — measured ~1.4x faster at 720p
    # on v5e (BASELINE.md round 2; ops.conv2d_pairfold)
    if (
        stride == 1
        and wt.shape[:2] == (3, 3)
        and 8 < wt.shape[2] <= 32
        and wt.shape[3] <= 32
        and w % 2 == 0
    ):
        y = conv2d_pairfold(xb, wt, p.get("b"))
    else:
        y = conv2d(xb, **p, stride=stride, padding=1)
    if act is not None:
        y = _act(y, act)
    return y.reshape(t, n, *y.shape[1:])


def _ps_batched(x: jnp.ndarray, r: int) -> jnp.ndarray:
    t, n, h, w, c = x.shape
    y = pixel_shuffle(x.reshape(t * n, h, w, c), r)
    return y.reshape(t, n, *y.shape[1:])


def _fifo(carry: jnp.ndarray, chunk: jnp.ndarray, base=None):
    """Skip FIFO: carry holds the D frames before the chunk.  Returns the
    chunk-length window aligned D frames back, and the new carry.

    base (traced global index of chunk[0]) switches to a RING layout:
    frame f lives at slot f % D, pop/push are T-frame dynamic slices at
    offset base % D — the push writes T frames instead of rebuilding all
    D (measured 3.42 -> 2.85 ms/frame on the skip2 shape, round-5 probe).
    Only valid when T divides D and base % D is T-aligned; chunk_step
    passes base only on warm steps, where the service's warm-switch
    contract (first warm chunk at t = ceil(16/T)*T with T | 8, so t % 8
    == 0, uniform T thereafter) guarantees both — and makes the cold
    FIFO layout coincide with the ring layout at the handoff."""
    d = carry.shape[0]
    t = chunk.shape[0]
    if base is not None and d % t == 0:
        off = jnp.mod(base, d)
        pop = jax.lax.dynamic_slice_in_dim(carry, off, t, 0)
        return pop, jax.lax.dynamic_update_slice_in_dim(carry, chunk, off, 0)
    full = jnp.concatenate([carry, chunk], axis=0)
    return full[:t], full[t : t + d]


def _residual3(y: jnp.ndarray, skip1: jnp.ndarray) -> jnp.ndarray:
    """out[..., :3] = skip1 - y[..., :3], rest passthrough (the DenBlock
    residual, reference model.py:421-424).  One fused elementwise pass —
    the .at[..., :3].set DUS form costs an extra full-tensor copy on TPU
    (round-5 probe: 2.66 vs 2.31 ms/frame on the temp1 output shape)."""
    if y.shape[-1] == 3:
        return skip1 - y
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
    pad = [(0, 0)] * (y.ndim - 1) + [(0, y.shape[-1] - 3)]
    sp = jnp.pad(skip1, pad)
    return jnp.where(lane < 3, sp - y, y)


def ring_to_fifo_state(state: dict, cfg: BSVDConfig = BSVD_32) -> dict:
    """Convert a state whose skip1/skip2 buffers are in RING order (left
    by warm chunk_step calls — frame f at slot f % D) back to the FIFO
    order the cold/flush executables expect (slot i = frame t - D + i).
    No-op when t % D == 0 (e.g. a stream that never went warm and was
    fed in T | 8 chunks).  Call once before EOF flushing a stream that
    ran warm chunks."""

    def fix(block):
        d = block["skip1"].shape[0]
        r = jnp.mod(state["t"], d)

        def roll(buf):
            return jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([buf, buf], axis=0), r, d, 0
            )

        return {**block, "skip1": roll(block["skip1"]), "skip2": roll(block["skip2"])}

    return {**state, "temp1": fix(state["temp1"]), "temp2": fix(state["temp2"])}


def _denblock_chunk(p, st, x, act, base, t_end, warm=False):
    """One DenBlock over a chunk.  x: (T, N, H, W, in_ch) for frames
    [base, base+T); returns output frames [base-8, base+T-8)."""
    if _lanefold_on(x.shape, p["inc1"]["w"].shape[-1]):
        # ONE lowering per stage for warm AND cold chunks (VERDICT r4
        # item 7): the cold path previously pairfolded f=2, so under
        # SHARKSHARK_LANEFOLD=force warm-vs-cold bit-identity failed at
        # the accumulation-order level.  The folded path applies the
        # same warm-up/flush window masks (inside _mem_chunk) when cold.
        return _denblock_chunk_folded(p, st, x, act, base, t_end, warm)
    rb = base if warm else None  # ring FIFOs valid on warm steps only
    skip1, st_s1 = _fifo(st["skip1"], x[..., :3], rb)
    x0 = _conv_batched(p["inc1"], _conv_batched(p["inc0"], x, act), act)
    skip2, st_s2 = _fifo(st["skip2"], x0, rb)
    x1 = _conv_batched(p["down0"], x0, act, stride=2)
    x1, st_d0 = _mem_chunk(p["down0_mem"], st["down0"], x1, act, base, t_end, warm)
    skip3, st_s3 = _fifo(st["skip3"], x1)  # x1 frames [base-2, ...)
    x2 = _conv_batched(p["down1"], x1, act, stride=2)
    x2, st_d1 = _mem_chunk(p["down1_mem"], st["down1"], x2, act, base - 2, t_end, warm)
    u2, st_u2 = _mem_chunk(p["up2_mem"], st["up2"], x2, act, base - 4, t_end, warm)
    u2 = _ps_batched(_conv_batched(p["up2"], u2), 2)
    u1, st_u1 = _mem_chunk(p["up1_mem"], st["up1"], u2 + skip3, act, base - 6, t_end, warm)
    u1 = _ps_batched(_conv_batched(p["up1"], u1), 2)
    y = _conv_batched(p["outc1"], _conv_batched(p["outc0"], u1 + skip2, act))
    y = _residual3(y, skip1)
    new_st = {
        "skip1": st_s1, "skip2": st_s2, "skip3": st_s3,
        "down0": st_d0, "down1": st_d1, "up2": st_u2, "up1": st_u1,
    }
    return y, new_st


def _denblock_chunk_folded(p, st, x, act, base, t_end, warm=False):
    """Warm-path DenBlock with the full-resolution C<=32 stage in
    lane-folded layout (ops/lanefold.py): the inc/outc/down/up convs run
    as dense 128-lane convs over W/4 super-pixels instead of 32-lane
    convs the MXU runs at ~1/4 rate.  The mem (temporal-shift) convs and
    every state tensor keep their canonical layout — fold/unfold are
    row-major reshapes XLA elides — so state interoperates with the
    unfolded executables.  Numerically a re-parametrization of the same
    sums (f32 parity ~1e-6; accumulation order differs)."""
    from ..ops import lanefold as lf

    rb = base if warm else None  # ring FIFOs valid on warm steps only
    skip1, st_s1 = _fifo(st["skip1"], x[..., :3], rb)
    xf = lf.fold_lanes(x, 4)
    x0f = _fold_batched(
        lf.conv3x3_folded, p["inc1"],
        _fold_batched(lf.conv3x3_folded, p["inc0"], xf, act, 4), act, 4,
    )
    skip2, st_s2 = _fifo(st["skip2"], lf.unfold_lanes(x0f, 4), rb)
    x1f = _fold_batched(lf.conv_stride2_folded, p["down0"], x0f, act, 4)
    x1 = lf.unfold_lanes(x1f, 2)
    x1, st_d0 = _mem_chunk(p["down0_mem"], st["down0"], x1, act, base, t_end, warm)
    skip3, st_s3 = _fifo(st["skip3"], x1)  # x1 frames [base-2, ...)
    x2 = _fold_batched(
        lf.conv_stride2_folded, p["down1"], lf.fold_lanes(x1, 2), act, 2
    )  # f_out = 1: quarter-res C=128, already canonical
    x2, st_d1 = _mem_chunk(p["down1_mem"], st["down1"], x2, act, base - 2, t_end, warm)
    u2, st_u2 = _mem_chunk(p["up2_mem"], st["up2"], x2, act, base - 4, t_end, warm)
    u2 = lf.unfold_lanes(_fold_batched(lf.conv_ps2_folded, p["up2"], u2, None, 1), 2)
    u1, st_u1 = _mem_chunk(p["up1_mem"], st["up1"], u2 + skip3, act, base - 6, t_end, warm)
    u1f = _fold_batched(lf.conv_ps2_folded, p["up1"], lf.fold_lanes(u1, 2), None, 2)
    yf = _fold_batched(
        lf.conv3x3_folded, p["outc1"],
        _fold_batched(
            lf.conv3x3_folded, p["outc0"], u1f + lf.fold_lanes(skip2, 4), act, 4
        ),
        None, 4,
    )
    y = lf.unfold_lanes(yf, 4)
    y = _residual3(y, skip1)
    new_st = {
        "skip1": st_s1, "skip2": st_s2, "skip3": st_s3,
        "down0": st_d0, "down1": st_d1, "up2": st_u2, "up1": st_u1,
    }
    return y, new_st


def init_chunk_state(
    n: int, h: int, w: int, cfg: BSVDConfig = BSVD_32, dtype=jnp.float32
) -> dict:
    """Fresh carry for the chunked path.  Same pytree layout (and zero
    init) as the streaming state, but the skip buffers evolve as FIFOs
    rather than rotating rings — a state must not be moved between
    stream_step and chunk_step mid-stream."""
    return init_stream_state(n, h, w, cfg, dtype)


def chunk_step(
    params: dict,
    state: dict,
    frames: jnp.ndarray,
    *,
    cfg: BSVDConfig = BSVD_32,
    t_end: int | None = None,
    warm: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Denoise a chunk of T consecutive frames in one layer-major pass.

    frames: (T, N, H, W, in_ch) -> ((T, N, H, W, out_ch), new_state).
    Output j of the chunk is the denoised result for input frame
    state['t'] + j - SHIFT_NUM (the network has 16 frames of inherent
    lookahead; the first SHIFT_NUM outputs of a fresh stream are
    pre-valid garbage, exactly as in stream_step).  For a T_clip-frame
    clip, feed the frames in chunks followed by SHIFT_NUM zero frames
    with t_end=T_clip and keep outputs [SHIFT_NUM:) — this equals
    denoise_clip for any chunk split.  For endless live streams leave
    t_end=None.

    warm=True (static) compiles the steady-state live executable: all
    the warm-up window masks are skipped.  Valid only when t_end is None
    and every frame index the masks would test is already >= 0 — the
    deepest mask offset is base-15 (temp2 up1_mem, second conv), so the
    caller may switch to the warm executable once state['t'] >= 15
    (i.e. from the SHIFT_NUM-th frame on).  Output and state are
    bit-identical to warm=False in that regime; ~10 full-tensor
    elementwise passes per DenBlock disappear from the HBM-bound graph.

    Warm steps additionally run the skip1/skip2 FIFOs as RING buffers
    (T-frame in-place writes instead of rebuilding all 8 frames) when T
    divides 8.  Ring alignment requires the first warm call at
    state['t'] % 8 == 0 with the same T on every later call — satisfied
    by the service contract (switch at 16 frames seen, uniform micro-
    batch T | 8).  The resulting state is in ring order: pass it through
    ring_to_fifo_state before handing it to a cold/flush executable
    (upscale/service.py proc_eof does).
    """
    if warm and t_end is not None:
        raise ValueError("warm chunk_step is live-stream only (t_end=None)")
    n0 = state["t"]
    mid, st1 = _denblock_chunk(
        params["temp1"], state["temp1"], frames, cfg.act, n0, t_end, warm
    )
    y, st2 = _denblock_chunk(
        params["temp2"], state["temp2"], mid, cfg.act, n0 - 8, t_end, warm
    )
    return y, {"t": n0 + frames.shape[0], "temp1": st1, "temp2": st2}


def denoise_clip(params: dict, frames: jnp.ndarray, *, cfg: BSVDConfig = BSVD_32) -> jnp.ndarray:
    """Denoise a whole clip under one lax.scan, bit-matching the reference's
    streaming_forward over the same sequence (model.py:526-580).

    frames: (T, N, H, W, in_ch) -> (T, N, H, W, out_ch).
    Runs T + SHIFT_NUM steps (flush included); keeps outputs [SHIFT_NUM:).
    """
    t_total, n, h, w, _ = frames.shape
    state = init_stream_state(n, h, w, cfg, frames.dtype)
    pad = jnp.zeros((SHIFT_NUM,) + frames.shape[1:], frames.dtype)
    xs = jnp.concatenate([frames, pad], axis=0)

    def body(st, x):
        y, st = stream_step(params, st, x, cfg=cfg, t_end=t_total)
        return st, y

    _, ys = jax.lax.scan(body, state, xs)
    return ys[SHIFT_NUM:]
