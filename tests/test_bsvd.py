"""BSVD scan-reformulation tests.

The reference streams frames through stateful buffered convs with a
None-propagation warm-up/flush protocol (reference model.py:94-138,
526-580).  Our scan formulation must match it bit-for-bit.  To verify, a
clean-room torch simulator of the *protocol semantics* (derived from
SURVEY.md §2 row 15, not from reference code) runs the same weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sharkshark_tpu.models import bsvd

CFG = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3, interm_ch=6)
RNG = np.random.default_rng(3)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def _to_torch_w(p):
    # HWIO -> OIHW
    return t(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))), t(np.asarray(p["b"]))


class SimBufferedConv:
    """Protocol simulator for one temporal-shift buffered conv:
    keeps `center` (prev input, or None) and `left` (fold-slice of the
    input before that); on input None after start, emits one flush output
    then Nones.  Mirrors the observable behavior of the reference's
    BiBufferConv without its implementation."""

    def __init__(self, p):
        self.w, self.b = _to_torch_w(p)
        self.center = None
        self.left = None

    def __call__(self, right):
        if self.center is None:
            if right is not None:
                if self.left is None:
                    fold = right.shape[1] // 8
                    self.left = torch.zeros_like(right[:, :fold])
                self.center = right
            return None
        fold = self.center.shape[1] // 8
        r = right if right is not None else torch.zeros_like(self.center)
        inp = torch.cat([r[:, :fold], self.left, self.center[:, 2 * fold:]], dim=1)
        out = F.conv2d(inp, self.w, self.b, padding=1)
        self.left = self.center[:, fold:2 * fold]
        self.center = right
        return out


class SimDenBlock:
    def __init__(self, p, act):
        self.p = p
        self.act = act
        self.mems = {k: [SimBufferedConv(p[k]["c1"]), SimBufferedConv(p[k]["c2"])]
                     for k in ("down0_mem", "down1_mem", "up2_mem", "up1_mem")}
        self.skip1, self.skip2, self.skip3 = [], [], []

    def _a(self, x):
        return F.relu6(x) if self.act == "relu6" else F.relu(x)

    def _conv(self, x, name, stride=1):
        w, b = _to_torch_w(self.p[name])
        return F.conv2d(x, w, b, stride=stride, padding=1)

    def _mem(self, name, x):
        for conv in self.mems[name]:
            x = conv(x)
            if x is not None:
                x = self._a(x)
        return x

    def __call__(self, x):
        if x is not None:
            self.skip1.insert(0, x[:, :3])
            x0 = self._a(self._conv(self._a(self._conv(x, "inc0")), "inc1"))
            self.skip2.insert(0, x0)
            x1_in = self._a(self._conv(x0, "down0", stride=2))
        else:
            x1_in = None
        x1 = self._mem("down0_mem", x1_in)
        if x1 is not None:
            self.skip3.insert(0, x1)
            x2_in = self._a(self._conv(x1, "down1", stride=2))
        else:
            x2_in = None
        x2 = self._mem("down1_mem", x2_in)
        u2 = self._mem("up2_mem", x2)
        if u2 is not None:
            u2 = F.pixel_shuffle(self._conv(u2, "up2"), 2)
            u1_in = u2 + self.skip3.pop()
        else:
            u1_in = None
        u1 = self._mem("up1_mem", u1_in)
        if u1 is None:
            return None
        u1 = F.pixel_shuffle(self._conv(u1, "up1"), 2)
        y = self._conv(self._a(self._conv(u1 + self.skip2.pop(), "outc0")), "outc1")
        s1 = self.skip1.pop()
        y[:, :3] = s1 - y[:, :3]
        return y


def _sim_stream(params, frames_nchw, cfg):
    """Full streaming run: feed frames then Nones until SHIFT_NUM extra
    outputs are collected; keep outputs [SHIFT_NUM:]."""
    b1 = SimDenBlock(params["temp1"], cfg.act)
    b2 = SimDenBlock(params["temp2"], cfg.act)
    outs = []
    for f in frames_nchw:
        outs.append(b2(b1(t(f))))
    while len(outs) < len(frames_nchw) + bsvd.SHIFT_NUM:
        outs.append(b2(b1(None)))
    kept = outs[bsvd.SHIFT_NUM:]
    assert all(o is not None for o in kept)
    return np.stack([o.numpy() for o in kept])


@pytest.mark.parametrize("T", [1, 3, 20])
def test_denoise_clip_matches_protocol_simulator(T):
    import jax

    params = bsvd.init_params(jax.random.PRNGKey(5), CFG)
    frames = RNG.random((T, 1, 16, 24, 4)).astype(np.float32)
    want = _sim_stream(params, [np.moveaxis(f, -1, 1) for f in frames], CFG)
    got = np.asarray(bsvd.denoise_clip(params, jnp.asarray(frames), cfg=CFG))
    got = np.moveaxis(got[:, 0], -1, 1)[:, None][:, 0]  # (T, C, H, W)
    got = got[:, None]  # (T, 1, C, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_single_frame_equals_clip_of_one():
    import jax

    params = bsvd.init_params(jax.random.PRNGKey(11), CFG)
    x = jnp.asarray(RNG.random((2, 16, 24, 4)).astype(np.float32))
    via_clip = np.asarray(bsvd.denoise_clip(params, x[None], cfg=CFG))[0]
    direct = np.asarray(bsvd.apply_single(params, x, cfg=CFG))
    np.testing.assert_allclose(direct, via_clip, rtol=1e-4, atol=1e-5)


def test_stream_step_latency_and_state_reuse():
    """Feeding frames one step at a time through stream_step must equal the
    one-shot scan (live-service usage: state persists across calls)."""
    import jax

    params = bsvd.init_params(jax.random.PRNGKey(13), CFG)
    frames = jnp.asarray(RNG.random((6, 1, 16, 24, 4)).astype(np.float32))
    ref = np.asarray(bsvd.denoise_clip(params, frames, cfg=CFG))

    state = bsvd.init_stream_state(1, 16, 24, CFG)
    outs = []
    xs = list(frames) + [jnp.zeros_like(frames[0])] * bsvd.SHIFT_NUM
    for x in xs:
        y, state = bsvd.stream_step(params, state, x, cfg=CFG, t_end=6)
        outs.append(np.asarray(y))
    got = np.stack(outs[bsvd.SHIFT_NUM:])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("split", [(24,), (12, 12), (4,) * 6, (1, 3, 4, 8, 2, 6)])
def test_chunk_step_matches_clip(split):
    """Layer-major chunked evaluation chained over arbitrary chunk splits
    (with the SHIFT_NUM zero-frame flush) must equal the per-frame
    pipelined clip evaluation frame-for-frame."""
    T = 8
    params = bsvd.init_params(jnp.asarray(np.array([7, 9], np.uint32)), CFG)
    frames = jnp.asarray(RNG.normal(size=(T, 1, 16, 24, 4)).astype(np.float32))
    ref = np.asarray(bsvd.denoise_clip(params, frames, cfg=CFG))

    padded = jnp.concatenate(
        [frames, jnp.zeros((bsvd.SHIFT_NUM,) + frames.shape[1:], frames.dtype)]
    )
    state = bsvd.init_chunk_state(1, 16, 24, CFG, jnp.float32)
    outs = []
    i = 0
    for n in split:
        y, state = bsvd.chunk_step(params, state, padded[i : i + n], cfg=CFG, t_end=T)
        outs.append(np.asarray(y))
        i += n
    got = np.concatenate(outs, axis=0)[bsvd.SHIFT_NUM :]
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_chunk_step_live_stream_matches_stream_step():
    """Endless-stream mode (t_end=None): chunked outputs equal per-frame
    stream_step outputs at every wall step."""
    T = 24
    params = bsvd.init_params(jnp.asarray(np.array([1, 2], np.uint32)), CFG)
    frames = jnp.asarray(RNG.normal(size=(T, 1, 16, 24, 4)).astype(np.float32))

    st = bsvd.init_stream_state(1, 16, 24, CFG, jnp.float32)
    ref = []
    for f in frames:
        y, st = bsvd.stream_step(params, st, f, cfg=CFG)
        ref.append(np.asarray(y))
    ref = np.stack(ref)

    state = bsvd.init_chunk_state(1, 16, 24, CFG, jnp.float32)
    outs = []
    for i in range(0, T, 4):
        y, state = bsvd.chunk_step(params, state, frames[i : i + 4], cfg=CFG)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=0)
    # the first SHIFT_NUM wall steps are pre-valid garbage in both
    # formulations (and differ: stream_step computes through garbage
    # while chunk_step zeroes the taps); only valid outputs must agree
    np.testing.assert_allclose(
        got[bsvd.SHIFT_NUM :], ref[bsvd.SHIFT_NUM :], atol=2e-5, rtol=1e-4
    )


def test_chunk_step_bf16_production_dtype():
    """The production denoise path runs the chunked BSVD in bf16; the
    carry must stay bf16 (no silent f32 upcast doubling state HBM) and
    outputs must track the f32 path within bf16 tolerance."""
    params = bsvd.init_params(jnp.asarray(np.array([3, 4], np.uint32)), CFG)
    frames = jnp.asarray(RNG.normal(size=(4, 1, 16, 24, 4)).astype(np.float32))

    st32 = bsvd.init_chunk_state(1, 16, 24, CFG, jnp.float32)
    y32, _ = bsvd.chunk_step(params, st32, frames, cfg=CFG)

    stbf = bsvd.init_chunk_state(1, 16, 24, CFG, jnp.bfloat16)
    ybf, stbf2 = bsvd.chunk_step(params, stbf, frames.astype(jnp.bfloat16), cfg=CFG)

    import jax

    for leaf in jax.tree.leaves(stbf2):
        if hasattr(leaf, "dtype") and leaf.dtype != jnp.int32:
            assert leaf.dtype == jnp.bfloat16, leaf.dtype
    diff = np.abs(np.asarray(ybf, np.float32) - np.asarray(y32))
    scale = np.abs(np.asarray(y32)).max() + 1.0
    assert float(diff.max()) / scale < 0.1


def test_chunk_step_warm_matches_cold():
    """warm=True (mask-free steady-state executable) is bit-identical to
    warm=False once state['t'] >= 15 (chunk_step docstring)."""
    import jax

    params = bsvd.init_params(jax.random.PRNGKey(0), CFG)
    T, H, W = 4, 8, 8
    st = bsvd.init_chunk_state(1, H, W, CFG)
    frames = jnp.asarray(
        RNG.standard_normal((5 * T, 1, H, W, CFG.in_ch), dtype=np.float32)
    )
    for i in range(4):  # 16 frames in -> t == 16 >= 15
        _, st = bsvd.chunk_step(params, st, frames[i * T : (i + 1) * T], cfg=CFG)
    cold, st_cold = bsvd.chunk_step(params, st, frames[16:20], cfg=CFG)
    warm, st_warm = bsvd.chunk_step(params, st, frames[16:20], cfg=CFG, warm=True)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(warm))
    # warm steps keep skip1/skip2 in ring order; normalize before comparing
    st_warm = bsvd.ring_to_fifo_state(st_warm, CFG)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_cold), jax.tree_util.tree_leaves(st_warm)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_then_flush_matches_clip():
    """The service's exact stream shape: cold chunks -> warm chunks (ring
    FIFOs) -> ring_to_fifo_state -> cold flush chunks.  The concatenated
    outputs must equal denoise_clip on the whole clip bit-for-bit."""
    import jax

    params = bsvd.init_params(jax.random.PRNGKey(2), CFG)
    T, H, W = 4, 8, 8
    # 24: flush at t % 8 == 0 (normalization is a no-op); 28: flush at
    # t % 8 == 4 (a real ring rotation)
    for t_clip in (24, 28):
        frames = jnp.asarray(
            RNG.standard_normal((t_clip, 1, H, W, CFG.in_ch), dtype=np.float32)
        )
        ref = bsvd.denoise_clip(params, frames, cfg=CFG)

        st = bsvd.init_chunk_state(1, H, W, CFG)
        outs = []
        for i in range(t_clip // T):
            y, st = bsvd.chunk_step(
                params, st, frames[i * T : (i + 1) * T], cfg=CFG, warm=i * T >= 16
            )
            outs.append(y)
        st = bsvd.ring_to_fifo_state(st, CFG)
        zeros = jnp.zeros((T,) + frames.shape[1:], frames.dtype)
        for _ in range(bsvd.SHIFT_NUM // T):
            y, st = bsvd.chunk_step(params, st, zeros, cfg=CFG, t_end=t_clip)
            outs.append(y)
        got = jnp.concatenate(outs, axis=0)[bsvd.SHIFT_NUM :]
        # chunk-vs-scan accumulation order differs at ~3e-6 f32 (same
        # drift as the all-cold chain); warm/ring must not add to it
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=2e-5
        )


def test_chunk_step_warm_lanefold_matches_cold(monkeypatch):
    """The lane-folded warm chunk (SHARKSHARK_LANEFOLD=force) is a
    re-parametrization of the same sums — outputs and state must match
    the cold path within accumulation-order tolerance."""
    import jax

    params = bsvd.init_params(jax.random.PRNGKey(0), CFG)
    T, H, W = 4, 8, 8
    st = bsvd.init_chunk_state(1, H, W, CFG)
    frames = jnp.asarray(
        RNG.standard_normal((5 * T, 1, H, W, CFG.in_ch), dtype=np.float32)
    )
    for i in range(4):
        _, st = bsvd.chunk_step(params, st, frames[i * T : (i + 1) * T], cfg=CFG)
    cold, st_cold = bsvd.chunk_step(params, st, frames[16:20], cfg=CFG)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    warm, st_warm = bsvd.chunk_step(params, st, frames[16:20], cfg=CFG, warm=True)
    np.testing.assert_allclose(
        np.asarray(warm), np.asarray(cold), rtol=0, atol=1e-4
    )
    st_warm = bsvd.ring_to_fifo_state(st_warm, CFG)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_cold), jax.tree_util.tree_leaves(st_warm)
    ):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-4)


def test_chunk_step_warm_lanefold_production_cfg(monkeypatch):
    """Same check at the production channel widths (BSVD_32) on a tiny
    spatial grid — exercises the f=4/f=2 stride and ps2 folded kernels at
    the real channel counts."""
    import jax

    cfg = bsvd.BSVD_32
    params = bsvd.init_params(jax.random.PRNGKey(1), cfg)
    T, H, W = 2, 8, 16
    st = bsvd.init_chunk_state(1, H, W, cfg)
    frames = jnp.asarray(
        RNG.standard_normal((9 * T, 1, H, W, cfg.in_ch), dtype=np.float32)
    ) * 0.3
    for i in range(8):  # 16 frames -> t == 16 >= 15
        _, st = bsvd.chunk_step(params, st, frames[i * T : (i + 1) * T], cfg=cfg)
    cold, _ = bsvd.chunk_step(params, st, frames[16:18], cfg=cfg)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    warm, _ = bsvd.chunk_step(params, st, frames[16:18], cfg=cfg, warm=True)
    np.testing.assert_allclose(np.asarray(warm), np.asarray(cold), rtol=0, atol=1e-4)


def test_lanefold_gate_rejects_wide_stage(monkeypatch):
    """BSVD_64's C=64 full-res stage must NOT fold (f=4 would exceed the
    128-lane MXU width and pay 4x MACs for nothing)."""
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    assert bsvd._lanefold_on((4, 1, 8, 16, 4), 32)
    assert not bsvd._lanefold_on((4, 1, 8, 16, 4), 64)
