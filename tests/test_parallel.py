"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh
(conftest.py): DP+spatial sharded upscale matches single-device output,
and the sharded train step runs."""

import jax
import jax.numpy as jnp
import numpy as np

from sharkshark_tpu.models import srvgg
from sharkshark_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    make_sharded_upscale,
    pad_batch,
)
from sharkshark_tpu.upscale import UpscaleSpec, upscale_multi

TINY = srvgg.SRVGGConfig(num_feat=16, num_conv=2)
SPEC = UpscaleSpec(lr_shape=(32, 64), output_shape=(64, 128), compute_dtype=jnp.float32)


def _apply(p, x):
    return srvgg.apply(p, x, cfg=TINY)


def test_mesh_shapes():
    mesh = make_mesh(8, spatial=2)
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}
    assert pad_batch(5, mesh) == 8
    assert pad_batch(4, mesh) == 4


def test_sharded_upscale_matches_single_device():
    params = srvgg.init_params(jax.random.PRNGKey(0), TINY)
    frames = jax.random.randint(
        jax.random.PRNGKey(1), (4, 32, 64, 3), 0, 256, jnp.uint8
    )

    ref = upscale_multi(_apply, params, frames, SPEC)

    mesh = make_mesh(8, spatial=2)
    fn = make_sharded_upscale(_apply, SPEC, mesh)
    with mesh:
        sharded_frames = jax.device_put(frames, batch_sharding(mesh))
        out = fn(params, sharded_frames)
    # bit-exact not guaranteed (collective reduction order in the color
    # match stats), but must be within a quantization step
    diff = np.abs(
        np.asarray(out, np.int16) - np.asarray(ref, np.int16)
    )
    assert diff.max() <= 1


def test_sharded_train_step_runs():
    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.train import VSRTrainConfig, create_train_state, make_train_step

    cfg = VSRTrainConfig(model_cfg=egvsr.EGVSRConfig(nf=16, nb=1))
    mesh = make_mesh(8, spatial=2)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_sharded_train_step(make_train_step(cfg), mesh)

    lr_data = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 8, 16, 3))
    gt_data = jax.random.uniform(jax.random.PRNGKey(2), (4, 3, 32, 64, 3))
    with mesh:
        state, logs = step(state, lr_data, gt_data)
    assert int(state.step) == 1
    assert np.isfinite(float(logs["l_total"]))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 720, 1280, 3) and out.dtype == jnp.uint8
    ge.dryrun_multichip(8)


def test_single_frame_spatial_sharding_matches():
    """Single-frame latency scaling: one frame sharded across all 8
    devices on W; XLA inserts the conv halo exchanges (SURVEY §7.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = srvgg.init_params(jax.random.PRNGKey(0), TINY)
    frame = jax.random.randint(jax.random.PRNGKey(1), (1, 32, 64, 3), 0, 256, jnp.uint8)
    ref = upscale_multi(_apply, params, frame, SPEC)

    mesh = make_mesh(8, spatial=8)
    sh = NamedSharding(mesh, P(None, None, ("data", "spatial"), None))
    fn = jax.jit(
        lambda p, f: upscale_multi(_apply, p, f, SPEC),
        in_shardings=(NamedSharding(mesh, P()), sh),
        out_shardings=sh,
    )
    with mesh:
        out = fn(params, jax.device_put(frame, sh))
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1


def test_tile_upscale_sharded_over_batch():
    """Tile mode: the tile batch rides the data axis (spatial scaling of a
    single huge frame by tiling, SURVEY §2.2)."""
    from sharkshark_tpu.upscale import tile_upscale

    params = srvgg.init_params(jax.random.PRNGKey(0), TINY)
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 96, 3))
    ref = tile_upscale(_apply, params, img, scale=4, tile=24, tile_pad=4)

    mesh = make_mesh(8, spatial=1)
    with mesh:
        out = jax.jit(
            lambda p, x: tile_upscale(_apply, p, x, scale=4, tile=24, tile_pad=4)
        )(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_denoise_matches_single_device():
    """Width-sharded denoise step (VERDICT r1 item 7): BSVD chunk + SR +
    post split on W over all 8 devices, vs the unsharded step."""
    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.parallel import make_sharded_denoise
    from sharkshark_tpu.upscale import init_denoise_state, upscale_batch_denoise

    bcfg = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3, interm_ch=6)
    spec = UpscaleSpec(lr_shape=(32, 64), output_shape=(64, 128),
                       compute_dtype=jnp.float32)
    params = {
        "sr": srvgg.init_params(jax.random.PRNGKey(0), TINY),
        "denoise": bsvd.init_params(jax.random.PRNGKey(1), bcfg),
    }
    frames = jax.random.randint(
        jax.random.PRNGKey(2), (4, 32, 64, 3), 0, 256, jnp.uint8
    )

    state0 = init_denoise_state(1, spec, bcfg)
    ref, ref_state = upscale_batch_denoise(
        lambda p, x: srvgg.apply(p, x, cfg=TINY), params, state0, frames, spec, bcfg
    )

    mesh = make_mesh(8, spatial=2)
    fn = make_sharded_denoise(
        lambda p, x: srvgg.apply(p, x, cfg=TINY), spec, mesh, bcfg
    )
    with mesh:
        out, new_state = fn(params, init_denoise_state(1, spec, bcfg), frames)
        out2, _ = fn(params, new_state, frames)  # state round-trips sharded
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1
    np.testing.assert_allclose(
        np.asarray(new_state["temp1"]["skip1"]),
        np.asarray(ref_state["temp1"]["skip1"]),
        atol=1e-5,
    )


def test_sharded_egvsr_step_matches_single_device():
    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.parallel import make_sharded_egvsr_step
    from sharkshark_tpu.upscale.steps import egvsr_upscale_step

    cfg = egvsr.EGVSRConfig(nf=16, nb=1)
    spec = UpscaleSpec(lr_shape=(16, 32), output_shape=(64, 128),
                       compute_dtype=jnp.float32)
    params = egvsr.init_params(jax.random.PRNGKey(0), cfg)
    frame = jax.random.randint(jax.random.PRNGKey(1), (1, 16, 32, 3), 0, 256, jnp.uint8)

    state0 = egvsr.init_recurrent_state(1, 16, 32, cfg)
    ref, _ = egvsr_upscale_step(params, state0, frame, spec)

    mesh = make_mesh(8, spatial=8)
    fn = make_sharded_egvsr_step(spec, mesh)
    with mesh:
        out, new_state = fn(params, egvsr.init_recurrent_state(1, 16, 32, cfg), frame)
        out2, _ = fn(params, new_state, frame)
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1


def test_sharded_upscale_yuv420p_matches_single_device():
    """Sharded output in the production D2H-halving planar format
    (VERDICT r3 item 5): the rank-3 (N, H*3/2, W) emission shards W on
    its LAST axis and still matches the unsharded step."""
    spec = SPEC._replace(pix_fmt="yuv420p")
    params = srvgg.init_params(jax.random.PRNGKey(0), TINY)
    frames = jax.random.randint(
        jax.random.PRNGKey(1), (4, 32, 64, 3), 0, 256, jnp.uint8
    )
    ref = upscale_multi(_apply, params, frames, spec)
    assert ref.shape == (4, 64 * 3 // 2, 128)  # planar rank-3

    mesh = make_mesh(8, spatial=2)
    fn = make_sharded_upscale(_apply, spec, mesh)
    with mesh:
        out = fn(params, jax.device_put(frames, batch_sharding(mesh)))
    assert out.shape == ref.shape
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1


def test_sharded_denoise_yuv420p_matches_single_device():
    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.parallel import make_sharded_denoise
    from sharkshark_tpu.upscale import init_denoise_state, upscale_batch_denoise

    bcfg = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3, interm_ch=6)
    spec = UpscaleSpec(lr_shape=(32, 64), output_shape=(64, 128),
                       compute_dtype=jnp.float32, pix_fmt="yuv420p")
    params = {
        "sr": srvgg.init_params(jax.random.PRNGKey(0), TINY),
        "denoise": bsvd.init_params(jax.random.PRNGKey(1), bcfg),
    }
    frames = jax.random.randint(
        jax.random.PRNGKey(2), (4, 32, 64, 3), 0, 256, jnp.uint8
    )
    ref, _ = upscale_batch_denoise(
        lambda p, x: srvgg.apply(p, x, cfg=TINY), params,
        init_denoise_state(1, spec, bcfg), frames, spec, bcfg,
    )
    assert ref.shape == (4, 64 * 3 // 2, 128)

    mesh = make_mesh(8, spatial=2)
    fn = make_sharded_denoise(
        lambda p, x: srvgg.apply(p, x, cfg=TINY), spec, mesh, bcfg
    )
    with mesh:
        out, new_state = fn(params, init_denoise_state(1, spec, bcfg), frames)
        out2, _ = fn(params, new_state, frames)  # state round-trips sharded
    assert out.shape == ref.shape
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1


def test_sharded_egvsr_yuv420p_matches_single_device():
    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.parallel import make_sharded_egvsr_step
    from sharkshark_tpu.upscale.steps import egvsr_upscale_step

    cfg = egvsr.EGVSRConfig(nf=16, nb=1)
    spec = UpscaleSpec(lr_shape=(16, 32), output_shape=(64, 128),
                       compute_dtype=jnp.float32, pix_fmt="yuv420p")
    params = egvsr.init_params(jax.random.PRNGKey(0), cfg)
    frame = jax.random.randint(jax.random.PRNGKey(1), (1, 16, 32, 3), 0, 256, jnp.uint8)

    ref, _ = egvsr_upscale_step(params, egvsr.init_recurrent_state(1, 16, 32, cfg),
                                frame, spec)
    assert ref.shape == (1, 64 * 3 // 2, 128)

    mesh = make_mesh(8, spatial=8)
    fn = make_sharded_egvsr_step(spec, mesh)
    with mesh:
        out, _ = fn(params, egvsr.init_recurrent_state(1, 16, 32, cfg), frame)
    assert out.shape == ref.shape
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1


def test_service_mesh_product_path():
    """VERDICT r3 item 4: the live EsrganUpscalerService runs its whole
    denoise path (chunk + warm + EOF flush) through the sharded
    factories when constructed with mesh= (what the CLI --mesh flag
    builds), matching the unsharded service bit-for-quantization-step."""
    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.upscale.service import EsrganUpscalerService

    bcfg = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3, interm_ch=6)

    def make(mesh):
        svc = EsrganUpscalerService(
            denoising=True,
            batch_size=4,
            output_shape=(64, 128),
            compute_dtype=jnp.float32,
            srvgg_cfg=TINY,
            bsvd_cfg=bcfg,
            mesh=mesh,
        )
        svc.lr_shape = (32, 64)
        svc.proc_init()
        return svc

    frames = np.random.default_rng(0).integers(0, 256, (4, 32, 64, 3), dtype=np.uint8)
    ref_svc = make(None)
    ref = ref_svc.upscale(frames)

    mesh = make_mesh(8, spatial=2)
    svc = make(mesh)
    out = svc.upscale(frames)
    assert out.shape == ref.shape == (4, 64, 128, 3)
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1
    # EOF flush drains through the sharded flush executable
    drained = list(svc.proc_eof())
    assert drained and len(drained[-1].frames) == 4


def test_service_mesh_egvsr_product_path():
    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.upscale.service import EgvsrUpscalerService

    cfg = egvsr.EGVSRConfig(nf=16, nb=1)

    def make(mesh):
        svc = EgvsrUpscalerService(
            output_shape=(64, 128),
            compute_dtype=jnp.float32,
            cfg=cfg,
            mesh=mesh,
        )
        svc.lr_shape = (16, 32)
        svc.proc_init()
        return svc

    frames = np.random.default_rng(1).integers(0, 256, (2, 16, 32, 3), dtype=np.uint8)
    ref = make(None).upscale(frames)

    mesh = make_mesh(8, spatial=8)
    out = make(mesh).upscale(frames)
    assert out.shape == ref.shape == (2, 64, 128, 3)
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1


def test_cli_parse_mesh():
    from sharkshark_tpu.main.upscaler import build_parser, parse_mesh

    mesh = parse_mesh("4,2")
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}
    assert dict(parse_mesh("8").shape) == {"data": 8, "spatial": 1}
    args = build_parser().parse_args(["--url", "x", "--mesh", "2,2"])
    assert args.mesh == "2,2"


def test_sharded_denoise_warm_lanefold(monkeypatch):
    """Warm sharded denoise with the lane-folded stage forced on: the
    fold/unfold reshapes must compose with the W-sharding (XLA SPMD
    reshards the folded tensors; output still matches the unsharded
    warm step)."""
    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.parallel import make_sharded_denoise
    from sharkshark_tpu.upscale import init_denoise_state, upscale_batch_denoise

    bcfg = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3, interm_ch=6)
    spec = UpscaleSpec(lr_shape=(32, 64), output_shape=(64, 128),
                       compute_dtype=jnp.float32)
    params = {
        "sr": srvgg.init_params(jax.random.PRNGKey(0), TINY),
        "denoise": bsvd.init_params(jax.random.PRNGKey(1), bcfg),
    }
    frames = jax.random.randint(
        jax.random.PRNGKey(2), (4, 32, 64, 3), 0, 256, jnp.uint8
    )
    # reach the warm regime (t >= 15) before comparing
    state = init_denoise_state(1, spec, bcfg)
    for _ in range(4):
        _, state = upscale_batch_denoise(
            lambda p, x: srvgg.apply(p, x, cfg=TINY), params, state, frames,
            spec, bcfg,
        )

    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    ref, _ = upscale_batch_denoise(
        lambda p, x: srvgg.apply(p, x, cfg=TINY), params, state, frames,
        spec, bcfg, warm=True,
    )
    mesh = make_mesh(8, spatial=2)
    fn = make_sharded_denoise(
        lambda p, x: srvgg.apply(p, x, cfg=TINY), spec, mesh, bcfg, warm=True
    )
    with mesh:
        out, _ = fn(params, state, frames)
    diff = np.abs(np.asarray(out, np.int16) - np.asarray(ref, np.int16))
    assert diff.max() <= 1
