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
