"""Config-driven train/test/profile driver for the VSR training tree.

Rebuild of reference src/upscale/model/egvsr/main.py:18-352:
`python -m sharkshark_tpu.train.driver --config cfg.yml --mode
train|test|profile` with a yaml option tree (see configs/egvsr_bd.yml).

train: dataloader -> (BD degradation on device) -> jitted VSR or VSRGAN
step, periodic test + metric JSON + checkpoint save, exact resume
(optimizer state included, unlike the reference's TODO stub).
test: run each test set through infer_sequence, save outputs + metrics.
profile: XLA cost analysis + wall-clock fps.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..models import egvsr
from ..utils import get_logger
from . import checkpoint as ckpt
from .datasets import (
    PairedFolderDataset,
    PairedLMDBDataset,
    UnpairedLMDBDataset,
    create_dataloader,
    gaussian_downsample_kernel,
    prepare_data,
)
from .metrics import MetricCalculator
from .model_summary import benchmark_fps, count_params, profile_model
from .schedules import define_lr_schedule
from .vsr import VSRTrainConfig, create_train_state, make_train_step

log = get_logger("train.driver")


def load_config(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def _model_cfg(opt: dict) -> egvsr.EGVSRConfig:
    g = opt.get("model", {}).get("generator", {})
    return egvsr.EGVSRConfig(
        in_nc=g.get("in_nc", 3),
        out_nc=g.get("out_nc", 3),
        nf=g.get("nf", 64),
        nb=g.get("nb", 10),
        scale=opt.get("scale", 4),
        # BD-degradation configs train with the TecoGAN bicubic flow
        # upsample, like the reference's get_upsampling_func wiring
        # (FRNet __init__ <- opt dataset degradation)
        degradation=opt.get("dataset", {}).get("degradation", {}).get("type", "BI"),
    )


def define_generator(opt: dict):
    """Generator registry (reference models/networks/__init__.py:3-42):
    name -> (init_params(key), infer_sequence(params, lr (T,H,W,C)) ->
    (T,sH,sW,C)). 'frnet'/'egvsr' share the FRNet architecture; espnet is
    per-frame; vespnet slides a depth-frame window; sofnet takes 3-frame
    Y windows."""
    name = opt["model"]["generator"].get("name", "FRNet").lower()
    scale = opt.get("scale", 4)

    if name in ("frnet", "egvsr"):
        cfg = _model_cfg(opt)
        return {
            "name": name,
            "init": lambda key: egvsr.init_params(key, cfg),
            "infer": lambda p, lr: egvsr.infer_sequence(
                p, lr[:, None], cfg=cfg
            )[:, 0],
            "from_torch": lambda sd: egvsr.from_torch(sd, cfg),
        }

    if name == "srvgg":
        from ..models import srvgg
        g = opt["model"]["generator"]
        cfg = srvgg.SRVGGConfig(
            num_feat=g.get("nf", 64),
            num_conv=g.get("num_conv", 32),
            upscale=opt.get("scale", 4),
        )
        return {
            "name": name,
            "cfg": cfg,
            "init": lambda key: srvgg.init_params(key, cfg),
            # per-frame: the T axis rides the batch dim
            "infer": lambda p, lr: srvgg.apply(p, lr, cfg=cfg),
            "from_torch": lambda sd: srvgg.from_torch(sd, cfg),
        }

    if name == "bsvd":
        # denoise "generator": same-resolution, noise-map-conditioned
        # (train/denoise.py — capability extension; the reference ships
        # BSVD pretrained-only).  test-mode infer treats the dataset's
        # lr clip as the NOISY input at test.noise_sigma.
        from ..models import bsvd as B

        variant = opt["model"]["generator"].get("variant", 32)
        cfg = B.BSVD_64 if int(variant) == 64 else B.BSVD_32
        sigma = float(opt.get("test", {}).get("noise_sigma", 25.0)) / 255.0

        def infer(p, lr):
            from .denoise import clip_forward

            nmap = jnp.full(lr.shape[:-1] + (1,), sigma, lr.dtype)
            x = jnp.concatenate([lr, nmap], axis=-1)[:, None]  # (T,1,H,W,4)
            return clip_forward(p, x, cfg=cfg)[:, 0]

        return {
            "name": name,
            "cfg": cfg,
            "init": lambda key: B.init_params(key, cfg),
            "infer": infer,
            "from_torch": lambda sd: B.from_torch(sd, cfg),
        }

    from ..models import variants as V

    if name == "espnet":
        cfg = V.ESPCNConfig(
            scale=scale,
            in_nc=opt["model"]["generator"].get("in_nc", 3),
            out_nc=opt["model"]["generator"].get("out_nc", 3),
        )

        def infer(p, lr):
            return V.espcn_apply(p, lr, cfg=cfg)  # frame-major == batch

        return {"name": name, "init": lambda k: V.espcn_init(k, cfg), "infer": infer}

    if name == "vespnet":
        cfg = V.VESPCNConfig(
            scale=scale,
            channel=opt["model"]["generator"].get("channel", 3),
            depth=opt["model"]["generator"].get("depth", 3),
        )

        def infer(p, lr):
            pad = cfg.depth // 2
            outs = [
                V.vespcn_apply(p, lr[i - pad : i + pad + 1], cfg=cfg)[0]
                for i in range(pad, lr.shape[0] - pad)
            ]
            return jnp.stack(outs)

        return {"name": name, "init": lambda k: V.vespcn_init(k, cfg), "infer": infer}

    if name == "sofnet":
        cfg = V.SOFVSRConfig(scale=scale)

        def infer(p, lr):
            # 3-frame single-channel windows stacked in the channel dim
            outs = [
                V.sofvsr_apply(
                    p,
                    jnp.concatenate(
                        [lr[i - 1], lr[i], lr[i + 1]], axis=-1
                    )[None],
                    cfg=cfg,
                )[0]
                for i in range(1, lr.shape[0] - 1)
            ]
            return jnp.stack(outs)

        return {"name": name, "init": lambda k: V.sofvsr_init(k, cfg), "infer": infer}

    raise ValueError(f"unrecognized generator: {name}")


def _make_dataset(opt: dict, split: str):
    dopt = opt["dataset"][split]
    degradation = opt["dataset"]["degradation"]["type"]
    if split == "train":
        if dopt.get("name") == "Folder":
            from .datasets import PairedFolderTrainDataset

            crop = dopt.get("crop_size", 128)
            if degradation == "BD":
                # BD degradation crops 2*border px off the GT on device
                # (prepare_data); enlarge the dataset crop to compensate,
                # same as the unpaired-LMDB branch — otherwise the
                # degraded GT shrinks below crop_size and a discriminator
                # head sized to crop_size fails at its dense layer
                sigma = opt["dataset"]["degradation"].get("sigma", 1.5)
                crop += 2 * int(sigma * 3.0)
            return PairedFolderTrainDataset(
                dopt["gt_seq_dir"],
                dopt["lr_seq_dir"],
                scale=opt["scale"],
                crop_size=crop,
                tempo_extent=opt["train"]["tempo_extent"],
            )
        if degradation == "BI":
            return PairedLMDBDataset(
                dopt["gt_seq_dir"],
                dopt["lr_seq_dir"],
                scale=opt["scale"],
                crop_size=dopt.get("crop_size", 128),
                tempo_extent=opt["train"]["tempo_extent"],
                moving_first_frame=opt["train"].get("moving_first_frame", False),
                moving_factor=opt["train"].get("moving_factor", 1.0),
            )
        sigma = opt["dataset"]["degradation"].get("sigma", 1.5)
        crop = dopt.get("crop_size", 128) + 2 * int(sigma * 3.0)
        return UnpairedLMDBDataset(
            dopt["gt_seq_dir"],
            crop_size=crop,
            tempo_extent=opt["train"]["tempo_extent"],
            moving_first_frame=opt["train"].get("moving_first_frame", False),
            moving_factor=opt["train"].get("moving_factor", 1.0),
        )
    return PairedFolderDataset(
        dopt["gt_seq_dir"], dopt["lr_seq_dir"], dopt.get("filter_file")
    )


def _build_training(opt: dict):
    """VSR (pixel+warp) or VSRGAN (TecoGAN) training per the config —
    reference define_model (models/__init__.py): presence of a
    model.discriminator block selects the GAN wrapper."""
    gtr = opt["train"]["generator"]
    seed = opt.get("manual_seed", 0)

    if opt["model"]["generator"].get("name", "FRNet").lower() == "srvgg":
        from .sisr import SISRTrainConfig, create_sisr_state, make_sisr_train_step

        gen = define_generator(opt)
        cfg = SISRTrainConfig(
            model_cfg=gen["cfg"],
            lr=gtr.get("lr", 2e-4),
            beta1=gtr.get("beta1", 0.9),
            beta2=gtr.get("beta2", 0.999),
            pixel_crit=opt["train"].get("pixel_crit"),
            pixel_weight=opt["train"].get("pixel_crit", {}).get("weight", 1.0),
        )
        sched = define_lr_schedule(gtr.get("lr_schedule"), cfg.lr)
        state = create_sisr_state(jax.random.PRNGKey(seed), cfg, sched)
        step_fn = jax.jit(make_sisr_train_step(cfg, sched))
        return state, step_fn, lambda s: s.params

    if opt["model"]["generator"].get("name", "FRNet").lower() == "bsvd":
        from .denoise import (
            DenoiseTrainConfig,
            create_denoise_state,
            make_denoise_train_step,
        )

        gen = define_generator(opt)
        nopt = opt["train"].get("noise", {})
        cfg = DenoiseTrainConfig(
            model_cfg=gen["cfg"],
            lr=gtr.get("lr", 1e-4),
            beta1=gtr.get("beta1", 0.9),
            beta2=gtr.get("beta2", 0.999),
            pixel_crit=opt["train"].get("pixel_crit"),
            pixel_weight=opt["train"].get("pixel_crit", {}).get("weight", 1.0),
            sigma_min=float(nopt.get("sigma_min", 10.0)) / 255.0,
            sigma_max=float(nopt.get("sigma_max", 50.0)) / 255.0,
            noise_seed=opt.get("manual_seed", 0),
        )
        sched = define_lr_schedule(gtr.get("lr_schedule"), cfg.lr)
        state = create_denoise_state(jax.random.PRNGKey(seed), cfg, sched)
        step_fn = jax.jit(make_denoise_train_step(cfg, sched))
        return state, step_fn, lambda s: s.params

    mcfg = _model_cfg(opt)
    if opt.get("model", {}).get("discriminator"):
        from .discriminators import DiscriminatorConfig
        from .vsrgan import VSRGANConfig, create_gan_state, make_gan_train_step

        dopt = opt["model"]["discriminator"]
        dtr = opt["train"].get("discriminator", {})
        crop = opt["dataset"]["train"].get("crop_size", 128)
        if opt["dataset"]["degradation"]["type"] == "BI":
            crop = opt["dataset"]["train"].get("gt_crop_size", crop)
        cfg = VSRGANConfig(
            model_cfg=mcfg,
            disc_cfg=DiscriminatorConfig(
                in_nc=dopt.get("in_nc", 3),
                spatial_size=crop,
                tempo_range=dopt.get("tempo_range", 3),
                scale=opt.get("scale", 4),
                use_cond=dopt.get("use_cond", False),
            ),
            disc_type="spatial" if dopt.get("name", "stnet").lower() == "snet" else "spatio_temporal",
            lr_g=gtr.get("lr", 5e-5),
            lr_d=dtr.get("lr", 5e-5),
            pixel_weight=opt["train"].get("pixel_crit", {}).get("weight", 1.0),
            warping_weight=opt["train"].get("warping_crit", {}).get("weight", 1.0),
            pingpong_weight=opt["train"].get("pingpong_crit", {}).get("weight", 0.5),
            fm_weight=opt["train"].get("feature_matching_crit", {}).get("weight", 1.0),
            gan_weight=opt["train"].get("gan_crit", {}).get("weight", 0.01),
            use_pingpong="pingpong_crit" in opt["train"],
            use_feature_matching="feature_matching_crit" in opt["train"],
            crop_border_ratio=dtr.get("crop_border_ratio", 0.75),
            update_policy=dtr.get("update_policy", "adaptive"),
            update_threshold=dtr.get("update_threshold", 0.4),
            gan_crit=opt["train"].get("gan_crit", {}).get("type", "GAN"),
            feature_weight=opt["train"].get("feature_crit", {}).get("weight", 0.2),
        )
        fx = None
        vgg_path = opt["train"].get("feature_crit", {}).get("vgg_weights")
        if vgg_path:
            from .vgg import VGGFeatureExtractor

            fx = VGGFeatureExtractor(vgg_path)
        sched_g = define_lr_schedule(gtr.get("lr_schedule"), cfg.lr_g)
        sched_d = define_lr_schedule(dtr.get("lr_schedule"), cfg.lr_d)
        state = create_gan_state(jax.random.PRNGKey(seed), cfg, sched_g, sched_d)
        step_fn = jax.jit(
            make_gan_train_step(
                cfg, feature_extractor=fx, sched_g=sched_g, sched_d=sched_d
            )
        )
        return state, step_fn, lambda s: s.params_g

    cfg = VSRTrainConfig(
        model_cfg=mcfg,
        lr=gtr.get("lr", 5e-5),
        beta1=gtr.get("beta1", 0.9),
        beta2=gtr.get("beta2", 0.999),
        pixel_crit=opt["train"].get("pixel_crit"),
        warping_crit=opt["train"].get("warping_crit"),
        pixel_weight=opt["train"].get("pixel_crit", {}).get("weight", 1.0),
        warping_weight=opt["train"].get("warping_crit", {}).get("weight", 1.0),
    )
    sched = define_lr_schedule(gtr.get("lr_schedule"), cfg.lr)
    state = create_train_state(jax.random.PRNGKey(seed), cfg, sched)
    step_fn = jax.jit(make_train_step(cfg, sched))
    return state, step_fn, lambda s: s.params


def train(opt: dict) -> None:
    np.random.seed(opt.get("manual_seed", 0))
    state, step_fn, get_params = _build_training(opt)

    ckpt_dir = opt["train"].get("ckpt_dir", "./ckpt")
    resume = ckpt.latest_checkpoint(ckpt_dir)
    if resume and opt["train"].get("resume", True):
        state = ckpt.load_checkpoint(resume, state)
        log.info("resumed from %s (iter %d)", resume, int(state.step))

    degradation = opt["dataset"]["degradation"]["type"]
    kernel = None
    if degradation == "BD":
        kernel = gaussian_downsample_kernel(
            opt["dataset"]["degradation"].get("sigma", 1.5)
        )
        degrade = jax.jit(
            lambda gt: prepare_data(
                gt, kernel, opt["scale"],
                opt["dataset"]["degradation"].get("sigma", 1.5),
            )
        )

    loader = create_dataloader(
        _make_dataset(opt, "train"),
        batch_size=opt["dataset"]["train"].get("batch_size", 4),
        num_workers=opt["dataset"]["train"].get("num_workers", 0),
    )
    total_iter = opt["train"].get("total_iter", 100000)
    log_freq = opt.get("logger", {}).get("log_freq", 100)
    save_freq = opt["train"].get("ckpt_freq", 5000)
    test_freq = opt.get("test", {}).get("test_freq", 0)

    it = int(state.step)
    t0 = time.time()
    while it < total_iter:
        for batch in loader:
            if it >= total_iter:
                break
            if degradation == "BD":
                data = degrade(jnp.asarray(batch["gt"]))
            else:
                data = {"gt": jnp.asarray(batch["gt"]), "lr": jnp.asarray(batch["lr"])}
            state, logs = step_fn(state, data["lr"], data["gt"])
            it += 1
            if it % log_freq == 0:
                msg = " ".join(f"{k}={float(v):.4f}" for k, v in logs.items())
                log.info("iter %d (%.1f it/s): %s", it, log_freq / (time.time() - t0 + 1e-9), msg)
                t0 = time.time()
            if save_freq and it % save_freq == 0:
                path = ckpt.save_checkpoint(ckpt_dir, state, it)
                log.info("saved %s", path)
            if test_freq and it % test_freq == 0:
                test(opt, params=get_params(state), label=f"iter_{it}")
    ckpt.save_checkpoint(ckpt_dir, state, it)
    log.info("training done at iter %d", it)


def test(opt: dict, params=None, label: str = "final") -> dict:
    gen = define_generator(opt)
    if params is None:
        load_path = opt["model"]["generator"].get("load_path")
        if load_path and os.path.isdir(load_path):
            # our own orbax checkpoint (dir, or ckpt root -> latest)
            import orbax.checkpoint as ocp

            path = ckpt.latest_checkpoint(load_path) or load_path
            tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
            params = tree["params"] if "params" in tree else tree[0]
        elif load_path:
            from ..models.torch_import import load_state_dict

            if "from_torch" not in gen:
                raise ValueError(f".pth import not wired for {gen['name']}")
            params = gen["from_torch"](load_state_dict(load_path))
        else:
            raise ValueError("test mode needs model.generator.load_path or params")

    # temporal padding for warm-up (reference base_model.py:91-117)
    padding_mode = opt.get("test", {}).get("padding_mode", "reflect")
    n_pad_front = opt.get("test", {}).get("num_pad_front", 0)
    infer = jax.jit(gen["infer"])
    results = {}
    for split in [k for k in opt["dataset"] if k.startswith("test")]:
        ds = _make_dataset(opt, split)
        metric_names = opt.get("test", {}).get("metrics", ["PSNR"])
        lpips = None
        if "LPIPS" in metric_names:
            from .metrics import LPIPS

            lp = opt.get("test", {}).get("lpips_weights")
            # explicit [alexnet_sd, linear_sd] paths (ingested reference
            # weights) win; default = the checked-in minted pair, so a
            # `metrics: [LPIPS]` config runs on a fresh offline checkout
            lpips = LPIPS(*lp) if lp else LPIPS.minted()
        calc = MetricCalculator(
            metrics=metric_names,
            psnr_colorspace=opt.get("test", {}).get("psnr_colorspace", "y"),
            lpips=lpips,
        )
        save_dir = opt.get("test", {}).get("res_dir")
        for sample in ds:
            lr = jnp.asarray(sample["lr"])  # (T, h, w, C)
            t_real = lr.shape[0]
            lr, n_pad = egvsr.pad_sequence(lr, n_pad_front, padding_mode)
            hr = np.asarray(infer(params, lr))
            if n_pad and len(hr) == lr.shape[0]:
                # per-frame generators: drop warm-up outputs
                hr = hr[n_pad : n_pad + t_real]
            hr_u8 = np.clip(hr * 255 + 0.5, 0, 255).astype(np.uint8)
            gt = sample["gt"]
            if len(hr_u8) < len(gt):
                # window generators (vespnet/sofnet) drop edge frames
                off = (len(gt) - len(hr_u8)) // 2
                gt = gt[off : off + len(hr_u8)]
            calc.compute_sequence_metrics(sample["seq_idx"], gt, hr_u8)
            if save_dir:
                _save_seq(save_dir, split, sample["seq_idx"], hr_u8)
        results[split] = calc.average()
        log.info("%s %s: %s", label, split, results[split])
        json_dir = opt.get("test", {}).get("json_dir")
        if json_dir:
            os.makedirs(json_dir, exist_ok=True)
            calc.save(os.path.join(json_dir, f"{split}_avg.json"), label)
    return results


def _save_seq(root: str, split: str, seq: str, frames: np.ndarray) -> None:
    import cv2

    d = os.path.join(root, split, seq)
    os.makedirs(d, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(d, f"{i:04d}.png"), f[..., ::-1])


def profile(opt: dict) -> dict:
    mcfg = _model_cfg(opt)
    h, w = opt.get("test", {}).get("profile_size", (256, 448))
    params = egvsr.init_params(jax.random.PRNGKey(0), mcfg)
    lr = jnp.zeros((1, 1, h, w, 3), jnp.float32)

    def fwd(p, x):
        return egvsr.infer_sequence(p, x.transpose(1, 0, 2, 3, 4))

    stats = profile_model(fwd, params, lr)
    stats["params"] = count_params(params)
    stats["fps"] = benchmark_fps(fwd, params, lr)
    log.info(
        "profile @%dx%d: %.2f GFLOPs, %.2fM params, %.1f fps",
        h, w, stats["flops"] / 1e9, stats["params"] / 1e6, stats["fps"],
    )
    return stats


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sharkshark_tpu.train.driver")
    p.add_argument("--config", required=True)
    p.add_argument("--mode", choices=["train", "test", "profile"], default="train")
    args = p.parse_args(argv)
    # on-disk XLA executable cache: repeat train/test runs skip the
    # multi-minute step compile (same cache the inference services use)
    from ..upscale.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    opt = load_config(args.config)
    {"train": train, "test": test, "profile": profile}[args.mode](opt)


if __name__ == "__main__":
    main()
