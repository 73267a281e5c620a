"""Single-image upscale CLI — the minimum end-to-end slice
(SURVEY §7.3 / BASELINE config 1): load an image, run the jitted model,
save the result.

  python -m sharkshark_tpu.main.upscale_image --input in.png --output out.png \
      --model fsrcnn --weights fsrcnn_x4-T91.pth
  python -m sharkshark_tpu.main.upscale_image --input in.png --output out.png \
      --model-name realesr-general-x4v3 --denoise-strength 0.5
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sharkshark_tpu.main.upscale_image")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model", default="fsrcnn", choices=["fsrcnn", "zoo"],
                   help="fsrcnn = single-channel T91 net; zoo = --model-name")
    p.add_argument("--model-name", default="realesr-general-x4v3",
                   help="zoo entry (models/zoo.py)")
    p.add_argument("--weights", default=None, help=".pth path")
    p.add_argument("--denoise-strength", type=float, default=1.0)
    p.add_argument("--tile", type=int, default=0,
                   help="tile size for large images (0 = whole image)")
    p.add_argument("--tile-pad", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sharkshark_tpu.upscale import enable_persistent_cache, tile_upscale

    enable_persistent_cache()
    img = np.asarray(Image.open(args.input).convert("RGB"), np.float32) / 255.0

    if args.model == "fsrcnn":
        from sharkshark_tpu.models import fsrcnn, torch_import

        if args.weights:
            params = fsrcnn.from_torch(torch_import.load_state_dict(args.weights))
        else:
            params = fsrcnn.init_params(jax.random.PRNGKey(0))
        scale = 4

        def apply_fn(p, x):
            n, h, w, c = x.shape
            y = fsrcnn.apply(
                p, x.transpose(0, 3, 1, 2).reshape(n * c, h, w, 1), factor=scale
            )
            return (
                y.reshape(n, c, h * scale, w * scale, 1)[..., 0]
                .transpose(0, 2, 3, 1)
            )
    else:
        from sharkshark_tpu.models import zoo

        apply_fn, params, scale = zoo.build_sr_model(
            args.model_name,
            model_path=args.weights,
            denoise_strength=args.denoise_strength,
        )

    x = jnp.asarray(img[None])
    t0 = time.perf_counter()
    if args.tile:
        out = tile_upscale(
            apply_fn, params, x, scale=scale, tile=args.tile, tile_pad=args.tile_pad
        )
    else:
        out = jax.jit(apply_fn)(params, x)
    out = np.asarray(jnp.clip(out[0], 0.0, 1.0))
    dt = time.perf_counter() - t0

    Image.fromarray((out * 255 + 0.5).astype(np.uint8)).save(args.output)
    print(
        f"{args.input} {img.shape[1]}x{img.shape[0]} -> "
        f"{args.output} {out.shape[1]}x{out.shape[0]} ({dt:.2f}s incl. compile)"
    )


if __name__ == "__main__":
    main()
