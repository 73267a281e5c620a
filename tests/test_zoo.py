"""Model zoo registry tests (offline behavior + builders)."""

import jax.numpy as jnp
import pytest

from sharkshark_tpu.models import zoo


def test_zoo_table_covers_reference_models():
    expected = {
        "RealESRGAN_x4plus",
        "RealESRNet_x4plus",
        "RealESRGAN_x4plus_anime_6B",
        "RealESRGAN_x2plus",
        "realesr-animevideov3",
        "realesr-general-x4v3",
    }
    assert expected <= set(zoo.ZOO)
    assert zoo.ZOO["realesr-general-x4v3"].dni_partner == "realesr-general-wdn-x4v3"
    assert zoo.ZOO["RealESRGAN_x2plus"].scale == 2


@pytest.mark.parametrize("name", ["realesr-general-x4v3", "RealESRGAN_x4plus_anime_6B"])
def test_build_random_init(name):
    fn, params, scale = zoo.build_sr_model(name, random_init=True)
    out = fn(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 8 * scale, 8 * scale, 3)


def test_missing_weights_raise_with_url(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        zoo.fetch_weights("RealESRGAN_x2plus", weight_dir=str(tmp_path))
    assert "github.com" in str(e.value)
