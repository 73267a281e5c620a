"""Regression tests for tools/ingest_weights.py (VERDICT r4 item 10).

The real production checkpoints (realesr-general-x4v3.pth, bsvd-*.pth,
EGVSR_iter420000.pth — reference realesrgan/factory.py:140-150,
egvsr_upscaler.py:25) cannot be downloaded on this host, so the three
golden-quality tests stay skipped.  These tests keep the ingest path
itself green without them: the locally minted weights share the exact
reference key layout (tools/export_torch_srvgg.py et al. write them in
release format), so they double as ingest fixtures — validate() must
accept them, main() must install them under the canonical zoo name, and
a checkpoint with a missing/misshaped key must be rejected before any
file lands.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MINTED = os.path.join(REPO, "weights", "minted")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "ingest_weights", os.path.join(REPO, "tools", "ingest_weights.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FIXTURES = [
    ("realesr-general-x4v3", "srvgg-derived-x4.pth", "realesr-general-x4v3.pth"),
    ("bsvd-32", "bsvd-derived-32.pth", "bsvd-32.pth"),
    ("egvsr", "egvsr-derived-x4.pth", "EGVSR_iter420000.pth"),
]


@pytest.mark.parametrize("model,fixture,canonical", FIXTURES)
def test_ingest_installs_canonical(tmp_path, monkeypatch, model, fixture, canonical):
    src = os.path.join(MINTED, fixture)
    if not os.path.exists(src):
        pytest.skip(f"minted fixture {fixture} not present")
    tool = _load_tool()
    wdir = tmp_path / "weights"
    monkeypatch.setattr(
        sys, "argv",
        ["ingest_weights.py", src, "--model", model, "--weight-dir", str(wdir)],
    )
    tool.main()
    assert (wdir / canonical).exists()
    # byte-identical copy, not a rewrite
    assert (wdir / canonical).stat().st_size == os.path.getsize(src)


def test_ingest_zoo_keeps_release_basename(tmp_path, monkeypatch):
    """A candidate already named like one of the zoo's release files
    keeps that name (the DNI pair realesr-general-{wdn-,}x4v3 is
    disambiguated by the file name the user hands in)."""
    src = os.path.join(MINTED, "srvgg-derived-x4.pth")
    if not os.path.exists(src):
        pytest.skip("minted fixture not present")
    staged = tmp_path / "realesr-general-wdn-x4v3.pth"
    staged.write_bytes(open(src, "rb").read())
    tool = _load_tool()
    wdir = tmp_path / "weights"
    monkeypatch.setattr(
        sys, "argv",
        ["ingest_weights.py", str(staged), "--model", "realesr-general-x4v3",
         "--weight-dir", str(wdir)],
    )
    tool.main()
    assert (wdir / "realesr-general-wdn-x4v3.pth").exists()


@pytest.mark.parametrize(
    "model,fixture",
    [("realesr-general-x4v3", "srvgg-derived-x4.pth"),
     ("bsvd-32", "bsvd-derived-32.pth"),
     ("egvsr", "egvsr-derived-x4.pth")],
)
def test_ingest_rejects_missing_key(tmp_path, monkeypatch, model, fixture):
    src = os.path.join(MINTED, fixture)
    if not os.path.exists(src):
        pytest.skip(f"minted fixture {fixture} not present")
    sd = torch.load(src, map_location="cpu", weights_only=True)
    inner = sd["params"] if isinstance(sd, dict) and "params" in sd else sd
    # biases are legitimately optional (bias-free checkpoints load);
    # a missing WEIGHT must hard-fail
    dropped = sorted(k for k in inner if k.endswith("weight"))[0]
    del inner[dropped]
    bad = tmp_path / "bad.pth"
    torch.save(sd, str(bad))
    tool = _load_tool()
    wdir = tmp_path / "weights"
    monkeypatch.setattr(
        sys, "argv",
        ["ingest_weights.py", str(bad), "--model", model,
         "--weight-dir", str(wdir)],
    )
    with pytest.raises((KeyError, ValueError, AssertionError, SystemExit)):
        tool.main()
    assert not wdir.exists() or not list(wdir.iterdir())


def test_ingest_rejects_misshaped_key(tmp_path, monkeypatch):
    src = os.path.join(MINTED, "srvgg-derived-x4.pth")
    if not os.path.exists(src):
        pytest.skip("minted fixture not present")
    sd = torch.load(src, map_location="cpu", weights_only=True)
    inner = sd["params"] if isinstance(sd, dict) and "params" in sd else sd
    k = sorted(inner)[0]
    inner[k] = torch.zeros(tuple(np.array(inner[k].shape) + 1))
    bad = tmp_path / "bad.pth"
    torch.save(sd, str(bad))
    tool = _load_tool()
    wdir = tmp_path / "weights"
    monkeypatch.setattr(
        sys, "argv",
        ["ingest_weights.py", str(bad), "--model", "realesr-general-x4v3",
         "--weight-dir", str(wdir)],
    )
    with pytest.raises((KeyError, ValueError, AssertionError, SystemExit)):
        tool.main()
    assert not wdir.exists() or not list(wdir.iterdir())


def test_ingest_unknown_model_exits(tmp_path, monkeypatch):
    src = os.path.join(MINTED, "srvgg-derived-x4.pth")
    if not os.path.exists(src):
        pytest.skip("minted fixture not present")
    tool = _load_tool()
    monkeypatch.setattr(
        sys, "argv",
        ["ingest_weights.py", src, "--model", "nope",
         "--weight-dir", str(tmp_path / "w")],
    )
    with pytest.raises(SystemExit):
        tool.main()
