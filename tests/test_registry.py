"""Model registry tests."""

import pytest

from comfyui_gguf_tpu.registry import ModelRegistry


@pytest.fixture
def tree(tmp_path):
    (tmp_path / "unet").mkdir()
    (tmp_path / "clip").mkdir()
    (tmp_path / "unet" / "flux1-dev-Q4_K_S.gguf").write_bytes(b"x")
    (tmp_path / "unet" / "sub").mkdir()
    (tmp_path / "unet" / "sub" / "sd3.gguf").write_bytes(b"x")
    (tmp_path / "clip" / "clip_l.safetensors").write_bytes(b"x")
    (tmp_path / "clip" / "t5-Q8_0.gguf").write_bytes(b"x")
    (tmp_path / "clip" / "notes.txt").write_bytes(b"x")
    return tmp_path


def test_scan_roles(tree):
    reg = ModelRegistry([str(tree)])
    unets = reg.list_names("unet")
    assert "flux1-dev-Q4_K_S.gguf" in unets
    assert any(n.endswith("sd3.gguf") for n in unets)  # recursive
    clips = reg.list_names("clip")
    assert set(clips) == {"clip_l.safetensors", "t5-Q8_0.gguf"}


def test_gguf_only_filter(tree):
    reg = ModelRegistry([str(tree)])
    assert reg.list_names("clip", gguf_only=True) == ["t5-Q8_0.gguf"]


def test_get_full_path(tree):
    reg = ModelRegistry([str(tree)])
    p = reg.get_full_path("unet", "flux1-dev-Q4_K_S.gguf")
    assert p.endswith("unet/flux1-dev-Q4_K_S.gguf")
    with pytest.raises(FileNotFoundError):
        reg.get_full_path("unet", "nope.gguf")
