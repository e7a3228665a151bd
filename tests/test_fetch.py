"""Weight fetch: cached sha256-verified download + convert (mocked network).

Mirrors the reference's `retrieval/models/clip/clip.py:39-67` policy:
cache hit short-circuits, checksum mismatch re-downloads once then errors,
and the fetched checkpoint feeds the converter end-to-end.
"""

import hashlib
import io
import os

import numpy as np
import pytest

from lpi_tpu.core import fetch

pytestmark = pytest.mark.fast


def _serve(payload: bytes):
    """Opener double: returns a fresh reader per call and counts calls."""
    calls = []

    def opener(url):
        calls.append(url)
        return io.BytesIO(payload)

    return opener, calls


def test_download_verifies_and_caches(tmp_path):
    payload = b"weights-bytes"
    digest = hashlib.sha256(payload).hexdigest()
    opener, calls = _serve(payload)

    path = fetch.download("http://x/model.pt", str(tmp_path), digest, opener)
    assert open(path, "rb").read() == payload
    assert len(calls) == 1

    # cache hit: no second network call
    again = fetch.download("http://x/model.pt", str(tmp_path), digest, opener)
    assert again == path and len(calls) == 1

    # corrupt the cache: must re-download (checksum no longer matches)
    with open(path, "wb") as f:
        f.write(b"corrupted")
    fetch.download("http://x/model.pt", str(tmp_path), digest, opener)
    assert open(path, "rb").read() == payload and len(calls) == 2


def test_download_checksum_mismatch_raises(tmp_path):
    opener, calls = _serve(b"not-the-real-bytes")
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        fetch.download("http://x/model.pt", str(tmp_path), "0" * 64, opener)
    assert len(calls) == 2  # one retry (reference re-download policy)
    assert not os.path.exists(tmp_path / "model.pt")  # nothing half-cached


def test_download_offline_error_names_url(tmp_path):
    def opener(url):
        raise OSError("no route to host")

    with pytest.raises(RuntimeError, match="http://x/model.pt"):
        fetch.download("http://x/model.pt", str(tmp_path), None, opener)


def test_fetch_weights_end_to_end_clip(tmp_path):
    """Full pipeline on a synthetic OpenAI-format checkpoint: download ->
    verify -> torch.load -> convert -> npz round-trip."""
    import torch

    from lpi_tpu.core.config import CLIPConfig
    from lpi_tpu.models.clip.convert import synthetic_state_dict

    cfg = CLIPConfig(image_resolution=32, patch_size=16, vision_width=64,
                     vision_layers=2, vision_heads=4, text_width=32,
                     text_layers=2, text_heads=4, vocab_size=128,
                     context_length=16, embed_dim=32)
    sd = {k: torch.as_tensor(v) for k, v in synthetic_state_dict(cfg).items()}
    buf = io.BytesIO()
    torch.save(sd, buf)
    payload = buf.getvalue()
    digest = hashlib.sha256(payload).hexdigest()
    opener, _ = _serve(payload)

    name = "clip-vit-b-16"
    real_spec = fetch.WEIGHTS[name]
    try:
        fetch.WEIGHTS[name] = dict(real_spec, sha256=digest)
        out = fetch.fetch_weights(name, root=str(tmp_path), opener=opener)
    finally:
        fetch.WEIGHTS[name] = real_spec

    assert out["sha256"] == digest
    assert out["converted"] and out["converted"].endswith(".converted.npz")
    params = fetch.load_converted(out["converted"])
    # stacked scanned-tower layout: leading layer axis == vision_layers
    from flax import traverse_util

    vis_flat = traverse_util.flatten_dict(params["visual"]["transformer"])
    stacked = [v for v in vis_flat.values() if v.ndim >= 2]
    assert stacked and all(v.shape[0] == cfg.vision_layers for v in stacked)


def test_cli_list(capsys):
    from lpi_tpu.cli.main import main

    out = main(["fetch-weights", "--list"])
    assert "clip-vit-b-16" in out["available"]
    printed = capsys.readouterr().out
    assert "glip-t-a" in printed and "sha256" in printed


def test_registry_unknown_name(tmp_path):
    with pytest.raises(KeyError, match="unknown weights"):
        fetch.fetch_weights("nope", root=str(tmp_path))
