"""One-command pretrained-weight fetch with sha256 verification.

The reference bootstraps from downloaded checkpoints: OpenAI CLIP via a
sha256-verified cached download (`retrieval/models/clip/clip.py:39-67` —
the checksum is embedded in the URL path) and GLIP weights resolved from
the model zoo (`grounding/README.md:84-88`, fetched manually / via
`try_to_find`). This module is the rebuild's equivalent entry point:

    lpi fetch-weights clip-vit-b-16            # download + verify + convert
    lpi fetch-weights glip-t-a --no-convert    # raw checkpoint only

Downloads cache under `--root` (default ~/.cache/lpi_tpu); a cached file
whose sha256 matches is never re-fetched; a mismatch re-downloads once and
errors if still wrong (same policy as the reference's `_download`). After
download, the matching converter (`models/clip/convert.py` /
`models/glip/convert.py`) maps the torch state dict into this framework's
stacked-Flax layout and saves it as `<name>.converted.npz` (flat
'/'-joined param paths), loadable with `load_converted`.

Offline boxes: network errors surface as a clear RuntimeError naming the
URL; nothing is partially cached (downloads write to a temp file and
rename into place).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import urllib.request
from typing import Callable, Dict, Optional

import numpy as np

# Registry: name -> (url, sha256 or None when the publisher ships none).
# OpenAI CLIP URLs embed the checksum as the second-to-last path segment
# (`clip.py:43`); GLIP zoo files publish no checksum — those verify only
# size > 0 and log the digest so users can pin it after first download.
_OPENAI = "https://openaipublic.azureedge.net/clip/models"
_HF_GLIP = "https://huggingface.co/GLIPModel/GLIP/resolve/main"
_MSBLOB = "https://penzhanwu2bbs.blob.core.windows.net/data/GLIPv1_Open/models"

WEIGHTS: Dict[str, Dict] = {
    "clip-vit-b-16": {
        "url": f"{_OPENAI}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
        "sha256": "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
        "converter": "clip",
    },
    "clip-vit-b-32": {
        "url": f"{_OPENAI}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
        "sha256": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
        "converter": "clip",
    },
    # GLIP-T(A): the frozen base model of the LPI grounding half
    # (grounding/README.md:84)
    "glip-t-a": {
        "url": f"{_HF_GLIP}/glip_a_tiny_o365.pth",
        "sha256": None,
        "converter": "glip",
    },
    "glip-t": {
        "url": f"{_HF_GLIP}/glip_tiny_model_o365_goldg_cc_sbu.pth",
        "sha256": None,
        "converter": "glip",
    },
    # Swin-T ImageNet init (grounding/README.md:73)
    "swin-t": {
        "url": f"{_MSBLOB}/swin_tiny_patch4_window7_224.pth",
        "sha256": None,
        "converter": None,
    },
}

DEFAULT_ROOT = os.path.expanduser("~/.cache/lpi_tpu")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(url: str, root: str = DEFAULT_ROOT,
             expected_sha256: Optional[str] = None,
             opener: Optional[Callable] = None,
             _retried: bool = False) -> str:
    """Fetch `url` into `root` with caching + sha256 verification
    (reference `clip.py:_download` policy). `opener` is injectable for
    tests (callable returning a file-like of the body)."""
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")

    if os.path.isfile(target):
        if expected_sha256 is None or _sha256(target) == expected_sha256:
            return target
        os.remove(target)  # stale/corrupt cache entry: re-fetch

    opener = opener or (lambda u: urllib.request.urlopen(u))
    try:
        source = opener(url)
    except Exception as e:
        raise RuntimeError(
            f"cannot download {url} ({e!r}); offline? fetch the file "
            f"manually and place it at {target}") from e
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".part")
    try:
        with os.fdopen(fd, "wb") as out, source:
            while True:
                buf = source.read(1 << 20)
                if not buf:
                    break
                out.write(buf)
        digest = _sha256(tmp)
        if expected_sha256 is not None and digest != expected_sha256:
            if not _retried:
                os.remove(tmp)
                return download(url, root, expected_sha256, opener,
                                _retried=True)
            raise RuntimeError(
                f"sha256 mismatch for {url}: got {digest}, "
                f"expected {expected_sha256}")
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return target


def _convert(name: str, ckpt_path: str, root: str) -> Optional[str]:
    """Run the registered converter and save a flat npz of params."""
    kind = WEIGHTS[name]["converter"]
    if kind is None:
        return None
    from flax import traverse_util

    if kind == "clip":
        from lpi_tpu.models.clip.convert import load_torch_clip

        params = load_torch_clip(ckpt_path)  # load + convert in one step
        flat = traverse_util.flatten_dict(params, sep="/")
    elif kind == "glip":
        import torch

        from lpi_tpu.models.glip.convert import convert_glip

        raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = raw.get("model", raw) if isinstance(raw, dict) else raw
        sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                            else v) for k, v in sd.items()}
        flat_tuples, _unmapped = convert_glip(sd)
        flat = {"/".join(k): v for k, v in flat_tuples.items()}
    else:  # pragma: no cover - registry invariant
        raise ValueError(f"unknown converter {kind!r}")

    out_path = os.path.join(root, f"{name}.converted.npz")
    np.savez(out_path, **{k: np.asarray(v) for k, v in flat.items()})
    return out_path


def load_converted(path: str) -> Dict:
    """Load a `<name>.converted.npz` back into a nested param tree."""
    from flax import traverse_util

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")


def fetch_weights(name: str, root: str = DEFAULT_ROOT, convert: bool = True,
                  opener: Optional[Callable] = None) -> Dict[str, Optional[str]]:
    """Download + verify + (optionally) convert one registry entry.
    Returns {'checkpoint': path, 'converted': path or None,
    'sha256': digest}."""
    if name not in WEIGHTS:
        raise KeyError(
            f"unknown weights {name!r}; available: {sorted(WEIGHTS)}")
    spec = WEIGHTS[name]
    ckpt = download(spec["url"], root, spec["sha256"], opener)
    converted = _convert(name, ckpt, root) if convert else None
    return {"checkpoint": ckpt, "converted": converted,
            "sha256": _sha256(ckpt)}
