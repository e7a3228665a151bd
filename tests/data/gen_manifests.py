"""Manifest generators (provenance for the vendored *.manifest.txt).

Run IN A CONTAINER WITH /root/reference PRESENT (tests themselves never
import this):

    python tests/data/gen_manifests.py glip  tests/data/glip_t_lpi.manifest.txt
    python tests/data/gen_manifests.py clip  tests/data/clip_vit_b16.manifest.txt

Builds the reference torch model classes OFFLINE — the missing third-party
deps (yacs, torchvision, timm, pycocotools, ...) are shimmed below, the
`maskrcnn_benchmark._C` CUDA extension is stubbed, and every
`from_pretrained` is patched to a local construction — then dumps
`state_dict()` keys+shapes. GLIP applies the yaml's TUNING_HIGHLEVEL_OVERRIDE
(language_prompt_v4) before building, exactly like `tools/finetune.py`.
"""

# ---- dependency shims (yacs / torchvision / timm / pycocotools / ...) ----
SHIM = r'''"""Minimal yacs.config.CfgNode shim (attribute-dict + yaml merge)."""
import sys, types, yaml

class CfgNode(dict):
    IMMUTABLE = "__immutable__"
    def __init__(self, init_dict=None, new_allowed=False):
        super().__init__()
        if init_dict:
            for k, v in init_dict.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)
    def __setattr__(self, name, value):
        self[name] = value
    def clone(self):
        import copy
        return copy.deepcopy(self)
    def freeze(self): pass
    def defrost(self): pass
    def is_frozen(self): return False
    def merge_from_file(self, path):
        with open(path) as f:
            other = yaml.safe_load(f)
        _merge(other or {}, self)
    def merge_from_list(self, opts):
        for k, v in zip(opts[0::2], opts[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            if isinstance(v, str) and old is not None and not isinstance(old, str):
                import ast
                try: v = ast.literal_eval(v)
                except Exception: pass
            node[parts[-1]] = v
    def dump(self, **kw):
        return yaml.safe_dump(_plain(self))

def _plain(d):
    return {k: _plain(v) if isinstance(v, dict) else v for k, v in d.items()}

def _coerce(v):
    # yacs literal_eval semantics: yaml strings like "(8, 16)" become tuples
    if isinstance(v, str):
        import ast
        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v
    return v

def _merge(src, dst):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(v, dst[k])
        else:
            dst[k] = CfgNode(v) if isinstance(v, dict) else _coerce(v)

mod = types.ModuleType("yacs"); cfgmod = types.ModuleType("yacs.config")
cfgmod.CfgNode = CfgNode
mod.config = cfgmod
sys.modules["yacs"] = mod
sys.modules["yacs.config"] = cfgmod

# torchvision stub (only ops.nms / ops.roi_align symbols are imported at
# module load; never called when just dumping state_dict keys)
tv = types.ModuleType("torchvision")
tv_ops = types.ModuleType("torchvision.ops")
tv_ops.nms = lambda *a, **k: None
tv_ops.roi_align = lambda *a, **k: None
tv.ops = tv_ops
tv.__version__ = "0.15.0"
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.ops", tv_ops)

import importlib.machinery as _mach
tv.__spec__ = _mach.ModuleSpec("torchvision", None)
tv_ops.__spec__ = _mach.ModuleSpec("torchvision.ops", None)

# timm shim: swint imports DropPath/to_2tuple/trunc_normal_ only
import torch.nn as _nn
timm = types.ModuleType("timm")
timm_m = types.ModuleType("timm.models")
timm_l = types.ModuleType("timm.models.layers")
class DropPath(_nn.Module):
    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob
    def forward(self, x): return x
def to_2tuple(x): return x if isinstance(x, tuple) else (x, x)
def trunc_normal_(t, mean=0., std=1., a=-2., b=2.):
    with __import__('torch').no_grad():
        t.normal_(mean, std).clamp_(a * std, b * std)
    return t
timm_l.DropPath = DropPath; timm_l.to_2tuple = to_2tuple; timm_l.trunc_normal_ = trunc_normal_
timm.models = timm_m; timm_m.layers = timm_l
for _n, _m in [("timm", timm), ("timm.models", timm_m), ("timm.models.layers", timm_l)]:
    _m.__spec__ = _mach.ModuleSpec(_n, None)
    sys.modules.setdefault(_n, _m)

# py3.12: 'imp' removed; shim load_source via importlib
imp_mod = types.ModuleType("imp")
def _load_source(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m
imp_mod.load_source = _load_source
imp_mod.__spec__ = _mach.ModuleSpec("imp", None)
sys.modules.setdefault("imp", imp_mod)

# pycocotools stub (mask utils never called for key dumping)
pct = types.ModuleType("pycocotools")
pct_m = types.ModuleType("pycocotools.mask")
for _f in ("encode", "decode", "frPyObjects", "area", "toBbox", "iou", "merge"):
    setattr(pct_m, _f, lambda *a, **k: None)
pct.mask = pct_m
for _n, _m in [("pycocotools", pct), ("pycocotools.mask", pct_m)]:
    _m.__spec__ = _mach.ModuleSpec(_n, None)
    sys.modules.setdefault(_n, _m)
# cv2 stub just in case
if "cv2" not in sys.modules:
    cv2 = types.ModuleType("cv2"); cv2.__spec__ = _mach.ModuleSpec("cv2", None)
    cv2.__file__ = "/dev/null"
    cv2.__getattr__ = lambda name: (_ for _ in ()).throw(AttributeError(name)) if name.startswith("__") else (lambda *a, **k: None)
    sys.modules["cv2"] = cv2

# torchvision.transforms stub
tv_tr = types.ModuleType("torchvision.transforms")
tv_tr.__spec__ = _mach.ModuleSpec("torchvision.transforms", None)
class _T:
    def __init__(self, *a, **k): pass
    def __call__(self, x): return x
for _f in ("Compose", "ToTensor", "Normalize", "Resize", "ColorJitter",
           "RandomHorizontalFlip", "ToPILImage", "CenterCrop"):
    setattr(tv_tr, _f, _T)
tv.transforms = tv_tr
sys.modules.setdefault("torchvision.transforms", tv_tr)

tv_ds = types.ModuleType("torchvision.datasets")
tv_ds.__spec__ = _mach.ModuleSpec("torchvision.datasets", None)
class _DS:
    def __init__(self, *a, **k): pass
for _f in ("CocoDetection", "ImageFolder", "VisionDataset", "CocoCaptions"):
    setattr(tv_ds, _f, _DS)
tv.datasets = tv_ds
sys.modules.setdefault("torchvision.datasets", tv_ds)

tv_ds.__path__ = []  # mark as package
tv_dsv = types.ModuleType("torchvision.datasets.vision")
tv_dsv.__spec__ = _mach.ModuleSpec("torchvision.datasets.vision", None)
class VisionDataset:
    def __init__(self, *a, **k): pass
tv_dsv.VisionDataset = VisionDataset
tv_ds.vision = tv_dsv
sys.modules.setdefault("torchvision.datasets.vision", tv_dsv)

pct.__path__ = []
pct_c = types.ModuleType("pycocotools.coco")
pct_c.__spec__ = _mach.ModuleSpec("pycocotools.coco", None)
class COCO:
    def __init__(self, *a, **k): pass
pct_c.COCO = COCO
pct.coco = pct_c
sys.modules.setdefault("pycocotools.coco", pct_c)
pct_e = types.ModuleType("pycocotools.cocoeval")
pct_e.__spec__ = _mach.ModuleSpec("pycocotools.cocoeval", None)
class COCOeval:
    def __init__(self, *a, **k): pass
pct_e.COCOeval = COCOeval
pct.cocoeval = pct_e
sys.modules.setdefault("pycocotools.cocoeval", pct_e)

tv_tr.__path__ = []
tv_trf = types.ModuleType("torchvision.transforms.functional")
tv_trf.__spec__ = _mach.ModuleSpec("torchvision.transforms.functional", None)
tv_trf.__getattr__ = lambda name: (_ for _ in ()).throw(AttributeError(name)) if name.startswith("__") else (lambda *a, **k: None)
tv_trf.__file__ = "/dev/null"
tv_tr.functional = tv_trf
sys.modules.setdefault("torchvision.transforms.functional", tv_trf)

pt = types.ModuleType("prettytable")
pt.__spec__ = _mach.ModuleSpec("prettytable", None)
class PrettyTable:
    def __init__(self, *a, **k): self.rows = []
    def add_row(self, *a, **k): pass
    def __str__(self): return ""
pt.PrettyTable = PrettyTable
sys.modules.setdefault("prettytable", pt)

# old-transformers API moved to pytorch_utils in new versions
import transformers.modeling_utils as _mu
try:
    from transformers import pytorch_utils as _ptu
    for _f in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(_mu, _f) and hasattr(_ptu, _f):
            setattr(_mu, _f, getattr(_ptu, _f))
except ImportError:
    pass

for _nm in ("ftfy", "regex", "einops", "nltk", "inflect"):
    if _nm in sys.modules:
        continue
    try:
        __import__(_nm)
    except ImportError:
        _m = types.ModuleType(_nm)
        _m.__spec__ = _mach.ModuleSpec(_nm, None)
        _m.__file__ = "/dev/null"
        _m.__getattr__ = (lambda _mm: (lambda name: (_ for _ in ()).throw(AttributeError(name)) if name.startswith("__") else (lambda *a, **k: None)))(_m)
        sys.modules[_nm] = _m

# transformers' own BertConfig.from_pretrained -> default config (bert-base)
from transformers.models.bert import configuration_bert as _tcb
_tcb.BertConfig.from_pretrained = classmethod(lambda cls, name, **kw: cls())

# reference latent bug (SURVEY §5 #2): register_buffer('all_keys', []) after
# plain attribute assignment raises on modern torch; skip the duplicate.
import torch.nn as _tnn
_orig_rb = _tnn.Module.register_buffer
def _safe_rb(self, name, tensor, persistent=True):
    try:
        return _orig_rb(self, name, tensor, persistent)
    except (KeyError, TypeError):
        return None
_tnn.Module.register_buffer = _safe_rb
'''

GLIP = r'''"""Dump the reference GLIP-T(A)+LPI model's state_dict key+shape manifest.

Builds the reference torch model class offline (stubbed _C extension,
from_pretrained patched to local constructions) and writes `<key> <shape>`
lines. This is the exact namespace `glip_a_tiny_o365.pth` populates (modulo
model_serialization remaps) — vendored as test data for converter coverage.
"""
import os, sys, types
os.environ["HF_HUB_OFFLINE"] = "1"
os.environ["TRANSFORMERS_OFFLINE"] = "1"
sys.path.insert(0, '/root/reference/grounding')

stub = types.ModuleType('maskrcnn_benchmark._C')
for fn in ['nms','ml_nms','soft_nms','roi_align_forward','roi_align_backward',
           'roi_pool_forward','roi_pool_backward','sigmoid_focalloss_forward',
           'sigmoid_focalloss_backward','deform_conv_forward','deform_conv_backward_input',
           'deform_conv_backward_parameters','modulated_deform_conv_forward',
           'modulated_deform_conv_backward','deform_psroi_pooling_forward',
           'deform_psroi_pooling_backward']:
    setattr(stub, fn, lambda *a, **k: None)
sys.modules['maskrcnn_benchmark._C'] = stub

# offline patches
from maskrcnn_benchmark.modeling.bert import configuration_bert, modeling_bert
configuration_bert.BertConfig.from_pretrained = classmethod(
    lambda cls, name, **kw: cls())  # default BertConfig IS bert-base-uncased
_real_bm_init = modeling_bert.BertModel.__init__
def _from_pretrained(name, add_pooling_layer=True, config=None, **kw):
    return modeling_bert.BertModel(config, add_pooling_layer=add_pooling_layer)
modeling_bert.BertModel.from_pretrained = staticmethod(_from_pretrained)

import transformers
class _DummyTok:
    vocab_size = 30522
    def __call__(self, *a, **k): raise RuntimeError("dummy")
    def get_vocab(self): return {"[PAD]": 0, "[UNK]": 100, "[CLS]": 101,
                                 "[SEP]": 102, "[MASK]": 103, ".": 1012}
    def convert_tokens_to_ids(self, t): return 0
    def tokenize(self, *a, **k): return []
transformers.AutoTokenizer.from_pretrained = classmethod(lambda cls, *a, **k: _DummyTok())

from maskrcnn_benchmark.config import cfg
cfg.merge_from_file('/root/reference/grounding/configs/refcoco/val/finetune_A_decompose_interact_layer_task.yaml')
# the run applies the yaml's TUNING_HIGHLEVEL_OVERRIDE (language_prompt_v4:
# LINEAR_PROB + ADD_LINEAR_LAYER) BEFORE building (finetune.py:516-519)
import sys as _sys
_sys.path.insert(0, '/root/reference/grounding/tools')
from finetune import tuning_highlevel_override
tuning_highlevel_override(cfg)
from maskrcnn_benchmark.modeling.detector import build_detection_model
m = build_detection_model(cfg)
sd = m.state_dict()
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/gen/glip_manifest.txt'
with open(out, 'w') as f:
    for k, v in sd.items():
        f.write(f"{k} {','.join(str(s) for s in v.shape)}\n")
print(len(sd), "keys ->", out)
'''

CLIP = r'''"""Dump OpenAI CLIP ViT-B/16 state_dict key+shape manifest from the
reference's vendored torch CLIP class (retrieval/models/clip/model.py)."""
sys.path.insert(0, '/root/reference/retrieval')
from models.clip.model import CLIP
m = CLIP(embed_dim=512, image_resolution=224, vision_layers=12,
         vision_width=768, vision_patch_size=16, context_length=77,
         vocab_size=49408, transformer_width=512, transformer_heads=8,
         transformer_layers=12)
sd = m.state_dict()
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/gen/clip_manifest.txt'
with open(out, 'w') as f:
    for k, v in sd.items():
        f.write(f"{k} {','.join(str(s) for s in v.shape)}\n")
print(len(sd), "keys ->", out)
'''

if __name__ == "__main__":
    import sys

    which = sys.argv[1]
    sys.argv = [sys.argv[0]] + sys.argv[2:]
    exec(compile(SHIM, "shim", "exec"))
    exec(compile(GLIP if which == "glip" else CLIP, which, "exec"))
