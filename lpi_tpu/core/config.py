"""Typed configuration tree for the whole framework.

Replaces the reference's two config systems — the flat argparse/JSON dict of
the retrieval half (`/root/reference/retrieval/main.py:18-20`) and the yacs
CfgNode tree of the grounding half
(`/root/reference/grounding/maskrcnn_benchmark/config/defaults.py`) — with a
single dataclass tree. The `LPIPromptConfig` section mirrors the reference's
`MODEL.LPAI` keys (`defaults.py:844-860`).

Configs are plain frozen dataclasses so they are hashable and can be passed
as static arguments through `jax.jit`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


def _freeze(seq):
    return tuple(seq)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. One mesh, named axes; collectives ride ICI.

    `data` shards the batch; `model` is reserved for tensor-parallel layouts
    of the towers (unused by parity configs but the plumbing supports it).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all available devices
    model_parallel: int = 1


@dataclass(frozen=True)
class LPIPromptConfig:
    """The LPI mechanism knobs (reference `MODEL.LPAI`, defaults.py:844-860)."""

    prompt_type: str = "lpi"  # lpi | sprompts | l2p | maple
    prompt_length: int = 16  # tokens per prompt (PROMPT_LENGTH)
    prompt_depth: int = 9  # layers that receive prompts (PROMPT_DEPTH)
    prompt_rank: int = 4  # CP rank of DecomposedPrompt (PROMPT_LORA_D)
    interact: bool = True  # cross-modal interaction net (INTERACT)
    interact_rank: int = 4  # CP rank of InteractModule (INTERACT_LORA_D)
    interact_depth: int = 9  # layers that run interaction (INTERACT_DEPTH)
    interact_type: str = "linear"  # linear | maple | l2p | dcp
    task_alignment: bool = True  # inter-task contrastive loss (TASK_ALIGNMENT)
    layer_alignment: bool = True  # cross-modal alignment loss (LAYER_ALIGNMENT)
    alignment_weight: float = 0.1  # slinet.py:158
    task_loss_weight: float = 0.1  # slinet.py:161
    alignment_temperature: float = 0.01  # slinet.py:145
    task_temperature: float = 0.001  # slinet.py:182
    task_sim_threshold: float = 0.4  # slinet.py:173
    # Depth of per-layer injection actually applied. The reference's deep
    # injection is dead code in the retrieval half (clip/model.py:190 gate is
    # always false); depth=1 reproduces that input-only behavior.
    injection_depth: int = 1
    # L2P baseline pool geometry (`slinet.py:42`, L2pPrompt(length=4, top_k=4))
    l2p_length: int = 4
    l2p_top_k: int = 4


@dataclass(frozen=True)
class CLIPConfig:
    """CLIP ViT-B/16 dual encoder (reference vendored OpenAI CLIP)."""

    image_resolution: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512
    n_ctx: int = 16  # CoOp context length (cfgc.NCTX, prompt_learner.py:224)
    class_token_position: str = "end"
    logit_scale_init: float = 4.6052  # ln(100), OpenAI CLIP init
    # 'bf16' (default) = hand-rolled attention keeping the [B,H,S,S]
    # score/prob tensors in the compute dtype — identical math to 'xla'
    # under a fp32 model dtype; 'xla' = jax.nn.dot_product_attention, which
    # materializes fp32 logits + fp32 softmax residuals (~2x the attention
    # HBM stream at S=213). Measured r4 at b64 with remat='dots_nb':
    # bf16 762.6 vs xla 620.8 samples/s. (A Pallas flash-attention wrapper
    # was measured at 330 samples/s — the generic kernel pads 213->256 and
    # loses at this seq length — and deleted per the no-dead-kernels rule.)
    attn_impl: str = "bf16"
    # Tower-block remat policy: 'none' (default) saves everything, 'dots_nb'
    # saves non-batched dot results and recomputes attention + elementwise
    # chains in backward, 'dots' also saves the [B,H,S,S] logits. The right
    # choice COUPLES with tower_unroll (b64 bf16, v5e, r5 sweep): under a
    # SCANNED tower (unroll=1) XLA forces whole-block remat when nothing is
    # marked saveable, so policy remat wins there (none 618.0 / dots 709.8
    # / dots_nb 760.1 samples/s); with the tower UNROLLED the scheduler
    # keeps exactly the residuals it needs and 'none' wins outright
    # (dots_nb 985.4 / none 1037.7 samples/s — the flagship default).
    remat: str = "none"
    # lax.scan unroll factor for the tower scans: >= layers = fully
    # unrolled (default), letting XLA fuse LN/residual/cast chains across
    # layer boundaries and schedule the whole tower as one stream —
    # measured 760.1 (scanned, dots_nb) -> 1037.7 samples/s (unrolled,
    # none) on the b64 retrieval train step (r5 sweep; ~12x program size,
    # compile time is not latency-critical for training). 1 = smallest
    # program (parity-scale CPU compiles).
    tower_unroll: int = 12


@dataclass(frozen=True)
class RetrievalConfig:
    """Continual retrieval run (reference `retrieval/configs/lpi/coco_lpi.json`)."""

    clip: CLIPConfig = field(default_factory=CLIPConfig)
    lpi: LPIPromptConfig = field(default_factory=LPIPromptConfig)
    total_sessions: int = 12
    epochs: int = 10
    batch_size: int = 64
    lr: float = 0.05
    weight_decay: float = 2e-4
    momentum: float = 0.9
    seed: int = 1993
    num_key_clusters: int = 5  # KMeans k per task (sprompt.py:370)
    eval_text_chunk: int = 256
    visual_dim: int = 768
    textual_dim: int = 512
    # Hardcoded 12-session category order, retrieval/utils/data.py:327-343.
    task_order: Sequence[int] = (11, 6, 3, 10, 5, 12, 7, 9, 2, 8, 4, 1)
    dtype: str = "bfloat16"  # compute dtype; params stay fp32


@dataclass(frozen=True)
class SwinConfig:
    """Swin-T (GLIP visual tower)."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    ape: bool = False
    drop_path_rate: float = 0.2
    out_stages: Sequence[int] = (2, 3, 4)  # feed FPN


@dataclass(frozen=True)
class BertConfig:
    """BERT-base (GLIP language tower)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    max_query_len: int = 256  # MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN
    num_pooled_layers: int = 1  # N_LAYERS mean-pooled into aggregate


@dataclass(frozen=True)
class DyHeadConfig:
    """VLDyHead (GLIP detection head)."""

    num_convs: int = 6
    channels: int = 256
    # MODEL.DYHEAD.NUM_CLASSES (incl. background, `defaults.py:425`); the
    # cls_logits conv emits num_classes-1 channels — dead under the
    # dot-product token loss (frozen, `generalized_vl_rcnn.py:152-156`) but
    # present in GLIP checkpoints
    num_classes: int = 81
    use_dyrelu: bool = True
    use_dyfuse: bool = True
    use_dfconv: bool = True
    # deformable-conv implementation: "fast" = matmul-first windowed
    # (gather-free, offsets clamped to +-deform_window px — exact for
    # trained GLIP offsets), "fast_scan" = same math, tap loop scanned
    # (~9x smaller compiled program), "pallas" = same math, displacement
    # accumulation in a VMEM-resident Pallas kernel (smallest program,
    # fastest; stride-2 convs fall back to fast_scan), "exact" =
    # bilinear-gather reference semantics. v5e tower-grad measurements in
    # `ops/deform_conv.py:deform_conv2d_pallas` docstring.
    deform_impl: str = "pallas"
    deform_window: int = 3
    # product-map dtype for the pallas deform impl: "bfloat16" halves the
    # kernel's HBM stream (offsets and in-kernel accumulation stay fp32;
    # tracks fp32 to ~0.2% in fwd and grads) — measured 126.2 -> 112.4
    # ms/step on the 448px/b4 train step (round-4 profile); "float32" is
    # bit-exact vs the golden gather op. "auto" (default) follows the
    # model dtype: a float32 config must not silently run deform in bf16
    # (a bf16 default regressed the f32 accuracy gate's task-ID accuracy
    # 0.875 -> 0.722 — caught by rerunning the gate, round 4)
    deform_dtype: str = "auto"
    # remat of the deform product map: "on" always replays it in backward
    # (lowest HBM residency), "off" always saves it (no replay stream),
    # "auto" (default) saves it only when this conv's map is < 128 MB —
    # the 448px/b4 recipe keeps ~80 MB/conv (~1.3 GB total) resident and
    # skips the replay; 800px or b16 shapes remat (HBM OOM otherwise)
    deform_remat: str = "auto"
    log_scale: float = 0.0
    prior_prob: float = 0.01
    early_fuse: bool = False  # EARLY_FUSE_ON: False in LPI configs
    fuse_embed_dim: int = 2048  # FUSE_CONFIG.EMBED_DIM
    fuse_heads: int = 8
    add_linear_layer: bool = True  # tunable_linear, language_prompt_v4
    max_tokens: int = 256


@dataclass(frozen=True)
class ATSSConfig:
    """ATSS matcher + losses (reference rpn/loss.py:518)."""

    topk: int = 9
    anchor_sizes: Sequence[int] = (64, 128, 256, 512, 1024)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    aspect_ratios: Sequence[float] = (1.0,)
    scales_per_octave: int = 1
    octave: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    reg_loss_weight: float = 2.0
    pre_nms_top_n: int = 1000
    nms_thresh: float = 0.6
    fpn_post_nms_top_n: int = 100
    inference_thresh: float = 0.05


@dataclass(frozen=True)
class KnowledgeConfig:
    """GLIP-KNOW knowledge prompts (reference `defaults.py:872-879`,
    GLIPKNOW.*; off in every LPI config)."""

    knowledge_file: str = ""  # KNOWLEDGE_FILE
    knowledge_type: str = ""  # KNOWLEDGE_TYPE: "" | def_wiki | gpt3 | ...
    max_classes_per_batch: int = -1  # MAX_NUM_CLASSES_PER_BATCH_TRAIN
    parallel_language_input: bool = False  # PARALLEL_LANGUAGE_INPUT
    lan_feature_agg_type: str = "first"  # LAN_FEATURE_AGG_TYPE: first | mean
    gpt3_num: int = 5  # GPT3_NUM
    wiki_and_gpt3: bool = False  # WIKI_AND_GPT3


@dataclass(frozen=True)
class GroundingConfig:
    """Continual grounding run (reference finetune_A_decompose_interact_layer_task.yaml)."""

    swin: SwinConfig = field(default_factory=SwinConfig)
    bert: BertConfig = field(default_factory=BertConfig)
    dyhead: DyHeadConfig = field(default_factory=DyHeadConfig)
    atss: ATSSConfig = field(default_factory=ATSSConfig)
    lpi: LPIPromptConfig = field(default_factory=lambda: LPIPromptConfig(prompt_depth=9, interact_depth=9))
    total_tasks: int = 12
    epochs_per_task: int = 5  # LPAI.EPOCH
    # MODEL.FPN.USE_GN — default False in the reference (`defaults.py:277`;
    # the LPI yaml's USE_GN True is DYHEAD's); True adds the GN-conv variant
    fpn_use_gn: bool = False
    batch_size: int = 16  # IMS_PER_BATCH
    lr: float = 0.01
    weight_decay: float = 0.05
    grad_clip: float = 1.0
    seed: int = 0
    num_key_clusters: int = 5
    proposal_loss_weight: float = 0.8  # generalized_vl_rcnn.py:400-433
    # the reference's ACTUAL train/eval resolution: build_transforms
    # hardcodes Resize(448, 448, restrict=True) (`data/transforms/build.py:
    # 36-41`), overriding the yaml's 800/1333 (see data/transforms.py)
    image_size: int = 448
    # FusedDualEncoder.scan_unroll. 1 = scanned lockstep body (fast XLA:CPU
    # compile; the multi-chip dryrun and CPU tests need this). 99 = fully
    # unrolled: measured 43.48 vs 41.85 samples/s at 448px/b4 on v5e
    # (scripts/sweep_grounding.py, r5) — set it for real TPU training runs.
    fused_scan_unroll: int = 1
    max_boxes: int = 100  # static padding of per-image GT boxes
    dtype: str = "bfloat16"
    knowledge: KnowledgeConfig = field(default_factory=KnowledgeConfig)


@dataclass(frozen=True)
class Config:
    """Root config: one of the two halves is active per run."""

    task: str = "retrieval"  # retrieval | grounding
    mesh: MeshConfig = field(default_factory=MeshConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    grounding: GroundingConfig = field(default_factory=GroundingConfig)
    output_dir: str = "res"
    checkpoint_dir: str = "checkpoints"


def _update_dataclass(obj: Any, updates: Mapping[str, Any]) -> Any:
    """Recursively apply a nested mapping of overrides to a dataclass tree."""
    kwargs = {}
    names = {f.name: f for f in dataclasses.fields(obj)}
    for key, value in updates.items():
        if key not in names:
            raise KeyError(f"unknown config key {key!r} for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, Mapping):
            kwargs[key] = _update_dataclass(current, value)
        elif isinstance(current, tuple) and isinstance(value, (list, tuple)):
            kwargs[key] = _freeze(value)
        else:
            kwargs[key] = value
    return dataclasses.replace(obj, **kwargs)


def load_config(path: str | None = None, overrides: Mapping[str, Any] | None = None) -> Config:
    """Build a Config from an optional JSON file plus nested overrides.

    The JSON layout is the nested dataclass layout (e.g.
    `{"retrieval": {"epochs": 1}}`), replacing both the reference's flat JSON
    and its yacs YAML trees.
    """
    cfg = Config()
    if path is not None:
        with open(path) as f:
            cfg = _update_dataclass(cfg, json.load(f))
    if overrides:
        cfg = _update_dataclass(cfg, overrides)
    return cfg


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)
