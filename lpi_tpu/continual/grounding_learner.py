"""Continual grounding learner — the 12-task GLIP loop.

TPU-native equivalent of `grounding/tools/finetune.py:58-340` +
`engine/trainer.py:47-298`: per task a fresh AdamW(lr, wd) with full-update
clipping and per-epoch cosine annealing over ONLY `prompts[task]` +
`interact[task]` (`finetune.py:193-234`), ATSS grounding losses x0.8 +
alignment x0.1 + inter-task x0.1 (`generalized_vl_rcnn.py:400-513`), NaN
losses zeroed (`engine/trainer.py:134-136`), then KMeans task keys over
frozen P7 features and evaluation over all seen tasks with task-ID
inference.
"""

from __future__ import annotations

import time as _time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from flax.core import unfreeze

from lpi_tpu.core.config import GroundingConfig
from lpi_tpu.core import mesh as mesh_lib
from lpi_tpu.continual.keys import TaskKeys, infer_task_ids
from lpi_tpu.data.grounding import GroundingTaskSet
from lpi_tpu.eval.refexp import RefExpEvaluator
from lpi_tpu.models.glip.atss import atss_losses
from lpi_tpu.models.glip.grounding import GroundedVLModel, grounding_aux_losses
from lpi_tpu.models.glip.postprocess import atss_postprocess_batch
from lpi_tpu.ops.kmeans import kmeans

from lpi_tpu.continual.common import merge_params as _merge
from lpi_tpu.continual.common import split_params as _common_split

POOL_KEYS = ("prompts", "interact")


def _split_params(params: dict):
    return _common_split(params, POOL_KEYS)


class GroundingLearner:
    def __init__(self, cfg: GroundingConfig, mesh=None,
                 task_sim_matrix: Optional[np.ndarray] = None,
                 init_params: Optional[dict] = None,
                 sample_batch: Optional[dict] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.model = GroundedVLModel(cfg)
        if sample_batch is None:
            raise ValueError("GroundingLearner needs a sample_batch for shape init")
        key = jax.random.PRNGKey(cfg.seed)
        # jit(init): one compile instead of hundreds of eager dispatches
        variables = jax.jit(self.model.init)(
            key, jnp.asarray(sample_batch["images"]),
            jnp.asarray(sample_batch["input_ids"]),
            jnp.asarray(sample_batch["attention_mask"]), 0)
        params = unfreeze(variables["params"])
        if init_params is not None:
            flat = traverse_util.flatten_dict(params)
            for k, v in traverse_util.flatten_dict(unfreeze(init_params)).items():
                if k in flat:
                    flat[k] = jnp.asarray(v)
            params = traverse_util.unflatten_dict(flat)
        self.params = params
        if mesh is not None:
            # TP layouts over the model axis when present (see core/mesh.py);
            # plain replication on a dp-only mesh
            self.params = mesh_lib.shard_params(mesh, self.params)

        T = cfg.total_tasks
        sim = np.eye(T, dtype=np.float32) if task_sim_matrix is None else np.asarray(task_sim_matrix)
        self.task_relation = jnp.asarray(
            (sim > cfg.lpi.task_sim_threshold).astype(np.float32))
        self.keys: Optional[TaskKeys] = None  # created lazily (dim = P7 flat)
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    def _losses(self, pools, frozen, batch, task_id: int):
        cfg = self.cfg
        params = _merge(pools, frozen)
        flat, language, vis_p, txt_p = self.model.apply(
            {"params": params}, batch["images"], batch["input_ids"],
            batch["attention_mask"], task_id)
        det = atss_losses(
            flat["anchors"], tuple(flat["level_counts"]),
            flat["bbox_pred"], flat["centerness"], flat["dot_logits"],
            batch["gt_boxes"], batch["gt_valid"], batch["positive_map"],
            batch["attention_mask"], topk=cfg.atss.topk,
            reg_loss_weight=cfg.atss.reg_loss_weight)
        w = cfg.proposal_loss_weight
        losses = {
            "loss_reg": w * det["loss_reg"],
            "loss_centerness": w * det["loss_centerness"],
            "loss_dot_product_token": w * det["loss_dot_product_token"],
        }
        vis_all, txt_all = self.model.apply(
            {"params": params}, method=self.model.all_task_prompts)
        losses.update(grounding_aux_losses(
            vis_p, txt_p, vis_all, txt_all, task_id, self.task_relation, cfg))
        # NaN-loss zeroing (engine/trainer.py:134-136)
        losses = {k: jnp.where(jnp.isfinite(v), v, 0.0) for k, v in losses.items()}
        total = sum(losses.values())
        return total, {**losses, "num_pos": det["num_pos"]}

    def _tx(self):
        """One optimizer for every session: the learning rate is injected
        per call so the jitted step never rebakes the schedule."""
        if getattr(self, "_tx_cached", None) is None:
            cfg = self.cfg
            self._tx_cached = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.inject_hyperparams(optax.adamw)(
                    learning_rate=0.0, weight_decay=cfg.weight_decay),
            )
        return self._tx_cached

    def _jit_step_kwargs(self):
        """Pin step outputs (pools, opt_state, metrics) to committed
        replicated sharding when a mesh is present — otherwise GSPMD picks
        output shardings, the second call's signature differs, and the step
        compiles twice (measured +307 s on the 8-device CPU dryrun, r5)."""
        if self.mesh is None:
            return {}
        rep = mesh_lib.replicated(self.mesh)
        return {"out_shardings": (rep, rep, rep)}

    def _jitted_step(self):
        """Task id and lr are TRACED inputs, so this compiles ONCE per run
        and serves all 12 sessions (vs one multi-minute recompile per task)."""
        if getattr(self, "_step_cached", None) is None:
            tx = self._tx()

            @partial(jax.jit, donate_argnums=(0, 1), **self._jit_step_kwargs())
            def step(pools, opt_state, frozen, batch, task_id, lr):
                clip_state, inj = opt_state
                inj = inj._replace(
                    hyperparams=dict(inj.hyperparams, learning_rate=lr))
                (total, metrics), grads = jax.value_and_grad(
                    self._losses, has_aux=True)(pools, frozen, batch, task_id)
                onehot = {
                    k: jax.nn.one_hot(task_id, v.shape[0], dtype=v.dtype).reshape(
                        (v.shape[0],) + (1,) * (v.ndim - 1))
                    for k, v in grads.items()}
                grads = {k: g * onehot[k] for k, g in grads.items()}
                updates, opt_state = tx.update(grads, (clip_state, inj), pools)
                updates = {k: u * onehot[k] for k, u in updates.items()}
                pools = optax.apply_updates(pools, updates)
                return pools, opt_state, {"total": total, **metrics}

            self._step_cached = step
        return self._step_cached

    def _make_step(self, task_id: int, steps_per_epoch: int, epochs: int):
        import math

        cfg = self.cfg
        jitted = self._jitted_step()
        tid = jnp.int32(task_id)
        counter = {"n": 0}
        # torch CosineAnnealingLR stepped per epoch (host-side python — no
        # schedule constants baked into the compiled program). The per-epoch
        # values are staged to the device ONCE: a fresh `jnp.float32(lr)`
        # per step is a host->device RPC on the tunneled chip
        lrs = [jnp.float32(cfg.lr * 0.5 * (1.0 + math.cos(math.pi * e / epochs)))
               for e in range(epochs + 1)]

        def step(pools, opt_state, frozen, batch):
            epoch = counter["n"] // max(steps_per_epoch, 1)
            counter["n"] += 1
            return jitted(pools, opt_state, frozen, batch, tid,
                          lrs[min(epoch, epochs)])

        return self._tx(), step

    def pretrain(self, dataset: GroundingTaskSet, steps: int,
                 lr: Optional[float] = None) -> Dict[str, float]:
        """Full-parameter training (no task-pool mask) — the reference's
        `tuning_highlevel_override` FULL preset (`finetune.py:392-437`,
        TUNING_HIGHLEVEL_OVERRIDE='full' trains everything). Used to build a
        base detector before the continual prompt loop (the role GLIP-T(A)
        pretraining plays for the real recipe) and by the accuracy gate.
        """
        cfg = self.cfg
        lr = cfg.lr if lr is None else lr
        if getattr(self, "_full_step", None) is None:
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.inject_hyperparams(optax.adamw)(
                    learning_rate=0.0, weight_decay=cfg.weight_decay))
            self._full_tx = tx

            @partial(jax.jit, donate_argnums=(0, 1), **self._jit_step_kwargs())
            def step(params, opt_state, batch, lr):
                clip_state, inj = opt_state
                inj = inj._replace(
                    hyperparams=dict(inj.hyperparams, learning_rate=lr))

                def loss_fn(p):
                    pools, frozen = _split_params(p)
                    return self._losses(pools, frozen, batch, 0)

                (total, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, (clip_state, inj), params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, {"total": total, **metrics}

            self._full_step = step
        params = self.params
        opt_state = self._full_tx.init(params)
        if self.mesh is not None:
            opt_state = mesh_lib.replicate(self.mesh, opt_state)
        metrics = {}
        it = iter([])
        for n in range(steps):
            try:
                batch = next(it)
            except StopIteration:
                it = dataset.batches(cfg.batch_size, seed=cfg.seed + n)
                batch = next(it)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if self.mesh is not None:
                batch = mesh_lib.shard_batch(self.mesh, batch)
            params, opt_state, metrics = self._full_step(
                params, opt_state, batch, jnp.float32(lr))
        self.params = params
        return {k: float(v) for k, v in metrics.items()}

    def train_task(self, dataset: GroundingTaskSet,
                   epochs: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        task_id = dataset.task_index
        epochs = epochs or cfg.epochs_per_task
        steps_per_epoch = max(len(dataset) // cfg.batch_size, 1)
        tx, step = self._make_step(task_id, steps_per_epoch, epochs)
        pools, frozen = _split_params(self.params)
        opt_state = tx.init(pools)
        if self.mesh is not None:
            # commit fresh state replicated so call 1 matches the pinned
            # output shardings — one compile total (see _jit_step_kwargs)
            opt_state = mesh_lib.replicate(self.mesh, opt_state)
        metrics = {}
        t0 = _time.perf_counter()
        steps = 0
        for epoch in range(epochs):
            for batch in dataset.batches(cfg.batch_size, seed=cfg.seed + epoch):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if self.mesh is not None:
                    batch = mesh_lib.shard_batch(self.mesh, batch)
                pools, opt_state, metrics = step(pools, opt_state, frozen, batch)
                steps += 1
        out = {k: float(v) for k, v in metrics.items()}
        dt = _time.perf_counter() - t0
        out["samples_per_sec"] = steps * cfg.batch_size / max(dt, 1e-9)
        self.params = _merge(pools, frozen)
        self.cluster_task(dataset)
        return out

    # ------------------------------------------------------------------
    def _jit(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def extract_features(self, images) -> jnp.ndarray:
        # task-ID decision path at full f32 matmul precision: key features
        # from a near-collapsed promptless forward sit within bf16-pass
        # rounding of each other, and TPU default precision flipped the
        # on-chip gate's task-ID accuracy to 0.681 vs CPU's 0.875 (r5).
        # Eval-time only — the train step never calls this.
        def fwd(p, x):
            with jax.default_matmul_precision("highest"):
                return self.model.apply({"params": p}, x,
                                        method=self.model.extract_features)

        return self._jit("extract", fwd)(self.params, jnp.asarray(images))

    def cluster_task(self, dataset: GroundingTaskSet):
        cfg = self.cfg
        feats = []
        for batch in dataset.batches(cfg.batch_size, seed=0, drop_remainder=False):
            feats.append(self.extract_features(batch["images"]))
        feats = jnp.concatenate(feats)[: len(dataset)]
        if self.keys is None:
            self.keys = TaskKeys.create(cfg.total_tasks, cfg.num_key_clusters,
                                        feats.shape[-1])
        centers, _ = kmeans(jax.random.PRNGKey(0), feats, k=cfg.num_key_clusters)
        self.keys = self.keys.update(dataset.task_index, centers)

    # ------------------------------------------------------------------
    def restore(self, checkpointer, session: Optional[int] = None) -> int:
        """Load frozen base + a task's pools/keys; returns the task index."""
        session = checkpointer.latest_session() if session is None else session
        if session is None:
            raise ValueError("checkpoint directory has no sessions")
        base = checkpointer.load_base()
        state = checkpointer.load_session(session)
        flat = dict(traverse_util.flatten_dict(base))
        flat.update(traverse_util.flatten_dict(state["pool_params"]))
        self.params = traverse_util.unflatten_dict(
            {k: jnp.asarray(v) for k, v in flat.items()})
        if "visual_keys" in state:
            self.keys = TaskKeys(
                centers=jnp.asarray(state["visual_keys"]["centers"]),
                valid=jnp.asarray(state["visual_keys"]["valid"]))
        return session

    def evaluate(self, task_sets: Dict[int, GroundingTaskSet],
                 batch_size: Optional[int] = None) -> dict:
        """Inference over all seen tasks' eval sets with task-ID selection
        (`engine/inference.py:392-680`)."""
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        fwd = self._jit("forward_tasks", lambda p, im, ids, m, t: self.model.apply(
            {"params": p}, im, ids, m, t, method=self.model.forward_tasks))

        evaluator = RefExpEvaluator()
        taskid_hits = 0
        taskid_total = 0
        for tid, ds in task_sets.items():
            for batch, real, indices in ds.eval_batches(bs):
                images = jnp.asarray(batch["images"])
                frozen_feats = self.extract_features(images)
                sel = infer_task_ids(frozen_feats, self.keys)
                taskid_hits += int(np.sum(np.asarray(sel)[:real] == tid))
                taskid_total += real
                flat, _ = fwd(self.params, images,
                              jnp.asarray(batch["input_ids"]),
                              jnp.asarray(batch["attention_mask"]), sel)
                anchors = flat["anchors"]
                counts = tuple(int(c) for c in flat["level_counts"])
                # one batched device program per eval batch (vmapped
                # postprocess), then a single host fetch
                out = atss_postprocess_batch(
                    anchors, counts,
                    flat["bbox_pred"], flat["centerness"],
                    flat["dot_logits"],
                    jnp.asarray(batch["positive_map"][:, :1]),  # [B,1,T]
                    pre_nms_top_n=min(cfg.atss.pre_nms_top_n, anchors.shape[0]),
                    post_nms_top_n=min(cfg.atss.fpn_post_nms_top_n,
                                       anchors.shape[0]),
                    nms_thresh=cfg.atss.nms_thresh,
                    pre_nms_thresh=cfg.atss.inference_thresh)
                out = {k: np.asarray(v) for k, v in out.items()}
                for b in range(real):
                    gv = batch["gt_valid"][b]
                    valid = out["valid"][b]
                    evaluator.update(
                        image_index=indices[b],
                        boxes=out["boxes"][b][valid],
                        scores=out["scores"][b][valid],
                        gt_box=batch["gt_boxes"][b][np.asarray(gv)][0],
                        task_index=tid)
        res = evaluator.summarize(num_tasks=max(task_sets.keys()) + 1)
        res["task_id_accuracy"] = taskid_hits / max(taskid_total, 1)
        return res
