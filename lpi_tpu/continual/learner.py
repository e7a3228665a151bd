"""Continual retrieval learner: the 12-session driver.

TPU-native equivalent of the reference's SPrompts method
(`retrieval/methods/sprompt.py:104-646`) + trainer (`retrieval/trainer.py`):

* per session: fresh SGD(momentum, cosine-per-epoch) over ONLY the current
  task's prompt-pool slices (gradients to the frozen towers are never
  computed — the loss is differentiated w.r.t. the pool subtree alone);
* loss = base InfoNCE + 0.1 x cross-modal alignment + 0.1 x inter-task
  contrastive (sessions >= 2), `slinet.py:137-183`;
* after each session: on-device KMeans task keys from frozen features;
* evaluation: per-sample task-ID inference -> batched prompt gather ->
  full feature matrices -> per-task R@k.

The train step is compiled ONCE per run: task id and learning rate are
traced inputs (inter-task loss is masked to tasks 0..task_id, the lr is
injected into the optimizer state), so all 12 sessions share the program.
Batches are sharded over the mesh's data axis, parameters replicated — XLA
inserts the all-gathers for the batch-global logits matrix.
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

from lpi_tpu.core.config import RetrievalConfig
from lpi_tpu.core import mesh as mesh_lib
from lpi_tpu.continual.keys import TaskKeys, infer_task_ids
from lpi_tpu.data.retrieval import RetrievalEvalSet, RetrievalTrainSet
from lpi_tpu.eval.retrieval import itm_eval
from lpi_tpu.losses import alignment_loss, clip_loss, task_prompt_loss_masked
from lpi_tpu.losses.clip_loss import global_clip_loss
from lpi_tpu.models.clip import SliNet
from lpi_tpu.ops.kmeans import kmeans

from lpi_tpu.continual.common import merge_params as _merge_params
from lpi_tpu.continual.common import split_params as _common_split

POOL_KEYS = ("prompts", "ctx_pool")


def _split_params(params: dict):
    """Partition into (pool_params, frozen_params) by path."""
    return _common_split(params, POOL_KEYS)


class RetrievalLearner:
    """Host-side continual driver around the jitted per-session train step."""

    def __init__(
        self,
        cfg: RetrievalConfig,
        mesh=None,
        task_sim_matrix: Optional[np.ndarray] = None,
        rng_seed: Optional[int] = None,
        init_params: Optional[dict] = None,
        sample_batch: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.model = SliNet(cfg)
        seed = cfg.seed if rng_seed is None else rng_seed
        key = jax.random.PRNGKey(seed)

        if sample_batch is None:
            r = cfg.clip.image_resolution
            sample_batch = {
                "images": np.zeros((2, r, r, 3), np.float32),
                "token_ids": np.zeros((2, cfg.clip.context_length), np.int32),
            }
        # jit(init): one compile instead of hundreds of eager dispatches
        variables = jax.jit(self.model.init)(
            key, jnp.asarray(sample_batch["images"]),
            jnp.asarray(sample_batch["token_ids"]), 0)
        params = unfreeze(variables["params"])
        if init_params is not None:  # pretrained CLIP weights
            flat = traverse_util.flatten_dict(params)
            incoming = traverse_util.flatten_dict(unfreeze(init_params))
            for k, v in incoming.items():
                if k in flat:
                    if flat[k].shape != v.shape:
                        raise ValueError(f"shape mismatch for {k}: {flat[k].shape} vs {v.shape}")
                    flat[k] = jnp.asarray(v)
            params = traverse_util.unflatten_dict(flat)
        self.params = params
        if mesh is not None:
            # TP layouts for the tower weights when the mesh has a model
            # axis (replication otherwise — identical to before on dp-only)
            self.params = mesh_lib.shard_params(mesh, self.params)

        T = cfg.total_sessions
        if task_sim_matrix is None:
            task_sim_matrix = np.eye(T, dtype=np.float32)
        rel = (np.asarray(task_sim_matrix) > cfg.lpi.task_sim_threshold).astype(np.float32)
        self.task_relation = jnp.asarray(rel)

        feat_dim = cfg.clip.embed_dim
        self.visual_keys = TaskKeys.create(T, cfg.num_key_clusters, feat_dim)
        self.textual_keys = TaskKeys.create(T, cfg.num_key_clusters, feat_dim)
        self.session_results: Dict[int, dict] = {}
        self._encode_cache: dict = {}

    # ------------------------------------------------------------------
    def _base_loss(self, img, txt, scale):
        """Batch-global InfoNCE. With a multi-device mesh the explicit
        local-loss formulation runs under shard_map (features stay sharded
        over `data`; the other tower is all-gathered over ICI, labels offset
        per shard — the reference's dormant `local_loss`,
        `retrieval/loss/loss.py:62-73`, made real). Dense fallback
        otherwise; tested gradient-equal in tests/test_losses.py."""
        mesh = self.mesh
        if mesh is None or mesh.shape[mesh.axis_names[0]] <= 1 \
                or img.shape[0] % mesh.shape[mesh.axis_names[0]] != 0:
            return clip_loss(scale * img @ txt.T)
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        axis = mesh.axis_names[0]
        fn = shard_map(
            partial(global_clip_loss, axis_name=axis), mesh,
            in_specs=(P(axis), P(axis), P()), out_specs=P(),
            check_rep=False)
        return fn(img, txt, scale)

    def _losses(self, pool_params, frozen_params, batch, task_id: int):
        cfg = self.cfg
        params = _merge_params(pool_params, frozen_params)
        img, txt, vis_p, txt_p, scale = self.model.apply(
            {"params": params}, batch["images"], batch["token_ids"], task_id)
        losses = {"base_loss": self._base_loss(img, txt, scale)}
        if cfg.lpi.prompt_type == "lpi":
            if cfg.lpi.layer_alignment:
                losses["alignment_loss"] = cfg.lpi.alignment_weight * alignment_loss(
                    vis_p, txt_p, cfg.lpi.alignment_temperature)
            if cfg.lpi.task_alignment:
                vis_all, txt_all = self.model.apply(
                    {"params": params}, method=self.model.all_task_prompts)
                T = vis_all.shape[0]
                # masked to tasks 0..task_id; 0 at session 0 (slinet.py:160-162)
                losses["task_loss"] = cfg.lpi.task_loss_weight * task_prompt_loss_masked(
                    vis_all.reshape(T, -1), txt_all.reshape(T, -1),
                    self.task_relation, task_id, cfg.lpi.task_temperature)
        total = sum(losses.values())
        return total, losses

    def _tx(self):
        """One optimizer for every session; lr injected per call."""
        if getattr(self, "_tx_cached", None) is None:
            cfg = self.cfg
            self._tx_cached = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.inject_hyperparams(optax.sgd)(
                    learning_rate=0.0, momentum=cfg.momentum),
            )
        return self._tx_cached

    def _jit_step_kwargs(self):
        """Pin step outputs (pools, opt_state, metrics) to committed
        replicated sharding when a mesh is present. Without this, GSPMD
        picks its own output shardings, the second call's inputs no longer
        match the first call's signature, and the step silently compiles
        TWICE — measured at +307 s (trace+convert+compile) on the 8-device
        CPU dryrun's grounding leg (round 5)."""
        if self.mesh is None:
            return {}
        rep = mesh_lib.replicated(self.mesh)
        return {"out_shardings": (rep, rep, rep)}

    def _jitted_step(self):
        """task_id and lr are TRACED, so this compiles once per run and
        serves all 12 sessions."""
        if getattr(self, "_step_cached", None) is None:
            tx = self._tx()

            @partial(jax.jit, donate_argnums=(0, 1), **self._jit_step_kwargs())
            def step(pool_params, opt_state, frozen_params, batch, task_id, lr):
                wd_state, inj = opt_state
                inj = inj._replace(
                    hyperparams=dict(inj.hyperparams, learning_rate=lr))
                (total, losses), grads = jax.value_and_grad(
                    self._losses, has_aux=True)(pool_params, frozen_params,
                                                batch, task_id)
                # only the current task's slice may move (leading axis = task)
                onehot = {
                    k: jax.nn.one_hot(task_id, v.shape[0], dtype=v.dtype).reshape(
                        (v.shape[0],) + (1,) * (v.ndim - 1))
                    for k, v in grads.items()
                }
                grads = {k: g * onehot[k] for k, g in grads.items()}
                updates, opt_state = tx.update(grads, (wd_state, inj), pool_params)
                updates = {k: u * onehot[k] for k, u in updates.items()}
                pool_params = optax.apply_updates(pool_params, updates)
                return pool_params, opt_state, {"total": total, **losses}

            self._step_cached = step
        return self._step_cached

    def _make_train_step(self, task_id: int, steps_per_epoch: int, epochs: int):
        import math

        cfg = self.cfg
        jitted = self._jitted_step()
        tid = jnp.int32(task_id)
        counter = {"n": 0}
        # per-epoch cosine lr, staged to the device ONCE: `jnp.float32(lr)`
        # in the loop is a fresh host->device transfer every step — an RPC
        # round-trip on the tunneled chip inside the hot loop
        lrs = [jnp.float32(cfg.lr * 0.5 * (1.0 + math.cos(math.pi * e / epochs)))
               for e in range(epochs + 1)]

        def step(pool_params, opt_state, frozen_params, batch):
            epoch = counter["n"] // max(steps_per_epoch, 1)
            counter["n"] += 1
            return jitted(pool_params, opt_state, frozen_params, batch, tid,
                          lrs[min(epoch, epochs)])

        return self._tx(), step

    def pretrain(self, dataset: RetrievalTrainSet, steps: int,
                 lr: Optional[float] = None) -> Dict[str, float]:
        """Full-parameter contrastive training of the whole tower pair — the
        role the downloaded OpenAI CLIP weights play for the reference
        (`retrieval/methods/sprompt.py:104-148` loads a *pretrained* CLIP and
        freezes it; prompts merely steer it). The accuracy gate uses this to
        build a base encoder that carries the image<->text correlation before
        the continual prompt loop freezes it (VERDICT r3 item #1a).

        AdamW (not the session SGD): from-scratch contrastive training on a
        tiny tower needs the adaptive step; the continual loop's optimizer is
        untouched.
        """
        cfg = self.cfg
        lr = cfg.lr if lr is None else lr
        if getattr(self, "_full_step", None) is None:
            tx = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.inject_hyperparams(optax.adamw)(
                    learning_rate=0.0, weight_decay=0.0))
            self._full_tx = tx

            @partial(jax.jit, donate_argnums=(0, 1), **self._jit_step_kwargs())
            def step(params, opt_state, batch, lr):
                clip_state, inj = opt_state
                inj = inj._replace(
                    hyperparams=dict(inj.hyperparams, learning_rate=lr))

                def loss_fn(p):
                    pools, frozen = _split_params(p)
                    return self._losses(pools, frozen, batch, 0)

                (total, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, (clip_state, inj), params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, {"total": total, **losses}

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
                it = dataset.batches(self.cfg.batch_size, seed=cfg.seed + n)
                batch = next(it)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if self.mesh is not None:
                batch = mesh_lib.shard_batch(self.mesh, batch)
            params, opt_state, metrics = self._full_step(
                params, opt_state, batch, jnp.float32(lr))
        self.params = params
        return {k: float(v) for k, v in metrics.items()}

    def train_session(self, dataset: RetrievalTrainSet, epochs: Optional[int] = None,
                      log_every: int = 50) -> Dict[str, float]:
        """Train one continual session on its task's data."""
        cfg = self.cfg
        task_id = dataset.task_index
        epochs = epochs or cfg.epochs
        steps_per_epoch = max(len(dataset) // cfg.batch_size, 1)
        tx, step = self._make_train_step(task_id, steps_per_epoch, epochs)

        pools, frozen = _split_params(self.params)
        opt_state = tx.init(pools)
        if self.mesh is not None:
            # commit the freshly-initialized state (inject_hyperparams makes
            # uncommitted default-device scalars) so call 1's input shardings
            # already match the pinned output shardings — one compile total
            opt_state = mesh_lib.replicate(self.mesh, opt_state)
        metrics = {}
        t0 = _time.perf_counter()
        steps = 0
        for epoch in range(epochs):
            for it, batch in enumerate(dataset.batches(cfg.batch_size, seed=cfg.seed + epoch)):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if self.mesh is not None:
                    batch = mesh_lib.shard_batch(self.mesh, batch)
                pools, opt_state, metrics = step(pools, opt_state, frozen, batch)
                steps += 1
        out = {k: float(v) for k, v in metrics.items()}  # fetch = device barrier
        dt = _time.perf_counter() - t0
        out["samples_per_sec"] = steps * cfg.batch_size / max(dt, 1e-9)
        self.params = _merge_params(pools, frozen)
        self.cluster_task(dataset)
        return out

    # ------------------------------------------------------------------
    def _jit_cached(self, name, fn):
        if name not in self._encode_cache:
            self._encode_cache[name] = jax.jit(fn)
        return self._encode_cache[name]

    def _put(self, array):
        """Device-put with batch sharding over the mesh when divisible —
        eval encoding then runs data-parallel like training."""
        array = jnp.asarray(array)
        if self.mesh is not None:
            dp = self.mesh.shape[self.mesh.axis_names[0]]
            if array.shape[0] % dp == 0:
                return jax.device_put(
                    array, mesh_lib.data_sharding(self.mesh, array.ndim))
        return array

    # Both extract_* feed the task-ID decision path (KMeans keys + eval
    # task inference) and run at FULL f32 matmul precision: near-collapsed
    # promptless features sit within bf16-pass rounding of each other, and
    # TPU default precision measurably flips key assignments (the on-chip
    # grounding gate's task-ID dropped 0.875 -> 0.681 before the same fix
    # there, r5). Eval-time only — train steps never call these.
    def extract_visual(self, images) -> jnp.ndarray:
        def fwd(p, x):
            with jax.default_matmul_precision("highest"):
                return self.model.apply({"params": p}, x,
                                        method=self.model.extract_visual)

        return self._jit_cached("extract_visual", fwd)(
            self.params, self._put(images))

    def extract_textual(self, token_ids) -> jnp.ndarray:
        def fwd(p, x):
            with jax.default_matmul_precision("highest"):
                return self.model.apply({"params": p}, x,
                                        method=self.model.extract_textual)

        return self._jit_cached("extract_textual", fwd)(
            self.params, self._put(token_ids))

    def cluster_task(self, dataset: RetrievalTrainSet):
        """KMeans task keys over the session's frozen features
        (`sprompt.py:370-403`)."""
        cfg = self.cfg
        vis_feats, txt_feats = [], []
        for batch in dataset.batches(cfg.batch_size, seed=0, drop_remainder=False):
            vis_feats.append(self.extract_visual(batch["images"]))
            txt_feats.append(self.extract_textual(batch["token_ids"]))
        vis = jnp.concatenate(vis_feats)[: len(dataset)]
        txt = jnp.concatenate(txt_feats)[: len(dataset)]
        k = cfg.num_key_clusters
        key = jax.random.PRNGKey(0)
        vc, _ = kmeans(key, vis, k=k)
        tc, _ = kmeans(key, txt, k=k)
        self.visual_keys = self.visual_keys.update(dataset.task_index, vc)
        self.textual_keys = self.textual_keys.update(dataset.task_index, tc)

    # ------------------------------------------------------------------
    def evaluate(self, eval_set: RetrievalEvalSet, num_tasks: int) -> dict:
        """Cumulative retrieval eval with task-ID inference
        (`_evaluate_retrieval`, sprompt.py:433-549)."""
        cfg = self.cfg
        enc_img = self._jit_cached(
            "encode_image_tasks",
            lambda p, x, t: self.model.apply(
                {"params": p}, x, t, method=self.model.encode_image_tasks))
        enc_txt = self._jit_cached(
            "encode_text_tasks",
            lambda p, x, t: self.model.apply(
                {"params": p}, x, t, method=self.model.encode_text_tasks))

        # prompt_type 'clip' = zero-shot baseline: frozen features, no task
        # prompts, no task-ID machinery (`sprompt.py:460-483` clip branch)
        zero_shot = cfg.lpi.prompt_type == "clip"

        img_feats, img_sel = [], []
        for images, n in eval_set.image_batches(cfg.batch_size):
            images = self._put(images)
            frozen = self.extract_visual(images)
            if zero_shot:
                img_feats.append(np.asarray(frozen)[:n])
                img_sel.append(np.zeros(n, np.int64))
                continue
            sel = infer_task_ids(frozen, self.visual_keys)
            img_feats.append(np.asarray(enc_img(self.params, images, sel))[:n])
            img_sel.append(np.asarray(sel)[:n])
        txt_feats, txt_sel = [], []
        for token_ids, n in eval_set.text_batches(cfg.eval_text_chunk):
            token_ids = self._put(token_ids)
            frozen = self.extract_textual(token_ids)
            if zero_shot:
                txt_feats.append(np.asarray(frozen)[:n])
                txt_sel.append(np.zeros(n, np.int64))
                continue
            sel = infer_task_ids(frozen, self.textual_keys)
            txt_feats.append(np.asarray(enc_txt(self.params, token_ids, sel))[:n])
            txt_sel.append(np.asarray(sel)[:n])

        img_feats = np.concatenate(img_feats)
        txt_feats = np.concatenate(txt_feats)
        # ranking on device: one jitted matmul+rank program instead of a
        # host [Ni, Nt] matmul + argsort (the reference's `sprompt.py:509`
        # does the matmul on GPU; SURVEY §7 calls for the device path)
        from lpi_tpu.eval.retrieval import device_ranks

        ranks = device_ranks(img_feats, txt_feats, eval_set.txt2img,
                             eval_set.img2txt)
        res = itm_eval(
            None, None, eval_set.txt2img, eval_set.img2txt,
            eval_set.image_categories, eval_set.text_categories, num_tasks,
            ranks=ranks)
        res["task_id_accuracy"] = {
            "visual": float(np.mean(np.concatenate(img_sel) == eval_set.image_categories)),
            "textual": float(np.mean(np.concatenate(txt_sel) == eval_set.text_categories)),
        }
        return res

    # ------------------------------------------------------------------
    def restore(self, checkpointer, session: Optional[int] = None) -> int:
        """Load frozen base + a session's pools/keys from a
        SessionCheckpointer; returns the restored session index.

        The reference's resume path is commented out (`finetune.py:139-142`);
        here restore is first-class: eval can run from any saved session.
        """
        session = checkpointer.latest_session() if session is None else session
        if session is None:
            raise ValueError("checkpoint directory has no sessions")
        from flax import traverse_util

        base = checkpointer.load_base()
        state = checkpointer.load_session(session)
        flat = dict(traverse_util.flatten_dict(base))
        flat.update(traverse_util.flatten_dict(state["pool_params"]))
        self.params = traverse_util.unflatten_dict(
            {k: jnp.asarray(v) for k, v in flat.items()})
        if "visual_keys" in state:
            self.visual_keys = TaskKeys(
                centers=jnp.asarray(state["visual_keys"]["centers"]),
                valid=jnp.asarray(state["visual_keys"]["valid"]))
        if "textual_keys" in state:
            self.textual_keys = TaskKeys(
                centers=jnp.asarray(state["textual_keys"]["centers"]),
                valid=jnp.asarray(state["textual_keys"]["valid"]))
        return session

    def run(self, train_sets, eval_sets, epochs: Optional[int] = None) -> dict:
        """The full continual loop (incremental_train, sprompt.py:150-195)."""
        for i, train_set in enumerate(train_sets):
            self.train_session(train_set, epochs=epochs)
            self.session_results[i] = self.evaluate(eval_sets[i], num_tasks=i + 1)
        return self.session_results
