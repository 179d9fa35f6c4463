"""Pipeline parallelism: GPipe-style microbatched Hyena blocks over a mesh axis.

The backbone's residual blocks are homogeneous (HyenaBlock x n_layer), so
their parameters stack into a leading layer axis that shards over a ``pp``
mesh axis — each device owns ``n_layer / pp`` consecutive blocks.  The
forward runs the classic GPipe schedule under ``shard_map``:

    tick t: every stage applies its blocks to the microbatch it holds,
    then hands the activation to the next stage via ``lax.ppermute``;
    stage 0 injects microbatch t, stage P-1 banks a finished microbatch
    from tick P-1 on.

``n_micro + P - 1`` ticks drain the pipeline; the bubble fraction is the
usual (P-1)/(n_micro + P - 1).  Embedding, final LayerNorm, and the head
run replicated outside the pipelined region (they are microscopic next to
the blocks).  ``ppermute`` is differentiable, so ``jax.grad`` through this
forward yields pipeline-parallel training without extra machinery.

The reference delegates all distribution to Lightning DDP (SURVEY §5) and
has no pipeline dimension at all; this is TPU-native capability beyond it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chimeralm_tpu.runtime.task import ClassificationTask


def stack_block_params(params: dict, n_layer: int) -> tuple[dict, dict]:
    """Split backbone params into (stacked blocks, shared rest).

    ``stacked`` leaves gain a leading (n_layer,) axis; ``rest`` keeps the
    embedding / final-LN / head subtrees untouched.
    """
    backbone = params["backbone"]
    blocks = [backbone[f"layers_{i}"] for i in range(n_layer)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {
        "backbone": {k: v for k, v in backbone.items() if not k.startswith("layers_")},
        **{k: v for k, v in params.items() if k != "backbone"},
    }
    return stacked, rest


def pipeline_forward(model, params: dict, input_ids: jnp.ndarray, mesh,
                     n_micro: int, axis_name: str = "pp",
                     attention_mask: jnp.ndarray | None = None,
                     deterministic: bool = True, rngs=None) -> jnp.ndarray:
    """Full classifier forward with the blocks pipeline-parallel over ``mesh``.

    model: a ``HyenaDnaClassifier`` (its config supplies the block shape).
    params: the standard (unsharded) param tree from ``model.init``.
    input_ids: (B, L) with B divisible by ``n_micro``.
    Returns (B, 2) logits, numerically equal to ``model.apply``.

    Training: ``deterministic=False`` + ``rngs={"dropout": key}`` enables
    dropout in the *replicated* embedding and head (where all of the
    flagship's dropout lives); the pipelined blocks run deterministic —
    ``hyena_dropout`` must be 0 (it is in every shipped config), enforced
    below.  Dropout rng streams fold the module path, so pp logits under
    dropout are a valid sample but not bit-equal to single-device ones;
    equivalence tests run dropout-free.
    """
    import flax.linen as nn
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from chimeralm_tpu.models.hyena import BinarySequenceClassifier, HyenaBlock

    cfg = model.config
    n_layer = cfg.n_layer
    pp = mesh.shape[axis_name]
    assert n_layer % pp == 0, f"n_layer={n_layer} not divisible by pp={pp}"
    if not deterministic and (cfg.hyena_dropout or cfg.hyena_filter_dropout):
        raise ValueError("pipeline training requires hyena_dropout == 0 "
                         "(block-level dropout runs inside the pipelined region)")
    B, L = input_ids.shape
    assert B % n_micro == 0, f"B={B} not divisible by n_micro={n_micro}"
    mb = B // n_micro
    per_stage = n_layer // pp

    stacked, rest = stack_block_params(params, n_layer)
    # the pipelined blocks always run the MXU two-stage matmul-DFT: the
    # native fft primitive's transpose rule rejects the varying cotangents
    # this schedule produces under shard_map (vma check), and matmul-DFT is
    # the TPU production training path anyway (same math, ~1e-5 rel)
    import dataclasses as _dc

    block = HyenaBlock(_dc.replace(cfg, fft_method="matmul"))
    emb = nn.Embed(cfg.padded_vocab_size, cfg.d_model, dtype=cfg.dtype)

    # embedding + embed dropout run replicated OUTSIDE the shard_map (they
    # are microscopic, and dropout rng plumbing stays out of the pipeline)
    h_all = emb.apply({"params": rest["backbone"]["word_embeddings"]}, input_ids).astype(cfg.dtype)
    h_all = nn.Dropout(cfg.embed_dropout).apply(
        {}, h_all, deterministic=deterministic, rngs=rngs
    )
    h_mb_in = h_all.reshape(n_micro, mb, L, cfg.d_model)

    def stage_fn(stage_params, h):
        for i in range(per_stage):
            p_i = jax.tree.map(lambda x, i=i: x[i], stage_params)
            h = block.apply({"params": p_i}, h, deterministic=True)
        return h

    def pipelined(stacked_loc, h_mb):
        s = jax.lax.axis_index(axis_name)
        # mark the replicated microbatch feed axis-varying up front: its
        # cotangent IS varying (each stage contributes a different grad), and
        # the vjp of ops over unvarying-primal/varying-cotangent is rejected
        h_mb = jax.lax.pvary(h_mb, axis_name)
        T = n_micro + pp - 1
        # pvary: the carries differ per stage, so mark them axis-varying
        # up front (shard_map's vma check rejects unvarying-in/varying-out)
        out0 = jax.lax.pvary(jnp.zeros((n_micro, mb, L, cfg.d_model), cfg.dtype), axis_name)
        act0 = jax.lax.pvary(jnp.zeros((mb, L, cfg.d_model), cfg.dtype), axis_name)

        def tick(carry, t):
            act, out = carry
            # stage 0 injects microbatch t (zeros once the feed is drained)
            feed = jnp.take(h_mb, jnp.clip(t, 0, n_micro - 1), axis=0)
            feed = jnp.where(t < n_micro, feed, jnp.zeros_like(feed))
            act = jnp.where(s == 0, feed, act)
            act = stage_fn(stacked_loc, act)
            # the last stage banks microbatch t - (pp - 1)
            done = t - (pp - 1)
            banked = jax.lax.dynamic_update_slice(
                out, act[None].astype(out.dtype), (jnp.clip(done, 0, n_micro - 1), 0, 0, 0)
            )
            out = jnp.where((s == pp - 1) & (done >= 0), banked, out)
            # hand the activation to the next stage (the wrap back to stage
            # 0 is immediately overwritten by the next feed)
            act = jax.lax.ppermute(act, axis_name, [(i, (i + 1) % pp) for i in range(pp)])
            return (act, out), None

        (_, out), _ = jax.lax.scan(tick, (act0, out0), jnp.arange(T))
        # only the last stage holds the real outputs; broadcast them
        out = jnp.where(s == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis_name)

    fwd = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
    )
    h = fwd(stacked, h_mb_in)
    h = h.reshape(B, L, cfg.d_model)

    # final LN + head, replicated (tiny next to the blocks)
    ln_f = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon)
    h = ln_f.apply({"params": rest["backbone"]["ln_f"]}, h)
    head = BinarySequenceClassifier(input_dim=cfg.d_model, hidden_dim=512, num_layers=2,
                                    dropout=cfg.head_dropout)
    return head.apply({"params": rest["head"]}, h, attention_mask=attention_mask,
                      deterministic=deterministic, rngs=rngs)


class PipelineTask(ClassificationTask):
    """A ``ClassificationTask`` whose forward runs the GPipe pipeline.

    The Trainer's jitted train/eval steps then execute pipeline-parallel
    over a ``pp`` mesh axis — the pp analogue of the dp/tp path in
    ``ClassificationTask.sharded_state``.  Batches stay replicated (the
    pipeline distributes *layers*, not rows), so the Trainer is constructed
    with ``mesh=None`` and this task owns the pp mesh.  Selected by
    ``trainer.mesh_axes: [pp]`` in the config system
    (configs/trainer/pp.yaml); the reference has no pipeline dimension at
    all (SURVEY §2.4).
    """

    def __init__(self, model, mesh, n_micro: int = 4, axis_name: str = "pp", **kw):
        super().__init__(model, **kw)
        pp = mesh.shape[axis_name]
        if model.config.n_layer % pp:
            raise ValueError(f"n_layer={model.config.n_layer} not divisible by pp={pp}")
        self.pp_mesh, self.n_micro, self.pp_axis = mesh, n_micro, axis_name

    @classmethod
    def from_task(cls, task, mesh, n_micro: int = 4, axis_name: str = "pp"):
        """Re-home an existing task's model/optimizer onto the pipeline."""
        obj = cls(task.model, mesh, n_micro, axis_name, optimizer=task.optimizer)
        obj.remat = task.remat
        return obj

    def _forward(self, params, batch, deterministic: bool, rngs=None,
                 model_state=None, mutable=False):
        ids = batch["input_ids"]
        mask = batch.get("attention_mask")
        B = ids.shape[0]
        # partial final batches (val/test loops don't drop_last): pad rows to
        # a microbatch multiple with PAD ids + zero mask, slice logits back
        extra = (-B) % self.n_micro
        if extra:
            from chimeralm_tpu.data.tokenizer import PAD_ID

            ids = jnp.pad(ids, ((0, extra), (0, 0)), constant_values=PAD_ID)
            if mask is not None:
                mask = jnp.pad(mask, ((0, extra), (0, 0)))
        logits = pipeline_forward(
            self.model, params, ids, self.pp_mesh,
            n_micro=self.n_micro, axis_name=self.pp_axis,
            attention_mask=mask,
            deterministic=deterministic, rngs=rngs,
        )[:B]
        if mutable and model_state:
            return logits, dict(model_state)
        return logits, dict(model_state or {})
