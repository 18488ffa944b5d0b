"""Pipeline parallelism (GPipe schedule) for the YOHO encoder block stack.

The reference has no pipeline parallelism (its distribution story is
single-host ``pmap`` data parallel, ``transcription_pretrain_no_voiceprints.py:194``);
this module is the TPU-native capability extension that completes the
dp/tp/sp/pp set: the homogeneous encoder block stack is split into P
stages laid out over a named ``pipe`` mesh axis, and microbatches stream
through the stages with ``lax.ppermute`` moving activations between
ICI neighbors — the SPMD-pipelining pattern (one program, stage identity
= ``lax.axis_index``), not P separate programs.

Exactness: every microbatch passes through all blocks in order, so the
pipelined computation is the SAME function as the sequential stack; and
``ppermute`` differentiates to the reverse permutation, so gradients are
EXACT vs the single-device step (tested on the faked 8-device mesh).

Schedule: plain GPipe — M microbatches, P stages, M+P-1 ticks, bubble
fraction (P-1)/(M+P-1). Each device holds L/P consecutive blocks as one
stacked-leading-axis param pytree and scans over them per tick.

Composition: a mesh with a ``data`` axis in front pipelines within each
data-parallel replica (DP x PP in one shard_map); the gradient psum over
``data`` is inserted by the shard_map transpose exactly as in
``long_encoder.make_long_context_loss_fn``.

Note on input placement: microbatches enter replicated over the pipe
axis (every stage holds the full input, stage 0 consumes it). This
costs activations-of-one-batch of replicated HBM, which is the right
trade below ~1 GB inputs; production-scale variants would shard inputs
over ``pipe`` and all-gather per tick.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

AXIS_PIPE = "pipe"


def stack_block_params(encoder_params: dict, n_blocks: int) -> dict:
    """Stack per-block param subtrees ``blocks_0..blocks_{n-1}`` into one
    pytree whose leaves carry a leading block axis of length ``n_blocks``.

    The stacked leaves are what gets sharded over the ``pipe`` axis
    (leading-dim partition = consecutive blocks per stage). Blocks are
    homogeneous (same config), so leaves stack cleanly.
    """
    per_block = [encoder_params[f"blocks_{i}"] for i in range(n_blocks)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_block)


def unstack_block_params(stacked: dict, n_blocks: int) -> dict:
    """Inverse of :func:`stack_block_params` (checkpoint round-trips)."""
    return {
        f"blocks_{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(n_blocks)
    }


def _check_homogeneous(cfg) -> None:
    # Stacking block params requires a HOMOGENEOUS stack: all-dense, or
    # all-MoE (moe_every_n == 1). Mixed dense/MoE stacks have different
    # param trees per block and cannot pipeline this way.
    if getattr(cfg, "n_experts", 0) > 0 and cfg.moe_every_n != 1:
        raise ValueError(
            "pipeline parallelism requires a homogeneous block stack: "
            f"n_experts={cfg.n_experts} with moe_every_n={cfg.moe_every_n} "
            "mixes dense and MoE blocks (set moe_every_n=1 or n_experts=0)")


def _single_block(cfg, dtype):
    from yoho_tpu.nn.yoho import YOHOEncoderBlock, encoder_block_kwargs

    _check_homogeneous(cfg)
    # Homogeneous stack (checked above): block 0's kwargs are every
    # block's kwargs. Single-sourced with YOHOAudioEncoder.setup.
    return YOHOEncoderBlock(dtype=dtype, **encoder_block_kwargs(cfg, 0))


_RUNNERS: dict = {}


def _pipeline_runner(cfg, dtype, mesh: Mesh, axis_name: str,
                     n_micro: int, pos: int = 0):
    """Builds the (memoized, jitted) shard_map'd GPipe body.

    Returns ``run(stacked_params, x)`` with
    ``x: (M, mb, S, D)`` microbatched activations (post-stem) and
    ``stacked_params`` leading-axis block-stacked encoder block params;
    output ``(M, mb, S, D)``, replicated over ``axis_name``.
    """
    key = (repr(cfg), jnp.dtype(dtype).name, mesh, axis_name, n_micro, pos)
    if key in _RUNNERS:
        return _RUNNERS[key]
    n_stages = mesh.shape[axis_name]
    batch_axis = "data" if "data" in mesh.axis_names else None
    blk = _single_block(cfg, dtype)

    def stage_fn(local_params, h):
        # Apply this stage's consecutive blocks (a scan over the local
        # slice of the stacked leading axis), collecting any sown MoE
        # aux losses so pipelined MoE training keeps its load-balancing
        # pressure. Returns (h, mean aux over this stage's blocks).
        from yoho_tpu.nn.moe import collect_aux_losses

        n_local = jax.tree_util.tree_leaves(local_params)[0].shape[0]

        def body(carry, p):
            h, aux = carry
            y, st = blk.apply({"params": p}, h, pos=pos,
                              mutable=["intermediates"])
            # Dense blocks sow nothing -> the collection may be absent.
            aux_b = collect_aux_losses(dict(st).get("intermediates", {}))
            return (y, aux + aux_b), None

        (h, aux), _ = jax.lax.scan(
            body, (h, jnp.asarray(0.0, jnp.float32)), local_params)
        return h, aux / n_local

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(None, batch_axis, None, None)),
             out_specs=(P(None, batch_axis, None, None), P()),
             check_rep=False)
    def run(stacked_local, x):
        i = jax.lax.axis_index(axis_name)
        perm = [(p, (p + 1) % n_stages) for p in range(n_stages)]

        def tick(buf, t):
            # Stage 0 injects microbatch t (clamped: ticks past M drain
            # the pipe with garbage compute that is masked out below).
            inject = x[jnp.minimum(t, n_micro - 1)]
            cur = jnp.where(i == 0, inject, buf)
            y, aux = stage_fn(stacked_local, cur)
            # Stage i holds microbatch t - i at tick t; other ticks are
            # fill/drain garbage whose aux must not count.
            valid = (t >= i) & (t < i + n_micro)
            aux = jnp.where(valid, aux, 0.0)
            nxt = jax.lax.ppermute(y, axis_name, perm)
            return nxt, (y, aux)

        _, (ys, auxes) = jax.lax.scan(tick, jnp.zeros_like(x[0]),
                                      jnp.arange(n_micro + n_stages - 1))
        # Microbatch m leaves the last stage at tick m + P - 1.
        outs = ys[n_stages - 1:]
        # Broadcast the last stage's outputs to every stage (psum of a
        # one-hot-by-stage tensor) so the result is replicated over pipe.
        outs = jnp.where(i == n_stages - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, axis_name)
        # Mean aux over (stage, microbatch) and, when present, the data
        # axis — matching the replicated step's batch-mean semantics.
        axes = (axis_name,) + ((batch_axis,) if batch_axis else ())
        denom = n_stages * n_micro * (mesh.shape.get(batch_axis, 1)
                                      if batch_axis else 1)
        aux = jax.lax.psum(jnp.sum(auxes), axes) / denom
        return outs, aux

    _RUNNERS[key] = run
    return run


def pipeline_encode(model, variables, mel: jnp.ndarray, mesh: Mesh,
                    n_microbatches: int = 2, axis_name: str = AXIS_PIPE):
    """Encode ``mel`` with the block stack pipeline-parallel over ``mesh``.

    ``model`` is a :class:`yoho_tpu.nn.yoho.YOHOModel`; its checkpoint
    ``variables`` are reused as-is. The batch must divide evenly by
    ``n_microbatches`` and the block count by the ``axis_name`` size.
    Returns (B, S_frames // 2, dims), numerically identical to
    ``model.encode_audio`` (same function, different schedule) — for MoE
    stacks too, because routing is per sample (yoho_tpu.nn.moe), so the
    microbatch split cannot change capacity drops.
    """
    from yoho_tpu.nn.yoho import YOHOAudioEncoder

    cfg = model.cfg
    _check_homogeneous(cfg)
    n_stages = mesh.shape[axis_name]
    if cfg.n_audio_blocks % n_stages:
        raise ValueError(
            f"{cfg.n_audio_blocks} encoder blocks do not divide into "
            f"{n_stages} pipeline stages")
    enc_params = variables["params"]["encoder"]

    plain = YOHOAudioEncoder(cfg, dtype=model.dtype)
    x = plain.apply({"params": enc_params}, mel,
                    method=YOHOAudioEncoder.stem)
    b = x.shape[0]
    if b % n_microbatches:
        raise ValueError(
            f"batch {b} does not divide into {n_microbatches} microbatches")
    mb = b // n_microbatches
    x = x.reshape(n_microbatches, mb, *x.shape[1:])

    stacked = stack_block_params(enc_params, cfg.n_audio_blocks)
    run = _pipeline_runner(cfg, model.dtype, mesh, axis_name, n_microbatches)
    out, _ = run(stacked, x)
    return out.reshape(b, *out.shape[2:])


def make_pipeline_loss_fn(model, mesh: Mesh, n_microbatches: int = 2,
                          axis_name: str = AXIS_PIPE):
    """``loss_fn(params, mel, tokens, loss_mask) -> scalar`` with the
    encoder block stack pipeline-parallel over ``axis_name``.

    ``params`` is the standard YOHOModel param tree (NOT pre-stacked);
    stacking happens inside so the same checkpoint/optimizer state serves
    both the replicated and the pipelined step. With a ``data`` axis in
    the mesh, batches shard over it (DP x PP); gradients stay EXACT — the
    shard_map transpose inserts the psum.
    """
    from yoho_tpu.nn.yoho import YOHOAudioEncoder, YOHOModel

    cfg = model.cfg
    _check_homogeneous(cfg)
    n_stages = mesh.shape[axis_name]
    if cfg.n_audio_blocks % n_stages:
        raise ValueError(
            f"{cfg.n_audio_blocks} encoder blocks do not divide into "
            f"{n_stages} pipeline stages")
    run = _pipeline_runner(cfg, model.dtype, mesh, axis_name,
                           n_microbatches)

    def loss_fn(params, mel, tokens, loss_mask):
        from yoho_tpu.train.trainer import masked_ce_loss

        enc_params = params["encoder"]
        plain = YOHOAudioEncoder(cfg, dtype=model.dtype)
        x = plain.apply({"params": enc_params}, mel,
                        method=YOHOAudioEncoder.stem)
        b = x.shape[0]
        if b % n_microbatches:
            raise ValueError(
                f"batch {b} does not divide into {n_microbatches} "
                "microbatches")
        mb = b // n_microbatches
        x = x.reshape(n_microbatches, mb, *x.shape[1:])

        stacked = stack_block_params(enc_params, cfg.n_audio_blocks)
        xa, aux = run(stacked, x)
        xa = xa.reshape(b, *xa.shape[2:])
        logits = model.apply({"params": params}, tokens, xa,
                             method=YOHOModel.decode_text)
        loss = masked_ce_loss(logits, tokens, loss_mask)
        if getattr(cfg, "n_experts", 0) > 0:
            # Keep the Switch load-balancing pressure in pipelined MoE
            # training (collected inside the shard_map, see
            # _pipeline_runner.stage_fn).
            loss = loss + cfg.moe_aux_weight * aux
        return loss

    return loss_fn


def make_pipeline_train_step(model, mesh: Mesh, n_microbatches: int = 2,
                             axis_name: str = AXIS_PIPE):
    """Training step with the encoder pipeline-parallel (GPipe).

    Returns ``step(state, mel, tokens, loss_mask) -> (state, loss)``.
    The decoder and loss run outside the shard_map (GSPMD lays them out
    from operand shardings, as in the sequence-parallel step). Use when
    the block stack's weights do not fit one device — stage memory is
    L/P blocks + one microbatch of activations.
    """
    loss_fn = make_pipeline_loss_fn(model, mesh, n_microbatches, axis_name)

    @jax.jit
    def step(state, mel, tokens, loss_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, mel, tokens, loss_mask)
        return state.apply_gradients(grads=grads), loss

    return step
