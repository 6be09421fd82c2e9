"""Training step + multi-rate schedule (optax).

The reference ships pre-trained pickles and no training loop in-tree;
this module provides the missing capability: an end-to-end jitted RD
training step over a GOP, with the multi-rate regime of the gain-vector
papers (sample an integer rate index per step and weight the loss by the
matching lambda, reference: src/model_mngt/loss_function.py:129-131
'loss_weighting ... used for the multi-rate training').
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from aivc_tpu.config import ModelConfig
from aivc_tpu.gop import GopStruct
from aivc_tpu.models.fullnet import FullNet
from aivc_tpu.train.loss import gop_rd_loss


def make_optimizer(lr: float = 1e-4, clip: float = 1.0,
                   lr_final: float | None = None,
                   decay_steps: int | None = None,
                   warmup_steps: int = 0):
    """Adam with global-norm clipping.

    With ``lr_final``/``decay_steps`` set, the learning rate warms up
    linearly for ``warmup_steps`` then follows a cosine decay from ``lr``
    to ``lr_final`` over ``decay_steps`` (constant ``lr`` otherwise —
    the round-1 behaviour).  The reference ships no training loop at all
    (SURVEY §2.3); the schedule exists because the round-1 constant-LR
    polish run regressed where a decayed tail would not have.
    """
    if lr_final is not None and decay_steps:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr,
            peak_value=lr,
            warmup_steps=max(warmup_steps, 1) if warmup_steps else 0,
            decay_steps=decay_steps,
            end_value=lr_final,
        )
    else:
        schedule = lr
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(schedule),
    )


def make_train_step(model: FullNet, cfg: ModelConfig, gop: GopStruct,
                    optimizer, dist_loss: str | None = None,
                    flow_penalty: float = 0.0,
                    alpha_penalty: float = 0.0,
                    mesh=None, accum: int = 1):
    """Build a jitted train step over a fixed GOP structure.

    The returned step has signature
      (params, opt_state, frames [n, B, H, W, 3], idx_rate, rng)
      -> (params, opt_state, logs)
    idx_rate is TRACED (integer scalar): the gain selection uses
    dynamic indexing and lambda is gathered from the ladder, so all rate
    points share ONE compiled program (7 separate multi-minute remote
    compiles otherwise).

    With ``accum > 1`` the batch axis is split into ``accum``
    microbatches scanned sequentially (activation memory stays at
    microbatch size) and ONE optimizer update is applied to the f32 mean
    of the valid microbatch gradients.  Motivation (round-4 finding,
    docs/STATUS.md): the B=2 trajectories oscillate +-1-2 dB between
    snapshots and every continuation leg from the promoted flagship fell
    out of its sharp basin — the gradient NOISE scale, not the step
    count, is the binding constraint.  Each microbatch carries its own
    poison guard (non-finite / negative loss / exploded forward /
    gnorm spike): a single bad draw used to no-op the whole step; here
    it is simply dropped from the mean and the healthy rest still count.

    With ``mesh`` set, params/opt_state are pinned REPLICATED and frames
    to the ('data', 'spatial') layout via explicit in/out shardings.
    Without the pins, GSPMD's sharding propagation invented partitions
    of the tiny per-channel parameter tensors along size-1 dims in the
    BACKWARD pass (e.g. f32[1,1,9,1] factorized-prior/gain leaves
    partitioned 4 ways), forcing "involuntary full rematerialization"
    at every gradient accumulation (MULTICHIP_r03.json) and minutes of
    extra SPMD compile time.
    """
    dist = dist_loss or cfg.dist_loss
    lambda_tuple = tuple(float(v) for v in cfg.lambda_tradeoff)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        frames_s = NamedSharding(mesh, P(None, "data", "spatial", None, None))
        jit_kw = dict(
            in_shardings=(rep, rep, frames_s, None, rep),
            out_shardings=(rep, rep, rep),
        )
    else:
        jit_kw = {}

    @functools.partial(jax.jit, **jit_kw)
    def train_step(params, opt_state, frames, idx_rate, rng):
        # Built inside the trace: a module-level/closure jnp array would be
        # a committed device buffer, which blocks XLA scan optimizations
        # (see coding/vrans.py note).
        lambdas = jax.numpy.asarray(lambda_tuple, jax.numpy.float32)
        lam = lambdas[jax.numpy.asarray(idx_rate, jax.numpy.int32)]

        def loss_fn(p, fr, r):
            frame_list = [fr[i] for i in range(fr.shape[0])]
            loss, logs = gop_rd_loss(
                model, p, frame_list, gop, idx_rate, r,
                l_codec=lam, l_mof=lam, dist_loss=dist,
                weight_i_frame_loss=cfg.weight_i_frame_loss,
                flow_penalty=flow_penalty,
                alpha_penalty=alpha_penalty)
            return loss, logs

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro_ok(loss, logs, gn):
            # Same poison taxonomy as the full-step guard below; see the
            # block comment there for the provenance of each threshold.
            return (jnp.isfinite(gn) & jnp.isfinite(loss)
                    & (loss >= -1e-3) & (logs["psnr"] > -20.0)
                    & (gn < 1e5))

        if accum > 1:
            n, bt = frames.shape[0], frames.shape[1]
            bm = bt // accum
            fr_mb = jnp.moveaxis(
                frames.reshape((n, accum, bm) + frames.shape[2:]), 1, 0)
            rngs = jax.random.split(rng, accum)
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)

            def micro(carry, xs):
                gsum, cnt = carry
                fr1, r1 = xs
                (mloss, mlogs), mgrads = grad_fn(params, fr1, r1)
                gn = optax.global_norm(mgrads)
                okf = micro_ok(mloss, mlogs, gn).astype(jnp.float32)
                gsum = jax.tree.map(
                    lambda a, g: a + okf * g.astype(jnp.float32),
                    gsum, mgrads)
                return (gsum, cnt + okf), (mloss, mlogs, okf)

            (gsum, cnt), (losses, logs_st, oks) = jax.lax.scan(
                micro, (zero_g, jnp.float32(0.0)), (fr_mb, rngs))
            denom = jnp.maximum(cnt, 1.0)
            grads = jax.tree.map(lambda a, p: (a / denom).astype(p.dtype),
                                 gsum, params)
            w = oks / denom
            loss = jnp.sum(losses * w)
            logs = jax.tree.map(lambda v: jnp.sum(v * w), logs_st)
            # flow_max is a maximum, not a mean, over valid microbatches
            logs["flow_max"] = jnp.max(
                jnp.where(oks > 0.5, logs_st["flow_max"], 0.0))
            logs["micro_skipped"] = jnp.float32(accum) - cnt
            all_bad = cnt < 0.5
        else:
            (loss, logs), grads = grad_fn(params, frames, rng)
            logs["micro_skipped"] = jnp.float32(0.0)
            all_bad = False
        if mesh is not None:
            # Pin the grad tree replicated: GSPMD's propagation otherwise
            # invents partitions of tiny per-channel leaves along size-1
            # dims inside the backward accumulation ("involuntary full
            # rematerialization", MULTICHIP_r03).  Constraining the
            # accumulated grads gives the propagation pass a replicated
            # anchor on the whole transpose subgraph.
            grads = jax.lax.with_sharding_constraint(
                grads, jax.tree.map(lambda _: rep, grads))
        gnorm = optax.global_norm(grads)
        # Skip non-finite steps: clipping rescales AFTER the norm, so a
        # single inf/nan batch would otherwise poison params and optimizer
        # state irrecoverably (observed: MS-SSIM fine-tune NaN'd at ~5k
        # steps from one blow-up batch).  The step becomes a no-op and
        # training continues.
        # loss < 0 is definitionally invalid for lambda*R + D with both
        # terms non-negative (D is MSE or 1 - MS-SSIM): it means the
        # forward blew up numerically even though the result is finite
        # (MS-SSIM > 1 from ~1e8 activations was observed in round 2),
        # so treat it like a non-finite step and skip.
        # psnr <= -20 dB means the reconstruction magnitudes are ~1e1+
        # off scale: the forward exploded even though loss stayed finite
        # and positive (observed round 3: loss ~5 with psnr -60..-112
        # compounding through the GOP reference chain for 1000+ steps).
        # Updates computed from an exploded forward are poison — skip.
        # gnorm > 1e5: global-norm clipping preserves the DIRECTION of a
        # garbage gradient; spikes of ~3e6 were observed immediately
        # before a round-3 collapse, and the round-3 continuation saw
        # recurring PSNR collapses follow 1e5+ spikes while healthy
        # steps stayed under ~8e4.  Skip the step instead of stepping
        # 1.0 along a noise direction.
        ok = micro_ok(loss, logs, gnorm) & jnp.logical_not(all_bad)
        new_updates, new_opt_state = optimizer.update(grads, opt_state,
                                                      params)
        new_params = optax.apply_updates(params, new_updates)
        params = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                              new_params, params)
        opt_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                 new_opt_state, opt_state)
        logs["loss"] = loss
        logs["grad_norm"] = gnorm
        logs["step_skipped"] = (~ok).astype(jnp.float32)
        return params, opt_state, logs

    return train_step


def gop_curriculum(nb_epoch_done: int, change_epochs, gop_names):
    """Training curriculum: which GOP structure to train on at this epoch.

    Mirrors the reference's staged-GOP training helper
    (reference: src/func_util/GOP_structure.py:177-195): stage i runs
    until change_epochs[i]; returns the matching gop_names entry.
    """
    if len(change_epochs) != len(gop_names):
        raise ValueError("change_epochs and gop_names must align")
    for end_epoch, name in zip(change_epochs, gop_names):
        if nb_epoch_done < end_epoch:
            return name
    return gop_names[-1]
