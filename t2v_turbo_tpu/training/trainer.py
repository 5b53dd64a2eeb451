"""LCD trainer driver: state, sharded step, checkpoints, metrics.

The reference trainer's runtime services (HF accelerate `save_state` rotation,
resume-from-latest, per-step metric gathering — train_t2v_turbo_v1_lora.py:
739-756, 908-933, 1203-1282) rebuilt on orbax + jit-with-sharding:

- TrainState = (trainable, opt_state, step) pytree; `trainable` is either the
  LoRA factor tree (v1) or full UNet params (v2).
- one jitted train step over a Mesh: batch sharded (B->data, T->seq), params
  replicated; XLA inserts the grad psum.
- orbax CheckpointManager with rotating max_to_keep, auto-resume from latest.
- metrics appended as JSONL (wandb-free observability; every scalar the
  reference logged: distill/reward/video_rm losses, lr, grad_norm).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..lora import LoRAConfig, init_lora, merge_lora
from ..parallel.mesh import make_mesh, replicated
from .lcd import LCDConfig, lcd_loss


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "runs/lcd"
    max_steps: int = 10_000
    checkpoint_every: int = 2000
    keep_checkpoints: int = 3
    log_every: int = 10
    seed: int = 0
    max_grad_norm: float = 10.0
    lora_rank: Optional[int] = 64  # None -> full finetune (v2 style)
    lora_scale: float = 1.0
    # path predicate selecting which kernel leaves get LoRA factors; None ->
    # every kernel. The v1 app passes vc2_reference_lora_target(cfg) so the
    # factor set matches the reference's injected modules exactly (and is
    # exportable to its unet_lora.pt format).
    lora_target: Optional[Any] = None
    ema_decay: Optional[float] = None  # v2 target net
    # Reference --gradient_accumulation_steps (train_t2v_turbo_v1_lora.py:
    # 287-291, accelerator.accumulate :945). K>1 averages grads over K
    # micro-batches before one optimizer update; max_steps counts
    # micro-steps, so set max_steps = updates * K.
    grad_accum_steps: int = 1
    # FSDP/ZeRO-3: shard trainable params, optimizer state, EMA, and the
    # frozen towers over the mesh's "data" axis (parallel/fsdp.py). The
    # reference has no analog (DDP replicates the model on every rank and
    # leans on AdamW8bit for optimizer memory); on a 16 GB chip this is
    # what makes full-model v2 training fit. Replicated when False.
    fsdp: bool = False
    # leaves with fewer elements stay replicated under fsdp (gathering a
    # 1 KB bias costs more than its shard saves); tests set 0 to force
    # sharding of tiny trees
    fsdp_min_size: int = 1 << 14
    # Keep the gradient tree in bfloat16 (params stay f32 master weights;
    # Adam's moment math and the applied update stay f32 — optim.py). The
    # cast fuses into each grad's producing fusion, so the full-size v2
    # UNet's 5.6 GB f32 grad tree never materializes — the difference
    # between fitting and OOMing a 16 GB v5e for full-model training
    # (bench.py --train-v2). bf16 keeps f32's exponent range; the ~0.4%
    # relative mantissa rounding on g feeds moment accumulators that the
    # reference itself quantizes far harder (bitsandbytes int8 m/v,
    # train_t2v_turbo_v1_lora.py:764-775). Convergence-tested against f32
    # grads in test_training.py. grad_accum_steps>1 would also accumulate
    # micro-grads in bf16, so LCDTrainer rejects that combination at
    # construction — use f32 grads when accumulating.
    grads_bf16: bool = False
    # Extra XLA compiler options for the train-step jit (opaque key ->
    # value, forwarded per-compile). The useful one on memory-marginal
    # configs is {"xla_tpu_enable_latency_hiding_scheduler": "false"}:
    # the latency-hiding scheduler overlaps parameter prefetches with
    # compute, which costs co-live buffers + fragmentation — measured
    # worth ~1 GB of peak on the full-size v2 step (PERF_NOTES r3). Trade
    # step time for fitting. None = compiler defaults.
    compiler_options: Optional[dict] = None
    # Compile the train step as TWO programs — value_and_grad, then
    # optimizer-apply — instead of one. Peak HBM drops because the two
    # programs stop sharing one temp arena (the grad program sheds the
    # update-math temps and its share of buffer-assignment fragmentation):
    # what closes the 215 MB gap that OOMs the full-size v2 step at
    # 15.96 G on a 16 GB v5e (PERF_NOTES r3). Also halves the largest
    # single compile. Cost: one extra dispatch per step.
    split_step: bool = False
    # EMA tracks only this top-level key of the trainable dict (e.g.
    # "unet"). The v2 target net is UNet-only in the reference
    # (train_latent_t2v_turbo_v2.py:671-675), so when the text tower joins
    # the trainable tree it must NOT be duplicated and decayed into the
    # EMA state (an unused ~1.2 GB f32 copy at full size). None = EMA over
    # the whole trainable tree.
    ema_path: Optional[str] = None


class LCDTrainer:
    def __init__(
        self,
        *,
        student_apply: Callable,
        teacher_apply: Callable,
        teacher_params,
        student_params,
        sched,
        solver,
        lcd_cfg: LCDConfig,
        optimizer: optax.GradientTransformation,
        cfg: TrainerConfig,
        mesh=None,
        reward_fn=None,
        video_reward_fn=None,
        loss_fn_override=None,
        reward_params=None,
        reward_fn_factory=None,
        frozen_grad_mask=None,
    ):
        """loss_fn_override(trainable, batch, key, ema=None) -> (loss, metrics)
        replaces the built-in v1 LCD loss — the v2 latent trainer plugs
        lcd_v2_loss in this way (its target network is the EMA state).

        reward_params/reward_fn_factory: pass the reward towers' param trees
        (VAE + vision towers) as RUNTIME arguments instead of the closure
        capture `reward_fn`/`video_reward_fn` imply. Closure-captured trees
        are baked into the lowered program as constants — gigabytes of
        proto per compile at full size (the same pathology fixed for
        teacher/frozen-student above) — and lose any sharding. With a
        factory, `reward_params` joins the `frozen` tree (so FSDP shards it
        like every other frozen tower) and the factory is called INSIDE the
        traced loss with the (tracer) subtree:
            reward_fn_factory(rparams) -> (reward_fn, video_reward_fn)
        When a factory is given, `loss_fn_override` is called with an extra
        `reward_fns=(rf, vrf)` keyword.

        frozen_grad_mask(path) -> bool: leaves whose grads are zeroed
        BEFORE the global-norm clip (and before grad accumulation). The
        reference's frozen (requires_grad=False) params never reach its
        clip, so leaving their grad mass in gnorm would over-clip the live
        params and inflate the logged grad_norm; zeroing only inside the
        optimizer (optim.make_v2_optimizer's frozen label) is too late.
        Pass optim.make_v2_label_fn(...) == "frozen" for the v2 recipe."""
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        accum = max(1, cfg.grad_accum_steps)
        if cfg.grads_bf16 and accum > 1:
            # MultiSteps accumulates in the grad dtype, so bf16 grads would
            # sum K micro-grads at 8-bit mantissa — a silent quality hole the
            # docstring used to merely warn about. Promoting the accumulator
            # to f32 would materialize the very tree grads_bf16 exists to
            # avoid, so there is no configuration that delivers both; fail
            # loudly instead.
            raise ValueError(
                "grads_bf16=True with grad_accum_steps>1 would accumulate "
                "micro-gradients in bfloat16 (MultiSteps sums in the grad "
                "dtype). Use f32 grads when accumulating, or accum=1 with "
                "bf16 grads."
            )
        if accum > 1:
            # clip the *accumulated* grads (reference clips after
            # accumulate, train_t2v_turbo_v1_lora.py:1192), so the norm clip
            # moves inside the MultiSteps wrapper and the per-micro-batch
            # manual clip in step_fn is skipped.
            optimizer = optax.MultiSteps(
                optax.chain(
                    optax.clip_by_global_norm(cfg.max_grad_norm), optimizer
                ),
                every_k_schedule=accum,
            )
        self.optimizer = optimizer
        self.student_params = student_params
        self.teacher_params = teacher_params

        use_lora = cfg.lora_rank is not None
        # Frozen (non-trained) params are threaded through the jitted step
        # as ARGUMENTS, not closed over: closure capture bakes them into the
        # lowered program as constants (11+ GB of captured constants at
        # full size — slow lowering, duplicated memory, and any sharding on
        # them is lost). As runtime inputs they keep their device placement
        # and shardings (e.g. TP layouts from shard_params_tp).
        frozen = {"teacher": teacher_params}
        if reward_fn_factory is not None:
            if reward_params is None:
                raise ValueError(
                    "reward_fn_factory requires reward_params (the tower "
                    "param trees it will be called with)"
                )
            frozen["rewards"] = reward_params
        if use_lora:
            lora_cfg = LoRAConfig(
                rank=cfg.lora_rank, scale=cfg.lora_scale, target=cfg.lora_target
            )
            trainable = init_lora(
                student_params, lora_cfg, jax.random.PRNGKey(cfg.seed)
            )
            frozen["student"] = student_params
        else:
            trainable = student_params

        def make_apply(fr):
            if use_lora:
                def apply_fn(tr, *args, **kw):
                    return student_apply(
                        merge_lora(fr["student"], tr, cfg.lora_scale),
                        *args, **kw,
                    )
            else:
                def apply_fn(tr, *args, **kw):
                    return student_apply(tr, *args, **kw)
            return apply_fn

        self._frozen = frozen
        # Commit state + frozen to the mesh. Default: replicated (DP shards
        # the batch, not the params); leaves the caller already committed
        # (e.g. a TP-sharded teacher via shard_params_tp) are left alone.
        # Without an explicit placement the first step takes UNCOMMITTED
        # inputs but returns committed ones, so the second call has a
        # different jit signature and recompiles the whole multi-minute
        # step program.
        #
        # cfg.fsdp: every large leaf sharded over "data" (parallel/fsdp.py)
        # — params, Adam moments, EMA, and the frozen towers — XLA
        # all-gathers weights per layer and reduce-scatters grads. Two
        # rules matter at full size:
        #  * committed leaves are NOT skipped — FSDP composes AROUND a
        #    deliberate layout (a TP-sharded kernel keeps its "model" dim
        #    and additionally shards a free dim over "data"); silently
        #    running replicated because the caller pre-committed params
        #    would OOM a 16 GB chip with no hint,
        #  * the optimizer/EMA trees must NEVER materialize unsharded
        #    (f32 Adam moments for the 1.41B UNet are ~11 GB — more than
        #    the chip): the state structure is eval_shape'd, shardings
        #    derived from the abstract tree, and jit(out_shardings=...)
        #    produces the real tree already sharded.
        rep = NamedSharding(self.mesh, P())
        if cfg.fsdp:
            from ..parallel.fsdp import fsdp_shardings, fsdp_spec_for

            data_n = self.mesh.shape.get("data", 1)

            def compose_sh(a):
                base = (
                    a.sharding.spec
                    if isinstance(a, jax.Array)
                    and getattr(a, "committed", False)
                    and isinstance(a.sharding, NamedSharding)
                    else None
                )
                return NamedSharding(
                    self.mesh,
                    fsdp_spec_for(
                        a, data_n, base=base, min_size=cfg.fsdp_min_size
                    ),
                )

            def put_fsdp(tree):
                sh = jax.tree.map(compose_sh, tree)
                return jax.tree.map(
                    lambda a, s: a
                    if isinstance(a, jax.Array) and a.sharding == s
                    else jax.device_put(a, s),
                    tree,
                    sh,
                )

            trainable = put_fsdp(trainable)
            self._frozen = put_fsdp(self._frozen)
            opt_shapes = jax.eval_shape(optimizer.init, trainable)
            # moments get pure-FSDP specs (no TP base): where a param is
            # TP+FSDP its moment reshards inside the update — correct, and
            # the moment memory still scales 1/data_n
            opt_sh = fsdp_shardings(
                self.mesh, opt_shapes, min_size=cfg.fsdp_min_size
            )
            opt_state = jax.jit(optimizer.init, out_shardings=opt_sh)(
                trainable
            )
            self.state = {
                "trainable": trainable,
                "opt_state": opt_state,
                "step": jax.device_put(jnp.zeros([], jnp.int32), rep),
            }
            if cfg.ema_decay is not None:
                ema_src = (
                    trainable
                    if cfg.ema_path is None
                    else trainable[cfg.ema_path]
                )
                ema_sh = jax.tree.map(lambda a: a.sharding, ema_src)
                self.state["ema"] = jax.jit(
                    lambda t: jax.tree.map(jnp.copy, t),
                    out_shardings=ema_sh,
                )(ema_src)
        else:
            opt_state = optimizer.init(trainable)
            self.state = {
                "trainable": trainable,
                "opt_state": opt_state,
                "step": jnp.zeros([], jnp.int32),
            }
            if cfg.ema_decay is not None:
                ema_src = (
                    trainable
                    if cfg.ema_path is None
                    else trainable[cfg.ema_path]
                )
                self.state["ema"] = jax.tree.map(jnp.copy, ema_src)

            def commit(tree):
                return jax.tree.map(
                    lambda a: a
                    if isinstance(a, jax.Array) and a.committed
                    else jax.device_put(a, rep),
                    tree,
                )

            self.state = commit(self.state)
            self._frozen = commit(self._frozen)

        def loss_fn(trainable, batch, key, fr, ema=None):
            rf, vrf = reward_fn, video_reward_fn
            if reward_fn_factory is not None:
                rf, vrf = reward_fn_factory(fr["rewards"])
            if loss_fn_override is not None:
                kw = (
                    {"reward_fns": (rf, vrf)}
                    if reward_fn_factory is not None
                    else {}
                )
                return loss_fn_override(trainable, batch, key, ema=ema, **kw)
            return lcd_loss(
                trainable,
                batch,
                key,
                student_apply=make_apply(fr),
                teacher_apply=teacher_apply,
                teacher_params=fr["teacher"],
                sched=sched,
                solver=solver,
                cfg=lcd_cfg,
                reward_fn=rf,
                video_reward_fn=vrf,
            )

        def grad_part(trainable, ema, batch, key, fr):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, batch, key, fr, ema
            )
            del loss  # already inside metrics
            if frozen_grad_mask is not None:
                grads = jax.tree_util.tree_map_with_path(
                    lambda p, g: jnp.zeros_like(g)
                    if frozen_grad_mask(p)
                    else g,
                    grads,
                )
            if cfg.grads_bf16:
                grads = jax.tree.map(
                    lambda g: g.astype(jnp.bfloat16), grads
                )
            return grads, metrics

        def apply_part(state, grads, metrics):
            # squared-sum in f32 regardless of grad dtype (a bf16 reduction
            # over 1e9 elements loses the norm entirely)
            gnorm = jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(grads)
                )
            )
            if cfg.grad_accum_steps <= 1:
                scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-6))
                grads = jax.tree.map(
                    lambda g: (g * scale).astype(g.dtype), grads
                )
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["trainable"]
            )
            trainable = optax.apply_updates(state["trainable"], updates)
            new_state = dict(
                state,
                trainable=trainable,
                opt_state=opt_state,
                step=state["step"] + 1,
            )
            if cfg.ema_decay is not None:
                tr_src = (
                    trainable
                    if cfg.ema_path is None
                    else trainable[cfg.ema_path]
                )
                ema = jax.tree.map(
                    lambda e, p: cfg.ema_decay * e + (1 - cfg.ema_decay) * p,
                    state["ema"],
                    tr_src,
                )
                if cfg.grad_accum_steps > 1:
                    # decay once per optimizer update, not per micro-step
                    # (mini_step wraps to 0 on the update boundary)
                    did_update = opt_state.mini_step == 0
                    ema = jax.tree.map(
                        lambda new, old: jnp.where(did_update, new, old),
                        ema,
                        state["ema"],
                    )
                new_state["ema"] = ema
            metrics["grad_norm"] = gnorm
            return new_state, metrics

        def step_fn(state, batch, key, fr):
            grads, metrics = grad_part(
                state["trainable"], state.get("ema"), batch, key, fr
            )
            return apply_part(state, grads, metrics)

        # Pin the output state to the input layout: donation then reuses the
        # buffers, and under FSDP this is what makes GSPMD emit the ZeRO
        # pattern (reduce-scatter grads -> sharded update) instead of
        # gathering the update and resharding after. Metrics are scalars,
        # replicated.
        self._state_shardings = jax.tree.map(lambda a: a.sharding, self.state)
        if cfg.split_step:
            # Two programs instead of one: the grad program's peak excludes
            # every optimizer-update temp (and that program's buffer-
            # assignment fragmentation), and the apply program runs with
            # params+grads+moments resident but near-zero temps. Costs one
            # extra dispatch and materializes the grad tree between the
            # programs (it is materialized inside the fused step too — the
            # split moves no data, it only un-shares the two programs'
            # temp arenas). Also halves the largest single XLA compile,
            # which matters when a remote-compile channel caps wall time.
            _grad_jit = jax.jit(
                grad_part, compiler_options=cfg.compiler_options
            )
            # donate the grads only when they are f32: an f32 grad buffer
            # aliases the new param buffer (same shape/dtype), a bf16 one
            # can alias nothing and would only emit a warning wall — it is
            # freed after its last in-program use either way
            _apply_jit = jax.jit(
                apply_part,
                donate_argnums=(0,) if cfg.grads_bf16 else (0, 1),
                out_shardings=(self._state_shardings, rep),
                compiler_options=cfg.compiler_options,
            )

            def _step(state, batch, key):
                grads, metrics = _grad_jit(
                    state["trainable"], state.get("ema"), batch, key,
                    self._frozen,
                )
                return _apply_jit(state, grads, metrics)
        else:
            _jitted_step = jax.jit(
                step_fn,
                donate_argnums=(0,),
                out_shardings=(self._state_shardings, rep),
                compiler_options=cfg.compiler_options,
            )

            def _step(state, batch, key):
                return _jitted_step(state, batch, key, self._frozen)

        self._step_jit = _step

        os.makedirs(cfg.output_dir, exist_ok=True)
        self.ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(os.path.join(cfg.output_dir, "checkpoints")),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=cfg.keep_checkpoints, create=True
            ),
        )
        self._metrics_path = os.path.join(cfg.output_dir, "metrics.jsonl")

    # ------------------------------------------------------------------
    def resume_if_available(self) -> int:
        latest = self.ckpt_mgr.latest_step()
        if latest is None:
            return 0
        # Restore INTO the shardings the live state already carries (FSDP /
        # TP layouts included): an abstract target with sharding makes orbax
        # place each restored leaf directly. The r2 path restored then
        # device_put to P(), which silently re-replicated sharded state —
        # both an OOM risk and a signature change for the jitted step.
        target = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)
            if isinstance(a, jax.Array)
            else a,
            self.state,
        )
        self.state = self.ckpt_mgr.restore(
            latest, args=ocp.args.StandardRestore(target)
        )
        return int(latest)

    def save(self, step: int):
        # idempotent: a relaunch of a finished job (resume -> start ==
        # max_steps, loop never runs) re-saves its own final step, which
        # orbax rejects with StepAlreadyExists — make that a no-op restart
        if step in (self.ckpt_mgr.all_steps() or []):
            return
        self.ckpt_mgr.save(step, args=ocp.args.StandardSave(self.state))
        self.ckpt_mgr.wait_until_finished()

    def _log(self, step: int, metrics: dict, dt: float):
        row = {
            "step": step,
            "time_per_step_s": round(dt, 4),
            **{k: float(v) for k, v in metrics.items()},
        }
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        return row

    def shard_batch(self, batch):
        # host-only fields (raw texts etc., prefixed "_") are dropped; under
        # multi-process each host contributes only its local rows
        # (jax.make_array_from_process_local_data inside)
        from ..parallel.multihost import host_local_batch_to_global

        return host_local_batch_to_global(self.mesh, batch)

    # ------------------------------------------------------------------
    def run(
        self,
        data_iter: Iterator[dict],
        max_steps: Optional[int] = None,
        validation_fn: Optional[Callable] = None,
        validation_every: int = 500,
    ):
        """Main loop: resume, iterate sharded steps, checkpoint, log.

        validation_fn(step, merged_params) runs every `validation_every`
        steps (the reference's periodic validation-video rendering,
        train_t2v_turbo_v1_lora.py:1243-1254). A heartbeat file is kept
        fresh in output_dir and SIGTERM/SIGINT trigger a final checkpoint
        (graceful preemption — absent in the reference, SURVEY.md §5).
        """
        from ..data.datasets import DevicePrefetcher
        from .watchdog import GracefulShutdown, Heartbeat

        cfg = self.cfg
        start = self.resume_if_available()
        max_steps = max_steps or cfg.max_steps
        # fold the resume step in: a preempt-resume cycle must NOT replay
        # the step-0 noise/timestep draws (that would train forever on the
        # same k random draws under a supervisor that restarts every k)
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), start)
        last_metrics = {}
        last_step = start
        hb_path = os.path.join(cfg.output_dir, "heartbeat.json")
        # overlap host-side batch prep + H2D transfer with device compute
        prefetch = DevicePrefetcher(data_iter, put=self.shard_batch, depth=2)
        t_window = time.perf_counter()
        steps_in_window = 0
        wait_in_window = 0.0  # host blocked on the input pipeline
        with self.mesh, Heartbeat(hb_path) as hb, GracefulShutdown() as stop:
            for step in range(start, max_steps):
                if stop.requested:
                    break
                try:
                    t_wait = time.perf_counter()
                    batch = next(prefetch)
                    wait_in_window += time.perf_counter() - t_wait
                except StopIteration:
                    # finite dataset shorter than max_steps: stop cleanly
                    # (the final checkpoint below must still run)
                    break
                key, sub = jax.random.split(key)
                self.state, metrics = self._step_jit(self.state, batch, sub)
                last_step = step + 1
                steps_in_window += 1
                hb.update(last_step)
                if last_step % cfg.log_every == 0 or step == start:
                    # float() fences the device; dispatch is async, so a
                    # single-iteration timer would measure the whole queued
                    # window — divide the fenced window by its step count
                    metrics = {k: float(v) for k, v in metrics.items()}
                    now = time.perf_counter()
                    window = now - t_window
                    dt = window / steps_in_window
                    # input-bound fraction: host time blocked waiting for the
                    # prefetcher. ~0 when the data layer keeps up; -> 1 when
                    # decode/encode can't feed the chip (SURVEY §7 "data
                    # pipeline throughput" risk, measured not assumed)
                    metrics["data_wait_frac"] = wait_in_window / max(window, 1e-9)
                    t_window, steps_in_window, wait_in_window = now, 0, 0.0
                    last_metrics = self._log(last_step, metrics, dt)
                if last_step % cfg.checkpoint_every == 0:
                    self.save(last_step)
                if validation_fn is not None and last_step % validation_every == 0:
                    validation_fn(last_step, self.export_student_params())
        if last_step % cfg.checkpoint_every != 0:
            self.save(last_step)
        return last_metrics

    # ------------------------------------------------------------------
    def export_student_params(self):
        """Inference-ready merged params (v1: base + collapsed LoRA —
        the reference's unet_lora.pt + collapse flow, utils/lora.py:793)."""
        if self.cfg.lora_rank is not None:
            return merge_lora(
                self.student_params, self.state["trainable"], self.cfg.lora_scale
            )
        return self.state["trainable"]
