"""Diffusion TrainLoop: microbatching, AdamW, multi-rate EMA, resume.

Rebuild of ``improved_diffusion/train_util.py:29-366`` the TPU way:

* the reference's microbatch loop with DDP ``no_sync`` on non-final
  microbatches (``forward_backward:191-229``) becomes gradient accumulation
  inside one jitted step — a ``lax.scan`` over microbatches whose grads are
  averaged before the optimizer update; on a (dp, tp) mesh the cross-chip
  all-reduce is compiler-emitted;
* the manual fp16 master-param/loss-scaling machinery (``fp16_util.py``,
  ``optimize_fp16:231-252``) collapses into a compute-dtype policy on the
  model (bf16 matmuls, f32 params/optimizer) — no loss scaling needed on
  TPU bf16;
* EMA per rate (``:82-92,246-252``), lr annealing (``:254-260``),
  importance-sampled timesteps with history updates (``resample.py``),
  orbax save/resume (``save:274-297``, ``_load_and_sync_parameters:114``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiopure_tpu.diffusion.gaussian import GaussianDiffusion
from audiopure_tpu.training.ema import update_ema
from audiopure_tpu.training.samplers import (ScheduleSampler,
                                             UniformSampler)
from audiopure_tpu.utils import checkpoint as ckpt_lib
from audiopure_tpu.utils import logging as logger


class TrainLoop:
    def __init__(
        self,
        model_apply: Callable,          # (params, x, t) -> model output
        params: Any,
        diffusion: GaussianDiffusion,
        data: Iterator,                 # yields {'spectrogram' or 'samples', 'target'}
        batch_size: int,
        microbatch: int = -1,
        lr: float = 1e-4,
        ema_rate: Any = "0.9999",
        log_interval: int = 10,
        save_interval: int = 10_000,
        resume_checkpoint: str = "",
        weight_decay: float = 0.0,
        lr_anneal_steps: int = 0,
        schedule_sampler: Optional[ScheduleSampler] = None,
        input_key: str = "spectrogram",
        cond_keys: Sequence[str] = (),
        preprocess: Optional[Callable] = None,
        seed: int = 0,
        async_save: bool = False,
    ):
        self.model_apply = model_apply
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.microbatch = microbatch if microbatch > 0 else batch_size
        assert batch_size % self.microbatch == 0
        self.lr = lr
        self.ema_rate = ([ema_rate] if isinstance(ema_rate, float)
                         else [float(x) for x in str(ema_rate).split(",")])
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.resume_checkpoint = resume_checkpoint
        self.lr_anneal_steps = lr_anneal_steps
        self.schedule_sampler = schedule_sampler or UniformSampler(
            diffusion.num_timesteps)
        self.input_key = input_key
        # conditioning arrays passed through to the model as kwargs —
        # e.g. ("y",) for class-cond, ("low_res", "y") for super-res
        # (the reference threads these as ``model_kwargs`` through
        # ``training_losses``, ``train_util.py:191-229``)
        self.cond_keys = tuple(cond_keys)
        self.preprocess = preprocess or (lambda x: x)
        self.async_save = async_save
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        self.optimizer = optax.adamw(
            learning_rate=lambda step: self._anneal_lr(step),
            weight_decay=weight_decay)
        self.step = 0
        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.ema_params = [jax.tree_util.tree_map(jnp.copy, params)
                           for _ in self.ema_rate]

        if resume_checkpoint:
            self._load_checkpoint(resume_checkpoint)

        self._train_step = jax.jit(self._make_train_step())

    # ------------------------------------------------------------------
    def _anneal_lr(self, step):
        if not self.lr_anneal_steps:
            return self.lr
        frac_done = jnp.minimum(step / self.lr_anneal_steps, 1.0)
        return self.lr * (1 - frac_done)

    def _make_train_step(self):
        n_micro = self.batch_size // self.microbatch
        diffusion = self.diffusion

        def loss_fn(params, x, t, weights, key, cond):
            terms = diffusion.training_losses(
                lambda xx, tt, **kw: self.model_apply(params, xx, tt,
                                                      **cond),
                x, t, key)
            loss = (terms["loss"] * weights).mean()
            return loss, terms

        def train_step(params, opt_state, ema_list, x, t, weights, key,
                       cond):
            # grad accumulation over microbatches (ref ``no_sync`` loop)
            xm = x.reshape(n_micro, self.microbatch, *x.shape[1:])
            tm = t.reshape(n_micro, self.microbatch)
            wm = weights.reshape(n_micro, self.microbatch)
            cm = {k: v.reshape(n_micro, self.microbatch, *v.shape[1:])
                  for k, v in cond.items()}
            keys = jax.random.split(key, n_micro)

            def micro(carry, inp):
                gsum, lsum = carry
                xi, ti, wi, ki, ci = inp
                (loss, terms), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, xi, ti, wi, ki, ci)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (gsum, lsum + loss), terms["loss"]

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            (gsum, lsum), per_sample = jax.lax.scan(
                micro, (zero, jnp.asarray(0.0)), (xm, tm, wm, keys, cm))
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)

            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            ema_list = [update_ema(e, params, r)
                        for e, r in zip(ema_list, self.ema_rate)]
            gnorm = optax.global_norm(grads)
            return (params, opt_state, ema_list, lsum / n_micro,
                    per_sample.reshape(-1), gnorm)

        return train_step

    # ------------------------------------------------------------------
    def run_step(self, batch: Dict[str, Any]):
        x = jnp.asarray(self.preprocess(batch[self.input_key]))
        cond = {k: jnp.asarray(batch[k]) for k in self.cond_keys}
        t_np, w_np = self.schedule_sampler.sample(x.shape[0], self.rng)
        self.key, sub = jax.random.split(self.key)
        (self.params, self.opt_state, self.ema_params, loss, per_sample,
         gnorm) = self._train_step(self.params, self.opt_state,
                                   self.ema_params, x,
                                   jnp.asarray(t_np), jnp.asarray(w_np),
                                   sub, cond)
        self.schedule_sampler.update_with_all_losses(
            t_np, np.asarray(per_sample))
        logger.logkv_mean("loss", float(loss))
        logger.logkv_mean("grad_norm", float(gnorm))
        self.step += 1
        return float(loss)

    def run_loop(self, max_steps: Optional[int] = None,
                 preemption_signals: Sequence[int] = None):
        """ref ``run_loop:160-189`` (+ the DIFFUSION_TRAINING_TEST escape
        hatch via ``max_steps``).

        Preemption-aware: while the loop runs, SIGTERM (the cloud-TPU
        preemption notice; override via ``preemption_signals``) triggers a
        checkpoint save at the end of the in-flight step and a clean
        return, so ``--resume_checkpoint`` continues from there. The
        reference has no equivalent. Previous handlers are restored on
        exit; installation is skipped off the main thread.
        """
        import os
        import signal

        env_test = os.environ.get("DIFFUSION_TRAINING_TEST", "")
        if preemption_signals is None:
            preemption_signals = (signal.SIGTERM,)
        self._preempted = False
        prev_handlers = {}
        for s in preemption_signals:
            try:
                prev_handlers[s] = signal.signal(
                    s, lambda signum, frame: setattr(
                        self, "_preempted", True))
            except ValueError:  # not the main thread
                break
        try:
            for batch in self.data:
                self.run_step(batch)
                if self.step % self.log_interval == 0:
                    logger.logkv("step", self.step)
                    logger.logkv("samples", self.step * self.batch_size)
                    logger.dumpkvs()
                if self.step % self.save_interval == 0:
                    self.save()
                    if env_test:
                        return
                if self._preempted:
                    # an async periodic save may have just started on this
                    # same step dir — let it commit before writing again
                    ckpt_lib.wait_for_saves()
                    self.save(async_save=False)  # commit before exiting
                    logger.log(f"preemption signal: checkpoint saved at "
                               f"step {self.step}, exiting run_loop")
                    return
                if max_steps is not None and self.step >= max_steps:
                    return
        finally:
            ckpt_lib.wait_for_saves()
            for s, h in prev_handlers.items():
                signal.signal(s, h)

    # ------------------------------------------------------------------
    def save(self, ckpt_dir: Optional[str] = None,
             async_save: Optional[bool] = None):
        ckpt_dir = ckpt_dir or logger.get_dir()
        tree = {"params": self.params, "opt_state": self.opt_state}
        for rate, ema in zip(self.ema_rate, self.ema_params):
            tree[f"ema_{rate}"] = ema
        ckpt_lib.save(ckpt_dir, self.step, tree,
                      async_save=self.async_save if async_save is None
                      else async_save)

    def _load_checkpoint(self, path: str):
        tree = {"params": self.params, "opt_state": self.opt_state}
        for rate, ema in zip(self.ema_rate, self.ema_params):
            tree[f"ema_{rate}"] = ema
        restored = ckpt_lib.restore(path, template=tree)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.ema_params = [restored[f"ema_{r}"] for r in self.ema_rate]
        self.step = ckpt_lib.find_max_step(path)
