"""Training loop: optax optimizer, LR schedule, checkpoint/resume.

The reference has no training at all (``project_narrative.md:42-53``);
this is the framework-completion layer above ``transformer.py``'s loss —
an AdamW + cosine-schedule trainer whose state (params, optimizer
moments, step count, RNG key) checkpoints through ``utils.checkpoint``
and resumes bit-exactly, the training-side counterpart of the serving
engine's KV-snapshot restart.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.checkpoint import restore_pytree, save_pytree
from .transformer import ModelConfig, Params, init_params, loss_fn


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    key: jax.Array


def make_optimizer(
    peak_lr: float = 3e-4,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.95,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + linear warmup + cosine decay + global-norm clipping."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )


class Trainer:
    """Single-host trainer over the FlashLM loss.

    For multi-chip training use ``parallel_train.make_train_step`` and
    shard the same optimizer state with the param specs; this class
    covers the one-device loop plus durable checkpoint/resume.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        *,
        optimizer: Optional[optax.GradientTransformation] = None,
        seed: int = 0,
        grad_accum: int = 1,
        loss: Optional[Callable] = None,
        ema_decay: float = 0.0,
    ):
        """``grad_accum > 1`` splits each ``step()`` batch into that many
        microbatches, accumulating gradients in a rematerializing
        ``lax.scan`` — one optimizer step per call with the effective
        batch, at the activation memory of one microbatch.

        ``loss``: alternative loss with the ``loss_fn`` signature
        ``(params, tokens, cfg, dropout_key)`` — e.g.
        ``models.losses.loss_fn_blockwise`` for chunked-vocab CE.

        ``ema_decay > 0`` maintains an exponential moving average of the
        parameters inside the jitted step (``ema = d*ema + (1-d)*p``,
        with the standard warmup cap ``d_t = min(d, (1+t)/(10+t))``);
        read it via ``self.ema_params`` for evaluation/serving — EMA
        weights are a plain param tree, so they drop into the engine.
        """
        self.cfg = cfg
        self.opt = optimizer if optimizer is not None else make_optimizer()
        if grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

        cfg_ = cfg
        opt = self.opt
        loss_f = loss if loss is not None else loss_fn

        @jax.jit
        def _step(state_tuple, tokens):
            params, opt_state, step, key = state_tuple
            key, sub = jax.random.split(key)
            # Attention dropout draws fresh keys per step when configured;
            # the seeds are traced, so no recompile across steps.
            if grad_accum == 1:
                loss, grads = jax.value_and_grad(loss_f)(
                    params, tokens, cfg_, sub
                )
            else:
                b = tokens.shape[0]
                if b % grad_accum:
                    raise ValueError(
                        f"batch {b} not divisible by grad_accum {grad_accum}"
                    )
                micro = tokens.reshape(grad_accum, b // grad_accum, -1)
                subs = jax.random.split(sub, grad_accum)

                def body(carry, xs):
                    g_acc, l_acc = carry
                    tb, kb = xs
                    l, g = jax.value_and_grad(loss_f)(params, tb, cfg_, kb)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                (g_sum, l_sum), _ = jax.lax.scan(
                    body, (zeros, jnp.float32(0.0)), (micro, subs)
                )
                inv = 1.0 / grad_accum
                grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
                loss = l_sum * inv
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, step + 1, key), loss

        self._step = _step
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        params = init_params(sub, cfg)
        self.state = TrainState(
            params=params,
            opt_state=self.opt.init(params),
            step=jnp.int32(0),
            key=key,
        )
        self.ema_params = None
        self._ema_update = None
        if ema_decay:
            if not 0.0 < ema_decay < 1.0:
                raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
            self.ema_params = jax.tree_util.tree_map(
                jnp.array, self.state.params
            )

            @jax.jit
            def _ema_update(ema, params, step):
                # Warmup cap: early steps track the params closely.
                d = jnp.minimum(
                    ema_decay, (1.0 + step) / (10.0 + step)
                ).astype(jnp.float32)
                return jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p, ema, params
                )

            self._ema_update = _ema_update

    # ------------------------------------------------------------------
    def step(self, tokens: jax.Array) -> float:
        """One optimizer step on a ``[B, N]`` int32 token batch."""
        (params, opt_state, step, key), loss = self._step(
            (
                self.state.params,
                self.state.opt_state,
                self.state.step,
                self.state.key,
            ),
            tokens,
        )
        self.state = TrainState(
            params=params, opt_state=opt_state, step=step, key=key
        )
        if self.ema_params is not None:
            self.ema_params = self._ema_update(
                self.ema_params, params, step
            )
        return float(loss)

    def train(
        self,
        batches: Iterator[jax.Array],
        *,
        steps: int,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        log_every: int = 0,
        log: Callable[[str], None] = print,
    ) -> Dict[str, Any]:
        """Drive ``steps`` optimizer steps; optionally checkpoint/log."""
        losses = []
        for _ in range(steps):
            loss = self.step(next(batches))
            losses.append(loss)
            n = int(self.state.step)
            if log_every and n % log_every == 0:
                log(f"step {n}: loss {loss:.4f}")
            if (
                checkpoint_path
                and checkpoint_every
                and n % checkpoint_every == 0
            ):
                self.save(checkpoint_path)
        return {"losses": losses, "final_step": int(self.state.step)}

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        snap = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "key": self.state.key,
        }
        if self.ema_params is not None:
            snap["ema_params"] = self.ema_params
        save_pytree(path, snap)

    def load(self, path: str) -> None:
        like = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "key": self.state.key,
        }
        if self.ema_params is not None:
            like["ema_params"] = self.ema_params
        snap = restore_pytree(path, like=like)
        if self.ema_params is not None:
            self.ema_params = snap["ema_params"]
        self.state = TrainState(
            params=snap["params"],
            opt_state=snap["opt_state"],
            step=jnp.asarray(snap["step"], jnp.int32),
            key=jnp.asarray(snap["key"]),
        )


def synthetic_batches(
    cfg: ModelConfig, batch: int, seq: int, seed: int = 0
) -> Iterator[jax.Array]:
    """Deterministic synthetic token stream (for tests and benchmarks)."""
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield jax.random.randint(sub, (batch, seq), 0, cfg.vocab_size)
