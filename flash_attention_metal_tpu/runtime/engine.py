"""Continuous-batching decode engine (BASELINE.json config 5 runtime).

Host-side scheduler over the jitted prefill/decode steps: a fixed pool of
batch slots, a FIFO admission queue, and per-step retirement of finished
sequences.  The device programs never change shape — admission and
retirement only flip the ``active`` mask and per-slot lengths — so the
whole serving loop runs on exactly two compiled executables (prefill,
decode) regardless of traffic.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import ModelConfig, Params
from .decode import decode_step, prefill_slot, sample
from .kv_cache import KVCache, init_cache, reset_slot


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int = 64
    temperature: float = 0.0
    # Filled by the engine:
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False


def _pad_to(x: List[int], multiple: int) -> np.ndarray:
    n = len(x)
    pad = (-n) % multiple
    return np.asarray(x + [0] * pad, np.int32)


class DecodeEngine:
    """Continuous batching over a fixed slot pool.

    Usage::

        eng = DecodeEngine(params, cfg, max_batch=8, max_len=2048, eos_id=2)
        eng.submit(Request(uid=1, prompt=[...]))
        while eng.pending():
            finished = eng.step()
    """

    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        *,
        max_batch: int,
        max_len: int,
        eos_id: int = -1,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.eos_id = eos_id
        self.max_len = max_len
        self.cache: KVCache = init_cache(
            cfg.n_layers,
            max_batch,
            cfg.n_kv_heads,
            max_len,
            cfg.head_dim,
            dtype=cfg.dtype,
        )
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.next_token = np.zeros((max_batch,), np.int32)
        self.queue: deque[Request] = deque()
        self.key = jax.random.PRNGKey(seed)
        self.steps = 0
        self.finished: Dict[int, Request] = {}

    # ------------------------------------------------------------------
    def submit(self, request: Request) -> None:
        if len(request.prompt) >= self.max_len:
            raise ValueError("prompt longer than cache capacity")
        self.queue.append(request)

    def pending(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    # ------------------------------------------------------------------
    def _admit(self) -> None:
        """Prefill queued requests into free slots."""
        for slot, occupant in enumerate(self.slots):
            if occupant is not None or not self.queue:
                continue
            req = self.queue.popleft()
            tokens = _pad_to(req.prompt, 128)
            logits, self.cache = prefill_slot(
                self.params,
                self.cfg,
                self.cache,
                jnp.asarray(tokens),
                jnp.int32(len(req.prompt)),
                slot,
            )
            self.key, sub = jax.random.split(self.key)
            tok = int(sample(logits, sub, req.temperature))
            req.slot = slot
            req.generated.append(tok)
            self.slots[slot] = req
            self.next_token[slot] = tok
            self._maybe_finish(req)

    def _maybe_finish(self, req: Request) -> None:
        hit_eos = req.generated and req.generated[-1] == self.eos_id
        full = len(req.prompt) + len(req.generated) >= self.max_len - 1
        if hit_eos or len(req.generated) >= req.max_new_tokens or full:
            req.done = True
            self.slots[req.slot] = None
            self.cache = reset_slot(self.cache, req.slot)
            self.finished[req.uid] = req

    # ------------------------------------------------------------------
    def step(self) -> List[Request]:
        """Admit, run one decode step, retire finished requests."""
        self._admit()
        active_reqs = [r for r in self.slots if r is not None]
        if not active_reqs:
            return []

        active = jnp.asarray(
            [r is not None for r in self.slots], dtype=bool
        )
        logits, self.cache = decode_step(
            self.params,
            self.cfg,
            self.cache,
            jnp.asarray(self.next_token),
            active,
        )
        self.steps += 1
        finished: List[Request] = []
        for slot, req in enumerate(list(self.slots)):
            if req is None:
                continue
            self.key, sub = jax.random.split(self.key)
            tok = int(sample(logits[slot], sub, req.temperature))
            req.generated.append(tok)
            self.next_token[slot] = tok
            self._maybe_finish(req)
            if req.done:
                finished.append(req)
        return finished

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue; returns {uid: generated tokens}."""
        while self.pending():
            self.step()
        return {uid: r.generated for uid, r in self.finished.items()}
