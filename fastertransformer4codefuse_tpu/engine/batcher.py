"""Continuous batching scheduler.

Capability beyond the reference: FasterTransformer4CodeFuse serves strictly
static batches — one ``forward`` runs a whole batch to completion
(GptNeoX.cc:386-1052) and new requests wait. Here a fixed pool of decode slots
runs one fused decode step per tick; requests join by prefilling into a free
slot's cache region and retire the moment they finish, so the chip never
idles between requests of different lengths.

Static-shape discipline (everything jit-cached):
  - the slot pool is ``[max_slots]`` rows of a packed token buffer + stacked
    KV cache sized ``max_seq_len``;
  - admission prefills the prompt at a bucketed width and scatters the
    resulting cache rows into the slot (one compiled program per bucket);
  - every tick runs the same decode-step program over all slots; inactive
    slots are masked finished.

The per-slot sampling state reuses the engine's processor stack (temperature,
penalties, stop words... — same semantics as the one-shot path).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gptneox as model
from ..sampling import processors as proc
from ..sampling.sample import sample_top_k_top_p
from .engine import GptNeoXEngine


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    output_len: int
    top_k: int = 1
    top_p: float = 0.0
    temperature: float = 1.0
    repetition_penalty: float = 1.0
    random_seed: int = 0
    # filled on completion
    output_ids: Optional[List[int]] = None
    done: bool = False
    slot: int = -1
    on_token: Optional[Callable[[int], None]] = None


class ContinuousBatcher:
    """Slot-pool scheduler over a GptNeoXEngine's model functions."""

    def __init__(
        self,
        engine: GptNeoXEngine,
        max_slots: int = 8,
        max_seq_len: int = 2048,
        prompt_bucket: int = 128,
    ):
        self.engine = engine
        self.cfg = engine.config
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.prompt_bucket = prompt_bucket
        self._uid = itertools.count()
        self.pending: List[Request] = []
        self.running: Dict[int, Request] = {}  # slot -> request
        self._prefill_cache: Dict[int, Callable] = {}
        self._step_fn = None
        self._state = self._init_state()

    # ------------------------------------------------------------ state ----
    def _init_state(self):
        cfg, S, B = self.cfg, self.max_seq_len, self.max_slots
        cache = model.init_kv_cache(cfg, B, S, self.engine._cache_dtype())
        return {
            "tokens": jnp.full((B, S), cfg.end_id, jnp.int32),
            "seq_lens": jnp.zeros((B,), jnp.int32),
            "stop_at": jnp.zeros((B,), jnp.int32),  # seq_len limit per slot
            "input_lens": jnp.zeros((B,), jnp.int32),
            "active": jnp.zeros((B,), jnp.bool_),
            "cache": cache,
            "top_k": jnp.ones((B,), jnp.int32),
            "top_p": jnp.zeros((B,), jnp.float32),
            "temperature": jnp.ones((B,), jnp.float32),
            "rep_penalty": jnp.ones((B,), jnp.float32),
            "base_keys": jnp.zeros((B, 2), jnp.uint32),
            "steps": jnp.zeros((B,), jnp.int32),
        }

    # -------------------------------------------------------- admission ----
    def submit(self, prompt: Sequence[int], output_len: int, **kw) -> int:
        r = Request(uid=next(self._uid), prompt=list(prompt), output_len=output_len, **kw)
        self.pending.append(r)
        return r.uid

    def _free_slots(self) -> List[int]:
        return [b for b in range(self.max_slots) if b not in self.running]

    def _get_prefill_fn(self, width: int):
        fn = self._prefill_cache.get(width)
        if fn is not None:
            return fn
        cfg = self.cfg

        def prefill_into_slot(params, state, slot, ids, in_len, stop_at,
                              top_k, top_p, temperature, rep_penalty, seed):
            # single-sequence prefill over its own small cache, then scatter
            # the filled rows into the pool cache at `slot`
            tmp_cache = model.init_kv_cache(cfg, 1, width, self.engine._cache_dtype())
            hidden, tmp_cache = model.prefill(
                cfg, params, ids[None, :], in_len[None], tmp_cache
            )
            pool = dict(state["cache"])
            for k, v in tmp_cache.items():
                # pool[k]: [L, B, nH, S(, dh)]; v: [L, 1, nH, width(, dh)]
                pool[k] = jax.lax.dynamic_update_slice(
                    state["cache"][k],
                    v.astype(state["cache"][k].dtype),
                    (0, slot) + (0,) * (v.ndim - 2),
                )
            tokens = jax.lax.dynamic_update_slice(
                state["tokens"],
                jnp.full((1, self.max_seq_len), cfg.end_id, jnp.int32)
                .at[0, :width].set(ids),
                (slot, 0),
            )
            st = dict(state)
            st["cache"] = pool
            st["tokens"] = tokens
            st["seq_lens"] = state["seq_lens"].at[slot].set(in_len)
            st["input_lens"] = state["input_lens"].at[slot].set(in_len)
            st["stop_at"] = state["stop_at"].at[slot].set(stop_at)
            st["active"] = state["active"].at[slot].set(True)
            st["top_k"] = state["top_k"].at[slot].set(top_k)
            st["top_p"] = state["top_p"].at[slot].set(top_p)
            st["temperature"] = state["temperature"].at[slot].set(temperature)
            st["rep_penalty"] = state["rep_penalty"].at[slot].set(rep_penalty)
            st["base_keys"] = state["base_keys"].at[slot].set(jax.random.PRNGKey(seed))
            st["steps"] = state["steps"].at[slot].set(0)
            return st

        fn = jax.jit(prefill_into_slot, donate_argnums=(1,))
        self._prefill_cache[width] = fn
        return fn

    def _admit(self, r: Request, slot: int) -> None:
        width = min(
            -(-len(r.prompt) // self.prompt_bucket) * self.prompt_bucket,
            self.max_seq_len,
        )
        width = max(width, self.prompt_bucket)
        ids = np.full((width,), self.cfg.end_id, np.int32)
        ids[: len(r.prompt)] = r.prompt
        stop_at = min(len(r.prompt) + r.output_len, self.max_seq_len)
        fn = self._get_prefill_fn(width)
        self._state = fn(
            self.engine.params,
            self._state,
            slot,
            jnp.asarray(ids),
            jnp.int32(len(r.prompt)),
            jnp.int32(stop_at),
            jnp.int32(r.top_k),
            jnp.float32(r.top_p),
            jnp.float32(r.temperature),
            jnp.float32(r.repetition_penalty),
            jnp.uint32(r.random_seed),
        )
        r.slot = slot
        self.running[slot] = r

    # ------------------------------------------------------------- tick ----
    def _get_step_fn(self):
        if self._step_fn is not None:
            return self._step_fn
        cfg = self.cfg
        end_id = cfg.end_id
        B, S = self.max_slots, self.max_seq_len

        def step(params, state):
            # forward the last real token of every slot (inactive slots run a
            # dummy position-0 token; their writes land in already-dead space)
            positions = jnp.clip(state["seq_lens"] - 1, 0, S - 1)
            newest = state["tokens"][jnp.arange(B), positions]
            hidden, cache = model.decode_step(
                cfg, params, newest, jnp.where(state["active"], positions, 0),
                state["cache"],
            )
            logits = model.lm_logits(cfg, params, hidden)

            logits = proc.apply_temperature(logits, state["temperature"])
            buf_valid = jnp.arange(S)[None, :] < state["seq_lens"][:, None]
            logits = proc.apply_repetition_penalty(
                logits, state["tokens"], buf_valid, state["rep_penalty"]
            )
            rngs = jax.vmap(jax.random.fold_in)(state["base_keys"], state["steps"])
            res = sample_top_k_top_p(rngs, logits, state["top_k"], state["top_p"])
            tok = jnp.where(state["active"], res.tokens, end_id)

            write_idx = jnp.clip(state["seq_lens"], 0, S - 1)
            tokens = state["tokens"].at[jnp.arange(B), write_idx].set(
                jnp.where(state["active"], tok, state["tokens"][jnp.arange(B), write_idx])
            )
            seq_lens = state["seq_lens"] + jnp.where(state["active"], 1, 0)
            finished = state["active"] & (
                (tok == end_id) | (seq_lens >= state["stop_at"])
            )
            st = dict(state)
            st["cache"] = cache
            st["tokens"] = tokens
            st["seq_lens"] = seq_lens
            st["active"] = state["active"] & ~finished
            st["steps"] = state["steps"] + 1
            return st, tok, finished

        self._step_fn = jax.jit(step, donate_argnums=(1,))
        return self._step_fn

    def step(self) -> List[Tuple[int, int, bool]]:
        """Admit pending requests into free slots, run one decode tick.
        Returns [(uid, token, finished)] for slots that produced a token."""
        for slot in self._free_slots():
            if not self.pending:
                break
            self._admit(self.pending.pop(0), slot)
        if not self.running:
            return []

        fn = self._get_step_fn()
        self._state, tok, finished = fn(self.engine.params, self._state)
        tok_h, fin_h = jax.device_get((tok, finished))

        emitted = []
        for slot, r in list(self.running.items()):
            t = int(tok_h[slot])
            done = bool(fin_h[slot])
            emitted.append((r.uid, t, done))
            if r.on_token is not None:
                r.on_token(t)
            if done:
                row, n = jax.device_get(
                    (self._state["tokens"][slot], self._state["seq_lens"][slot])
                )
                r.output_ids = [int(x) for x in row[: int(n)]]
                r.done = True
                del self.running[slot]
        return emitted

    def run(self, max_ticks: int = 100000) -> Dict[int, Request]:
        """Drive until every submitted request completes; returns uid->Request."""
        finished: Dict[int, Request] = {}
        all_reqs = {r.uid: r for r in self.pending} | {
            r.uid: r for r in self.running.values()
        }
        for _ in range(max_ticks):
            if not self.pending and not self.running:
                break
            for uid, tok, done in self.step():
                pass
        for r in all_reqs.values():
            finished[r.uid] = r
        return finished
