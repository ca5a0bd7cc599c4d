"""Long-lived serving front end over the continuous batcher.

Capability beyond the reference: its serving story runs one static batch to
completion per forward while new requests queue outside the engine (the
Triton instance model, triton_backend/gptneox/GptNeoXTritonModel.cc:29-38, and
the long-lived CodeFuseHandler loop, codefuse_example.py:814-905). Here a
single driver thread ticks a ContinuousBatcher slot pool; requests submitted
from ANY thread join mid-flight by chunk-prefilling into a free slot and
retire the moment they finish, so short requests never wait behind long ones.

Threading contract: all JAX work happens on the driver thread (the batcher is
not thread-safe); ``submit``/``generate`` only append to a mutex-guarded
mailbox and wait on per-request events. Streaming callbacks fire on the
driver thread — keep them cheap (the handler's detokenizer sink is).
"""
from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional, Sequence

from .batcher import ContinuousBatcher, Request
from .engine import GptNeoXEngine


class BatchingServer:
    """Thread-safe request mailbox + driver thread around ContinuousBatcher."""

    def __init__(self, engine: GptNeoXEngine, **pool_kwargs):
        # beam_width >= 2 makes this a beam-serving pool: every slot decodes
        # beam_width hypotheses through the shared cache-indirection scheme
        # (engine/beam_pool.py; the reference serves beams inside the same
        # forward via DynamicDecodeLayer.cc:309-409)
        bw = int(pool_kwargs.pop("beam_width", 1) or 1)
        spec = bool(pool_kwargs.pop("speculative", False))
        if spec:
            # speculative-serving pool (engine/spec_pool.py): the decode tick
            # is a (k+1)-wide prompt-lookup verify; greedy-only requests
            assert bw == 1, "speculative pools are greedy (beam_width 1)"
            from .spec_pool import SpecPool

            pool_kwargs.pop("sampling_cap", None)
            if pool_kwargs.pop("paged", None):
                raise ValueError(
                    "speculative pools are dense-KV; drop paged= or "
                    "speculative="
                )
            self.batcher = SpecPool(
                engine,
                k=int(pool_kwargs.pop("spec_k", 8)),
                ngram=int(pool_kwargs.pop("spec_ngram", 3)),
                **pool_kwargs,
            )
        elif bw > 1:
            from .beam_pool import BeamPool

            pool_kwargs.pop("sampling_cap", None)  # beams ignore top-k/top-p
            if pool_kwargs.pop("paged", None):
                # silently building a dense pool would multiply HBM use by
                # beam_width vs the requested page budget — refuse loudly
                raise ValueError(
                    "beam pools are dense (beam indirection addresses "
                    "row-contiguous slabs); drop paged= or use beam_width=1"
                )
            # return_log_probs is dropped WITHOUT degradation: beam scores
            # (cum log-probs per hypothesis) are intrinsic to the search and
            # returned on every request (Request.beam_cum_log_probs)
            pool_kwargs.pop("return_log_probs", None)
            self.batcher = BeamPool(engine, beam_width=bw, **pool_kwargs)
        else:
            self.batcher = ContinuousBatcher(engine, **pool_kwargs)
        self._lock = threading.Lock()
        self._mailbox: List[Request] = []
        self._events: Dict[int, threading.Event] = {}
        self._wake = threading.Event()
        self._shutdown = False
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._drive, name="ftcf-pool-driver", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------ client ----
    def submit(
        self,
        prompt: Sequence[int],
        output_len: int,
        on_token: Optional[Callable[[int], None]] = None,
        on_text: Optional[Callable[[str], None]] = None,
        tokenizer=None,
        **kw,
    ) -> int:
        """Enqueue one request; returns its uid immediately. The request joins
        the pool at the driver's next tick."""
        assert not self._shutdown, "server is shut down"
        if self._error is not None:
            raise RuntimeError("pool driver died") from self._error
        if len(prompt) + output_len > self.batcher.max_seq_len:
            raise ValueError(
                f"prompt({len(prompt)}) + output({output_len}) exceeds the "
                f"pool's max_seq_len {self.batcher.max_seq_len}"
            )
        r = self.batcher.make_request(
            prompt, output_len, on_token=on_token, on_text=on_text,
            tokenizer=tokenizer, **kw,
        )
        with self._lock:
            self._mailbox.append(r)
            self._events[r.uid] = threading.Event()
        if self._error is not None:
            # driver died between the entry check and event registration:
            # _drive's error broadcast may have run before our event existed
            # — set it ourselves so wait() cannot hang forever
            self._events[r.uid].set()
        self._wake.set()
        return r.uid

    def wait(self, uid: int, timeout: Optional[float] = None) -> Request:
        """Block until request ``uid`` completes; returns the finished Request
        (output_ids, cum_log_prob, ...) and forgets it server-side."""
        ev = self._events[uid]
        if not ev.wait(timeout):
            raise TimeoutError(f"request {uid} still running after {timeout}s")
        with self._lock:
            req = self.batcher.requests.get(uid)
            if req is not None and req.done:
                # completed BEFORE any (possibly later, unrelated) driver
                # death — return the finished result rather than discarding it
                self._events.pop(uid, None)
                return self.batcher.requests.pop(uid)
        if self._error is not None:
            raise RuntimeError("pool driver died") from self._error
        with self._lock:
            self._events.pop(uid, None)
            return self.batcher.requests.pop(uid)

    def generate(self, prompt: Sequence[int], output_len: int, **kw) -> Request:
        """submit + wait convenience for synchronous callers."""
        return self.wait(self.submit(prompt, output_len, **kw))

    def routable_pool(self, need: int, beam_width: int = 1):
        """The batcher a (length, beam_width) request would land in, or None.
        Used by the handler's pool-routability check to validate word-list
        widths against the RIGHT pool class."""
        b = self.batcher
        if getattr(b, "beam_width", 1) != beam_width:
            return None
        return b if need <= b.max_seq_len else None

    def close(self):
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------ driver ----
    def _drain_mailbox(self):
        with self._lock:
            todo = list(self._mailbox)
            self._mailbox.clear()
        for r in todo:
            self.batcher.enqueue(r)

    def _drive(self):
        b = self.batcher
        try:
            while not self._shutdown:
                self._drain_mailbox()
                if not (b.pending or b.running or b._inflight):
                    self._wake.wait()
                    self._wake.clear()
                    continue
                for uid, _tok, done in b.step():
                    if done:
                        ev = self._events.get(uid)
                        if ev is not None:
                            ev.set()
        except BaseException as e:  # noqa: BLE001 — surfaced to every waiter
            self._error = e
            for ev in list(self._events.values()):
                ev.set()


class MultiPoolServer:
    """Length-classed slot pools over ONE engine (shared weights).

    The single-pool server sizes every slot's cache region for the WORST-CASE
    request (``max_seq_len``), so a 64-token request in a 2048-slot pool pays
    2048-wide attention reads and holds 2048 slots of HBM. Here each request
    routes to the SMALLEST pool class it fits; each pool has its own driver
    thread, and their per-tick programs interleave on the device (short-class
    ticks are cheap, so they slipstream between long-class ticks).

    ``pools``: list of BatchingServer kwargs, e.g.
    ``[dict(max_slots=16, max_seq_len=256), dict(max_slots=4, max_seq_len=2048)]``.
    API-compatible with BatchingServer (submit/wait/generate/close).
    """

    def __init__(self, engine: GptNeoXEngine, pools):
        assert pools, "need at least one pool class"
        self.servers = sorted(
            (BatchingServer(engine, **kw) for kw in pools),
            key=lambda s: s.batcher.max_seq_len,
        )
        self._route: Dict[int, BatchingServer] = {}

    @property
    def batcher(self):  # compatibility: the largest class bounds capacity
        return self.servers[-1].batcher

    def submit(self, prompt, output_len: int, **kw) -> int:
        need = len(prompt) + output_len
        # beam requests route only to beam classes of the SAME width (the
        # width is a pool-level static); sampling requests only to bw=1 pools
        bw = int(kw.pop("beam_width", 1) or 1)
        for srv in self.servers:
            if getattr(srv.batcher, "beam_width", 1) != bw:
                continue
            if need <= srv.batcher.max_seq_len:
                uid = srv.submit(prompt, output_len, **kw)
                # uids are process-globally unique (batcher._UIDS)
                self._route[uid] = srv
                return uid
        raise ValueError(
            f"prompt({len(prompt)}) + output({output_len}) @ beam_width={bw} "
            f"fits no pool class (largest {self.servers[-1].batcher.max_seq_len})"
        )

    def routable_pool(self, need: int, beam_width: int = 1):
        for srv in self.servers:
            b = srv.routable_pool(need, beam_width)
            if b is not None:
                return b
        return None

    def wait(self, uid: int, timeout=None):
        # pop only AFTER a successful wait — a TimeoutError must leave the
        # route intact so the caller can retry and still retrieve the result
        result = self._route[uid].wait(uid, timeout)
        self._route.pop(uid, None)
        return result

    def generate(self, prompt, output_len: int, **kw):
        return self.wait(self.submit(prompt, output_len, **kw))

    def close(self):
        for srv in self.servers:
            srv.close()
