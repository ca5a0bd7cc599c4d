"""A/B the decode-attention paths: Pallas flash-decode vs the XLA fused path.

Produces the XLA-vs-Pallas table for STATUS (VERDICT round-1 weak #4: "show a
measured win vs the XLA path at S>=2048 and enable by default") and the data
for the static S gate in engine/kv_cache.attend_decode — flash-decode's
per-call overhead loses at tiny caches (the int8-64in-32out bench config
regressed 48->34 tok/s when it was enabled unconditionally).

Timing: one jitted fori_loop of ITERS*L attention calls, a single device sync
(the tunnel's ~30ms sync floor forbids per-call timing). The Pallas arm reads
only ceil(pos/bs) chunks (DMA clamp); pos is set to S-16 so both arms stream
essentially the whole cache — the fair comparison for a full-length decode.

Usage: python tools/flash_ab.py [int8|bf16|all]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fastertransformer4codefuse_tpu.engine import kv_cache
from fastertransformer4codefuse_tpu.ops.flash_decode import flash_decode_stacked

L, B, nH, dh = 8, 1, 40, 128
ITERS = 60
S_LIST = [128, 512, 1088, 2048, 4096, 8192]


def mk_cache(S, quantized):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    shape = (L, B, nH, S, dh)
    if quantized:
        return {
            "k": jax.random.randint(ks[0], shape, -127, 128, jnp.int32).astype(jnp.int8),
            "v": jax.random.randint(ks[1], shape, -127, 128, jnp.int32).astype(jnp.int8),
            "k_s": (jax.random.uniform(ks[2], shape[:-1]) * 0.02).astype(jnp.bfloat16),
            "v_s": (jax.random.uniform(ks[3], shape[:-1]) * 0.02).astype(jnp.bfloat16),
        }
    return {
        "k": jax.random.normal(ks[0], shape, jnp.bfloat16),
        "v": jax.random.normal(ks[1], shape, jnp.bfloat16),
    }


def time_loop(fn, cache, q, positions):
    @jax.jit
    def loop(cache, q, positions):
        def body(i, acc):
            o = fn(cache, jnp.mod(i, L), q, positions)
            return acc + o[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS * L, body, jnp.float32(0))

    float(loop(cache, q, positions))  # compile + warm
    t0 = time.perf_counter()
    float(loop(cache, q, positions))
    dt = time.perf_counter() - t0
    return dt / (ITERS * L) * 1e6


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sm = 1.0 / (dh ** 0.5)
    q = jax.random.normal(jax.random.PRNGKey(7), (B, nH, dh), jnp.bfloat16)

    def xla_arm(cache, layer, q, positions):
        S = cache["k"].shape[3]
        valid = jnp.arange(S)[None, :] <= positions[:, None]
        kv_cache.set_flash_decode(False)
        return kv_cache.attend_decode(cache, layer, q, valid, sm, positions=None)

    def pallas_arm(cache, layer, q, positions):
        return flash_decode_stacked(
            q, cache["k"], cache.get("k_s"), cache["v"], cache.get("v_s"),
            layer, positions, sm_scale=sm,
        )

    for qz in ([True] if which == "int8" else [False] if which == "bf16" else [True, False]):
        name = "int8" if qz else "bf16"
        bytes_per = 2 * B * nH * dh * (1 if qz else 2)  # per position, K+V
        print(f"== {name} cache ==", flush=True)
        for S in S_LIST:
            cache = mk_cache(S, qz)
            positions = jnp.full((B,), S - 16, jnp.int32)
            sol = S * bytes_per / 819e3  # us at full HBM bw
            t_x = time_loop(xla_arm, cache, q, positions)
            t_p = time_loop(pallas_arm, cache, q, positions)
            win = (t_x - t_p) / t_x * 100
            print(
                f"S={S:5d}  xla {t_x:7.1f}us  pallas {t_p:7.1f}us  "
                f"(SoL {sol:5.1f}us, pallas {'+' if win >= 0 else ''}{win:.0f}%)",
                flush=True,
            )
            del cache


if __name__ == "__main__":
    main()
