"""Train a byte-level T5 proxy and measure the int8 quality delta.

The T5 analog of tools/train_proxy.py + quality_table.py (VERDICT r4 item 3's
"int8 quality row in QUALITY.md"): no checkpoints are downloadable here, and
random weights are a dishonest quantization testbed, so a small T5 trains as
a byte-level PREFIX-LM on this repo's source text (window -> first half is
the encoder input, second half is the decoder target), then fp32 vs int8
(models.t5.quantize_t5_params) run teacher-forced NLL over held-out bytes
plus greedy agreement through the same T5Engine serving path.

The training forward IS the inference code: loss = lax.scan of
models.t5.decode_step over target positions (incremental cache + cross
attention), so the quantization eval measures exactly the served program.

  python tools/t5_quality_row.py --steps 400
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()

VOCAB = 259  # 0 = pad/decoder-start, 1 = eos, bytes at id 2..257


def proxy_config():
    from fastertransformer4codefuse_tpu.models.t5 import T5Config

    return T5Config(
        head_num=4, size_per_head=64, d_model=256, layer_num=4,
        dec_layer_num=4, vocab_size=VOCAB, inter_size=1024, num_buckets=32,
        max_distance=128, activation="relu", start_id=0, end_id=1,
        tie_head=True,
    )


def init_t5_params(cfg, key):
    import jax
    import jax.numpy as jnp

    k = iter(jax.random.split(key, 64))
    D, nH, dh, F = cfg.d_model, cfg.head_num, cfg.size_per_head, cfg.inter_size
    n = nH * dh

    def dense(shape, scale):
        return jax.random.normal(next(k), shape, jnp.float32) * scale

    def stack_attn(L):
        return {
            "ln1_w": jnp.ones((L, D)),
            "q_w": dense((L, D, n), (D * dh) ** -0.5),
            "k_w": dense((L, D, n), D ** -0.5),
            "v_w": dense((L, D, n), D ** -0.5),
            "o_w": dense((L, n, D), n ** -0.5),
            "ln2_w": jnp.ones((L, D)),
            "wi": dense((L, D, F), D ** -0.5),
            "wo": dense((L, F, D), F ** -0.5),
        }

    enc = stack_attn(cfg.layer_num)
    dec = stack_attn(cfg.dec_layer_num)
    Ld = cfg.dec_layer_num
    dec.update({
        "ln_x_w": jnp.ones((Ld, D)),
        "xq_w": dense((Ld, D, n), (D * dh) ** -0.5),
        "xk_w": dense((Ld, D, n), D ** -0.5),
        "xv_w": dense((Ld, D, n), D ** -0.5),
        "xo_w": dense((Ld, n, D), n ** -0.5),
    })
    return {
        "embed": dense((cfg.vocab_size, D), 1.0),
        "enc": enc,
        "dec": dec,
        "enc_rel_bias": dense((cfg.num_buckets, nH), 0.5),
        "dec_rel_bias": dense((cfg.num_buckets, nH), 0.5),
        "enc_final_ln_w": jnp.ones((D,)),
        "dec_final_ln_w": jnp.ones((D,)),
    }


def batch_loss(cfg, params, enc_ids, dec_targets):
    """Teacher-forced prefix-LM loss through the SERVING code path."""
    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.models import t5 as t5m

    B, T = dec_targets.shape
    S = enc_ids.shape[1]
    lens = jnp.full((B,), S, jnp.int32)
    enc = t5m.encode(cfg, params, enc_ids, lens)
    state = t5m.init_decoder_state(cfg, params, enc, lens, T + 1)
    # decoder inputs: start token then shifted targets
    dec_in = jnp.concatenate(
        [jnp.full((B, 1), cfg.start_id, jnp.int32), dec_targets[:, :-1]], axis=1
    )

    def step(carry, t):
        state = carry
        logits, state = t5m.decode_step(cfg, params, state, dec_in[:, t], t)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, dec_targets[:, t][:, None], axis=1)
        return state, nll[:, 0]

    _, nlls = jax.lax.scan(step, state, jnp.arange(T))  # [T, B]
    return jnp.mean(nlls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=96, help="enc and dec window")
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--eval-bytes", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from train_proxy import load_corpus
    from fastertransformer4codefuse_tpu.models import t5 as t5m

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    data = load_corpus(root, extra_roots=["/root/reference/src"]) + 2  # byte -> id
    split = len(data) - 4 * args.eval_bytes
    train, held = data[:split], data[split:]
    print(f"corpus {len(data)/1e6:.1f}MB (held-out {len(held)/1e3:.0f}KB)")

    cfg = proxy_config()
    params = init_t5_params(cfg, jax.random.PRNGKey(0))
    n_par = sum(x.size for x in jax.tree.leaves(params))
    print(f"T5 proxy params: {n_par/1e6:.1f}M")

    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(0, args.lr, 40, args.steps), 0.9,
        0.98, weight_decay=0.01,
    )
    opt_state = opt.init(params)
    W = 2 * args.ctx

    @jax.jit
    def train_step(params, opt_state, enc_ids, dec_tgt):
        loss, grads = jax.value_and_grad(
            lambda p: batch_loss(cfg, p, enc_ids, dec_tgt)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        starts = rng.integers(0, len(train) - W, size=args.batch)
        win = np.stack([train[s: s + W] for s in starts])
        enc_ids = jnp.asarray(win[:, : args.ctx], jnp.int32)
        dec_tgt = jnp.asarray(win[:, args.ctx:], jnp.int32)
        params, opt_state, loss = train_step(params, opt_state, enc_ids, dec_tgt)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.3f} nats/byte "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---------------------------------------------------------------- eval --
    eval_fn = jax.jit(lambda p, e, d: batch_loss(cfg, p, e, d))

    def eval_nll(p):
        tot, cnt = 0.0, 0
        for s in range(0, len(held) - W, W):
            win = held[s: s + W]
            e = jnp.asarray(win[None, : args.ctx], jnp.int32)
            d = jnp.asarray(win[None, args.ctx:], jnp.int32)
            tot += float(eval_fn(p, e, d)) * args.ctx
            cnt += args.ctx
        return tot / cnt

    qp = t5m.quantize_t5_params(params)
    nll_fp = eval_nll(params)
    nll_i8 = eval_nll(qp)

    # greedy agreement through the serving engine (8 prompts x 48 tokens)
    from fastertransformer4codefuse_tpu.engine.t5_engine import T5Engine

    eng_fp = T5Engine(cfg, params)
    eng_i8 = T5Engine(cfg, qp)
    agree = tot_toks = 0
    for i in range(8):
        s = int(rng.integers(0, len(held) - args.ctx))
        prompt = [int(x) for x in held[s: s + args.ctx]]
        a = eng_fp.generate([prompt], 48)
        b = eng_i8.generate([prompt], 48)
        na = int(a.sequence_lengths[0, 0])
        for x, y in zip(a.output_ids[0, 0, :na], b.output_ids[0, 0, :na]):
            tot_toks += 1
            if x == y:
                agree += 1
            else:
                break
    print(
        f"T5 proxy quality: fp32 NLL {nll_fp:.4f} | int8 NLL {nll_i8:.4f} "
        f"(dNLL {nll_i8-nll_fp:+.4f}) | greedy agreement "
        f"{agree}/{tot_toks} = {agree/max(tot_toks,1):.1%}",
        flush=True,
    )


if __name__ == "__main__":
    main()
