"""Model registry: the seam for additional decoder-only families.

The reference repo carries 20+ model families behind the same layer/kernel
stack (SURVEY §2.5 — gptj, multi_gpu_gpt, t5, bert...); only the GPT-NeoX
slice serves CodeFuse. This registry keeps the same extension seam: a family
contributes a config parser, a parameter converter, and the three model
functions the engine drives (prefill / decode_step / lm_logits).

GPT-NeoX covers the CodeFuse path; GPT-J and LLaMA-style families slot in by
reusing the same block with different residual/rotary/norm settings.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    config_from_ini: Callable[[str], Any]
    config_from_hf: Callable[[Any], Any]
    params_from_hf: Callable[[Any, Any, Any], Any]
    prefill: Callable
    decode_step: Callable = None  # encoder-only families have no decode loop
    lm_logits: Callable = None
    encode: Callable = None  # encoder families (bert): full bidirectional pass
    # engine seam: class whose .generate() serves this family end-to-end
    # (decoder families ride GptNeoXEngine through api.generate; T5 has its
    # own sampling/beam engine — engine/t5_engine.T5Engine)
    make_engine: Callable = None  # (config, params, **kw) -> engine


_REGISTRY: Dict[str, ModelFamily] = {}


def register(family: ModelFamily) -> None:
    _REGISTRY[family.name] = family


def get(name: str) -> ModelFamily:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model family {name!r}; registered: {sorted(_REGISTRY)}"
        )


def families() -> Dict[str, ModelFamily]:
    return dict(_REGISTRY)


def _register_builtin() -> None:
    from ..core.config import GptNeoXConfig
    from ..ckpt import (
        convert,
        convert_gpt2,
        convert_gptj,
        convert_llama,
        convert_mixtral,
        convert_opt,
        convert_qwen2,
        convert_starcoder,
    )
    from . import gptneox

    register(
        ModelFamily(
            name="gptneox",
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert.config_from_hf,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert.params_from_hf_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
            make_engine=lambda cfg, params, **kw: __import__(
                "fastertransformer4codefuse_tpu.engine.engine",
                fromlist=["GptNeoXEngine"],
            ).GptNeoXEngine(cfg, params, **kw),
        )
    )
    register(
        ModelFamily(
            name="llama",
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_llama.config_from_hf_llama,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_llama.params_from_hf_llama_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )
    register(
        ModelFamily(
            name="gpt",  # multi_gpu_gpt analog: GPT-2/OPT learned positions
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_gpt2.config_from_hf_gpt2,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_gpt2.params_from_hf_gpt2_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )
    from . import bert, t5

    register(
        ModelFamily(
            name="t5",  # encoder-decoder family (the reference's models/t5)
            config_from_ini=None,
            config_from_hf=t5.config_from_hf_t5,
            params_from_hf=lambda cfg, sd, dtype="fp32": t5.params_from_hf_t5_state_dict(
                cfg, sd
            ),
            prefill=t5.encode,
            decode_step=t5.decode_step,
            encode=t5.encode,
            make_engine=lambda cfg, params, **kw: __import__(
                "fastertransformer4codefuse_tpu.engine.t5_engine",
                fromlist=["T5Engine"],
            ).T5Engine(cfg, params, **kw),
        )
    )
    from . import bart, conformer, deberta, longformer, swin, vit, xlnet

    register(
        ModelFamily(
            name="conformer",  # wenet-class audio encoder (the reference's
            # models/wenet + wenet kernels: macaron FFNs + rel attention +
            # conv module)
            config_from_ini=None,
            config_from_hf=conformer.config_from_hf_conformer,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                conformer.params_from_hf_conformer_state_dict(cfg, sd)
            ),
            prefill=conformer.encode,
            encode=conformer.encode,
        )
    )
    register(
        ModelFamily(
            name="xlnet",  # Transformer-XL relative attention (the
            # reference's models/xlnet + xlnet kernels)
            config_from_ini=None,
            config_from_hf=xlnet.config_from_hf_xlnet,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                xlnet.params_from_hf_xlnet_state_dict(cfg, sd)
            ),
            prefill=xlnet.encode,
            encode=xlnet.encode,
        )
    )
    register(
        ModelFamily(
            name="swin",  # shifted-window vision encoder (the reference's
            # models/swin + swin_int8 + tensorrt_plugin/swin)
            config_from_ini=None,
            config_from_hf=swin.config_from_hf_swin,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                swin.params_from_hf_swin_state_dict(cfg, sd)
            ),
            prefill=swin.encode,
            encode=swin.encode,
        )
    )
    register(
        ModelFamily(
            name="marian",  # the classic decoder/decoding lineage (the
            # reference's original seq2seq FT: models/decoder +
            # models/decoding — sinusoidal positions, post-LN enc-dec)
            config_from_ini=None,
            config_from_hf=bart.config_from_hf_marian,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                bart.params_from_hf_marian_state_dict(cfg, sd)
            ),
            prefill=bart.encode,
            decode_step=bart.decode_step,
            encode=bart.encode,
        )
    )
    register(
        ModelFamily(
            name="bart",  # encoder-decoder (the reference's models/bart —
            # learned +2-offset positions, post-LN, scaled attention)
            config_from_ini=None,
            config_from_hf=bart.config_from_hf_bart,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                bart.params_from_hf_bart_state_dict(cfg, sd)
            ),
            prefill=bart.encode,
            decode_step=bart.decode_step,
            encode=bart.encode,
        )
    )
    register(
        ModelFamily(
            name="vit",  # vision encoder (the reference's models/vit +
            # vit_int8 + tensorrt_plugin/vit) — first non-text family
            config_from_ini=None,
            config_from_hf=vit.config_from_hf_vit,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                vit.params_from_hf_vit_state_dict(cfg, sd)
            ),
            prefill=vit.encode,
            encode=vit.encode,
        )
    )
    register(
        ModelFamily(
            name="deberta",  # disentangled-attention encoder (the
            # reference's models/deberta + disentangled_attention_kernels.cu)
            config_from_ini=None,
            config_from_hf=deberta.config_from_hf_deberta,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                deberta.params_from_hf_deberta_state_dict(cfg, sd)
            ),
            prefill=deberta.encode,
            encode=deberta.encode,
        )
    )
    register(
        ModelFamily(
            name="longformer",  # sliding-window + global attention encoder
            # (the reference's models/longformer + longformer_kernels.cu)
            config_from_ini=None,
            config_from_hf=longformer.config_from_hf_longformer,
            params_from_hf=lambda cfg, sd, dtype="fp32": (
                longformer.params_from_hf_longformer_state_dict(cfg, sd)
            ),
            prefill=longformer.encode,
            encode=longformer.encode,
        )
    )
    register(
        ModelFamily(
            name="bert",  # encoder family (the reference's models/bert)
            config_from_ini=None,
            config_from_hf=bert.config_from_hf_bert,
            params_from_hf=lambda cfg, sd, dtype="fp32": bert.params_from_hf_bert_state_dict(
                cfg, sd
            ),
            prefill=bert.encode,  # bidirectional full pass
            encode=bert.encode,
            make_engine=lambda cfg, params, **kw: bert.BertEngine(
                cfg, params, **kw
            ),
        )
    )
    register(
        ModelFamily(
            name="mixtral",  # sparse MoE: top-2 routed experts, EP sharding
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_mixtral.config_from_hf_mixtral,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_mixtral.params_from_hf_mixtral_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )
    register(
        ModelFamily(
            name="opt",  # multi_gpu_gpt's other lineage: OPT checkpoints
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_opt.config_from_hf_opt,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_opt.params_from_hf_opt_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )
    register(
        ModelFamily(
            name="starcoder",  # GPTBigCode: multi-query + learned positions
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_starcoder.config_from_hf_starcoder,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_starcoder.params_from_hf_starcoder_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )
    register(
        ModelFamily(
            name="qwen2",
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_qwen2.config_from_hf_qwen2,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_qwen2.params_from_hf_qwen2_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )
    register(
        ModelFamily(
            name="gptj",
            config_from_ini=GptNeoXConfig.from_ini,
            config_from_hf=convert_gptj.config_from_hf_gptj,
            params_from_hf=lambda cfg, sd, dtype="fp32": convert_gptj.params_from_hf_gptj_state_dict(
                cfg, sd, dtype
            ),
            prefill=gptneox.prefill,
            decode_step=gptneox.decode_step,
            lm_logits=gptneox.lm_logits,
        )
    )


_register_builtin()
