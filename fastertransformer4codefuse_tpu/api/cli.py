"""JSONL request-loop CLI, the analog of the reference's ``__main__`` driver
(codefuse_example.py:909-976). Reads one JSON request per line (the
input_demo.jsonl format) and prints each result.

Usage:
  python -m fastertransformer4codefuse_tpu.api.cli \
      --ckpt_path /path/to/1-gpu --tokenizer_path /path/to/tokenizer \
      --int8_mode 1 --input_file input_demo.jsonl
"""
from __future__ import annotations

import argparse
import json
import logging


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--tokenizer_path", type=str, required=True)
    parser.add_argument("--int8_mode", type=int, default=0)
    parser.add_argument("--tensor_parallel", type=int, default=1)
    parser.add_argument("--dtype", type=str, default="bf16")
    parser.add_argument(
        "--weight_bits", type=int, default=8, choices=(4, 8),
        help="4 serves a .q4.bin int4 checkpoint (needs --int8_mode >= 1)",
    )
    parser.add_argument(
        "--group_size", type=int, default=0,
        help="group-wise W4 scale granularity (0 = per-channel)",
    )
    parser.add_argument(
        "--kv_cache_dtype", type=str, default=None,
        help="e.g. int8 for the quantized KV cache",
    )
    parser.add_argument("--input_file", type=str, required=True)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )

    from .handler import CodeFuseHandler

    handler = CodeFuseHandler(
        ckpt_path=args.ckpt_path,
        tokenizer_path=args.tokenizer_path,
        int8_mode=args.int8_mode,
        tensor_parallel=args.tensor_parallel,
        dtype=args.dtype,
        weight_bits=args.weight_bits,
        group_size=args.group_size,
        kv_cache_dtype=args.kv_cache_dtype,
    )

    with open(args.input_file) as f:
        requests = [json.loads(line.strip()) for line in f if line.strip()]

    for request_dict in requests:
        code, err, result_map = handler.predict(request_dict, "cli")
        if code != 0:
            print(err)
            raise RuntimeError(err)
        res = json.loads(result_map["res"])
        print("#" * 50)
        print("- request\n%s" % json.dumps(request_dict, ensure_ascii=False, indent=4))
        for batch_idx, beam_result in enumerate(res["generated_code"]):
            for beam_idx, result in enumerate(beam_result):
                print(("=" if beam_idx == 0 else "-") * 50)
                print("- batch_idx %d" % batch_idx)
                print("- beam_idx %d" % beam_idx)
                print("- result\n%s" % result)
        print("=" * 50)
        print("- latency %f" % res["latency"])
        print("- random_seed %s" % str(res["random_seed"]))


if __name__ == "__main__":
    main()
