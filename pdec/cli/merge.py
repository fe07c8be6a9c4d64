"""LoRA merge + HF export CLI (reference ``train/scripts/merge_model.py``:
peft adapter + base -> merged safetensors + tokenizer).

    python -m pdec.cli.merge --base <hf-dir> --adapter <orbax-dir> \\
        --out merged_model/
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True, help="HF base checkpoint dir")
    p.add_argument("--adapter", required=True, help="orbax LoRA checkpoint")
    p.add_argument("--out", required=True)
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--alpha", type=float, default=256.0)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    from safetensors.numpy import save_file

    from pdec.models.hf_import import load_hf_checkpoint, state_dict_from_params
    from pdec.models.lora import init_lora, merge_lora

    cfg, params = load_hf_checkpoint(args.base)
    like = init_lora(jax.random.PRNGKey(0), cfg, rank=args.rank,
                     alpha=args.alpha)
    lora = ocp.StandardCheckpointer().restore(
        os.path.abspath(args.adapter), like
    )
    merged = merge_lora(params, lora)
    state = state_dict_from_params(merged, cfg)

    os.makedirs(args.out, exist_ok=True)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in state.items()},
        os.path.join(args.out, "model.safetensors"),
    )
    # carry over config + tokenizer files for drop-in HF loading
    with open(os.path.join(args.base, "config.json")) as f:
        config = json.load(f)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    for fn in os.listdir(args.base):
        if "tokenizer" in fn or fn == "special_tokens_map.json":
            with open(os.path.join(args.base, fn), "rb") as src:
                with open(os.path.join(args.out, fn), "wb") as dst:
                    dst.write(src.read())
    print(f"merged model written to {args.out}")


if __name__ == "__main__":
    main()
