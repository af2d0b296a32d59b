"""Per-family full-size generate() benchmark on one TPU chip.

Times the complete user path (text encode + jitted denoise loop + VAE
decode) for the flow-match families at their native resolutions with
randomly-initialized full-size weights (generation quality is irrelevant
to throughput; matmul timing is value-independent). SDXL's numbers live
in bench.py / BASELINE.md.

Usage: python tools/bench/family_generate.py [auraflow lumina2 cogview4]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp


class MockHFTokenizer:
    """HF-call-compatible stub (ids dict); real runs pass AutoTokenizer."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def __call__(self, prompts, max_length=None, **kw):
        ids = []
        mask = []
        for p in prompts:
            toks = [3 + (hash(w) % 1000) for w in p.split()][: max_length - 1]
            row = toks + [self.eos_token_id]
            m = [1] * len(row) + [0] * (max_length - len(row))
            row += [self.pad_token_id] * (max_length - len(row))
            ids.append(row)
            mask.append(m)
        return {"input_ids": np.asarray(ids), "attention_mask": np.asarray(mask)}


def bench(name: str, deep_cache: int | None = None, batch: int = 1,
          res: int | None = None):
    t_build = time.time()
    base = name
    for suffix in ("_nf4", "_w8a8"):
        if name.endswith(suffix):
            base = name[: -len(suffix)]
            break
    if base == "sdxl":
        from vision_ft_tpu.models.sdxl.pipeline import SDXLConfig, SDXLModel

        class MockCLIPTokenizer:
            bos_token_id = 0
            eos_token_id = 49407
            pad_token_id = 49407

            def __call__(self, prompts, max_length=None, **kw):
                rows = []
                for p in prompts:
                    ids = [3 + (hash(w) % 40000) for w in p.split()][: max_length - 2]
                    row = [0, *ids, self.eos_token_id]
                    row += [self.pad_token_id] * (max_length - len(row))
                    rows.append(row)
                return np.asarray(rows, np.int32)

        model = SDXLModel(
            SDXLConfig(checkpoint_path="/nonexistent", dtype="bfloat16"),
            tokenizer=MockCLIPTokenizer(),
        )
        kwargs = dict(width=1024, height=1024, num_inference_steps=20, cfg_scale=4.0)
        if deep_cache:
            kwargs["deep_cache_interval"] = deep_cache
    elif base == "auraflow":
        from vision_ft_tpu.models.auraflow.config import AuraFlowConig
        from vision_ft_tpu.models.auraflow.pipeline import AuraFlowModel

        model = AuraFlowModel(
            AuraFlowConig(checkpoint_path="/nonexistent", dtype="bfloat16"),
            tokenizer=MockHFTokenizer(),
        )
        kwargs = dict(width=1024, height=1024, num_inference_steps=20, cfg_scale=4.0)
        # NF4 posture: quantize the UMT5-XXL text encoder too (4.7B bf16
        # = 9.4 GB resident next to the NF4 denoiser OOM'd; staged offload
        # "works" but the axon tunnel's host<->device bandwidth turned the
        # ~26 GB of per-generate param migration into 609 s on-chip, r3).
        # NF4 UMT5 is 2.35 GB -> everything stays HBM-resident, zero
        # transfers. On a 24 GB part the reference keeps the TE bf16; same
        # trade, different HBM budget.
        if deep_cache:
            kwargs["deep_cache_interval"] = deep_cache
    elif base == "lumina2":
        from vision_ft_tpu.models.lumina2.config import Lumina2Config
        from vision_ft_tpu.models.lumina2.pipeline import Lumina2

        model = Lumina2(
            Lumina2Config(checkpoint_path="/nonexistent", dtype="bfloat16"),
            tokenizer=MockHFTokenizer(),
        )
        kwargs = dict(width=1024, height=1024, num_inference_steps=20, cfg_scale=4.0)
        if deep_cache:
            kwargs["deep_cache_interval"] = deep_cache
    elif base == "cogview4":
        from vision_ft_tpu.models.cogview4.config import CogView4Config
        from vision_ft_tpu.models.cogview4.pipeline import CogView4Model

        model = CogView4Model(
            CogView4Config(checkpoint_path="/nonexistent", dtype="bfloat16"),
            tokenizer=MockHFTokenizer(),
        )
        kwargs = dict(width=1024, height=1024, num_inference_steps=20, cfg_scale=4.0)
        if deep_cache:
            kwargs["deep_cache_interval"] = deep_cache
    elif base == "flux":
        from vision_ft_tpu.models.flux.config import FluxConfig
        from vision_ft_tpu.models.flux.pipeline import FluxModel

        class MockCLIPTok:
            bos_token_id = 0
            eos_token_id = 49407
            pad_token_id = 49407

            def __call__(self, prompts, max_length=None, **kw):
                rows = []
                for p in prompts:
                    ids = [3 + (hash(w) % 40000) for w in p.split()][: max_length - 2]
                    row = [0, *ids, self.eos_token_id]
                    row += [self.pad_token_id] * (max_length - len(row))
                    rows.append(row)
                return np.asarray(rows, np.int32)

        model = FluxModel(
            FluxConfig(checkpoint_path="/nonexistent", dtype="bfloat16"),
            clip_tokenizer=MockCLIPTok(), t5_tokenizer=MockHFTokenizer(),
        )
        # flux1-dev is 12B: bf16 denoiser alone exceeds 16 GB HBM, so only
        # the NF4 variant is benchable. NF4 denoiser (6 GB) + NF4 T5-XXL
        # (2.35 GB) + bf16 CLIP/VAE all fit HBM together — no offload
        # staging (the axon tunnel makes per-generate param migration
        # pathologically slow; see the auraflow_nf4 posture note)
        if not name.endswith("_nf4"):
            raise SystemExit("flux is benchable as flux_nf4 only (12B bf16 > 16 GB)")
        kwargs = dict(width=1024, height=1024, num_inference_steps=20,
                      cfg_scale=1.0, distilled_guidance_scale=3.5)
        if deep_cache:
            kwargs["deep_cache_interval"] = deep_cache
    else:
        raise SystemExit(f"unknown family {name}")

    if name.endswith("_nf4"):
        # 6.8B-class families don't fit one 16 GB chip in bf16 (params +
        # XXL text encoder + activations) — same posture as the reference,
        # which targets 24 GB GPUs with bitsandbytes NF4. A full bf16
        # on-device init would OOM before quantization, so build the
        # packed-NF4 denoiser layout straight from the abstract shapes
        # (generate timing is value-independent) and zeros elsewhere.
        from quant_zeros import quantize_params_zeros

        key = jax.random.PRNGKey(0)
        abstract = {
            "denoiser": jax.eval_shape(lambda k: model.denoiser.init(k, jnp.bfloat16), key),
            "vae": jax.eval_shape(lambda k: model.vae.init(k, jnp.bfloat16), key),
            "text_encoder": jax.eval_shape(
                lambda k: model.text_encoder.init(k, jnp.bfloat16), key
            ),
        }
        # staged-offload runs (flux) start everything on the host; generate
        # moves each submodule on-device for its stage
        dev = (jax.devices("cpu")[0] if kwargs.get("do_offloading")
               else jax.devices()[0])
        nf4_keys = {
            "flux": ["qkv", ".proj", "linear1", "linear2",
                     "img_mlp", "txt_mlp", "img_attn", "txt_attn"],
            "cogview4": ["to_q", "to_k", "to_v", "to_out", ".proj"],
        }.get(base, ["attn", "c_fc1", "c_fc2", "c_proj", "linear_1", "linear_2"])
        # auraflow_nf4: quantize the XXL text encoder's big Linears too so
        # the whole pipeline is HBM-resident (see posture note above)
        te_nf4_keys = {
            "auraflow": ["SelfAttention.q", "SelfAttention.k",
                         "SelfAttention.v", "SelfAttention.o",
                         "wi_0", "wi_1", "wo"],
            # flux: quantize the T5 tower (same UMT5 key layout under
            # "t5."); CLIP (250 MB bf16) stays bf16
            "flux": ["SelfAttention.q", "SelfAttention.k",
                     "SelfAttention.v", "SelfAttention.o",
                     "wi_0", "wi_1", "wo"],
            # cogview4: the GLM-4-9B tower (18 GB bf16) is the reason the
            # full-bf16 posture can never fit a 16 GB chip (r4 bisect:
            # the "compiler crash" was compile-time OOM)
            "cogview4": ["q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_up_proj", "down_proj"],
        }.get(base)
        if te_nf4_keys is not None:
            te_params = quantize_params_zeros(abstract["text_encoder"], te_nf4_keys)
        else:
            te_params = jax.tree.map(
                lambda a: np.zeros(a.shape, a.dtype), abstract["text_encoder"]
            )
        model.params = {
            "denoiser": jax.device_put(
                quantize_params_zeros(abstract["denoiser"], nf4_keys),
                dev,
            ),
            "vae": jax.device_put(
                jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), abstract["vae"]), dev
            ),
            "text_encoder": jax.device_put(te_params, dev),
        }
    else:
        model.init_params(jax.random.PRNGKey(0))
        if name.endswith("_w8a8"):
            # W8A8 compute-in-int8 A/B (modules/quant int8_w8a8): quantize
            # the denoiser's Linear weights in place; attention/ff matmuls
            # then run s8 x s8 -> s32 on the MXU's 2x-rate int8 path.
            from vision_ft_tpu.modules.quant import quantize_params

            include = {
                "sdxl": ["attn1", "attn2", ".ff."],
                "lumina2": ["qkv", ".out", "w1", "w2", "w3"],
                "auraflow": [".attn.", "c_fc1", "c_fc2", "c_proj"],
                "cogview4": ["to_q", "to_k", "to_v", "to_out", ".proj"],
            }[base]
            model.params["denoiser"] = quantize_params(
                model.params["denoiser"], "int8_w8a8", include_keys=include
            )
    print(f"[{name}] init {time.time() - t_build:.0f}s", file=sys.stderr, flush=True)

    if res is not None:
        kwargs["width"] = kwargs["height"] = res
    prompts = [f"a photo of a cat {i}" for i in range(batch)]
    prompt = prompts if batch > 1 else prompts[0]
    t0 = time.time()
    model.generate(prompt, seed=0, **kwargs)
    print(f"[{name}] first generate (incl compile): {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    model.generate(prompt, seed=0, **kwargs)
    el = time.time() - t0
    steps = kwargs["num_inference_steps"]
    px = kwargs["width"]
    dc = kwargs.get("deep_cache_interval")
    tag = f', "deep_cache_interval": {dc}' if dc else ""
    btag = f', "batch": {batch}' if batch > 1 else ""
    print(
        f'{{"family": "{name}", "generate_{px}px_{steps}steps_s": {el:.2f}, '
        f'"steps_per_sec": {steps / el:.2f}{tag}{btag}}}',
        flush=True,
    )


def main():
    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    argv = sys.argv[1:]
    deep_cache = None
    batch, res = 1, None
    if "--deep-cache" in argv:  # DeepCache interval (image families)
        i = argv.index("--deep-cache")
        try:
            deep_cache = int(argv[i + 1])
        except (IndexError, ValueError):
            sys.exit("usage: --deep-cache <int> (sdxl/lumina2/auraflow/cogview4)")
        argv = argv[:i] + argv[i + 2:]
    if "--batch" in argv:  # batch-scaling A/B (e.g. server collation sizes)
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--res" in argv:
        i = argv.index("--res")
        res = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    families = argv or ["lumina2", "auraflow", "cogview4"]
    if deep_cache and any(
            f.split("_")[0] not in ("sdxl", "lumina2", "auraflow",
                                    "cogview4", "flux")
            for f in families):
        sys.exit("--deep-cache applies to sdxl/lumina2/auraflow/cogview4/flux")
    for name in families:
        try:
            bench(name, deep_cache=deep_cache, batch=batch, res=res)
        except Exception as e:  # OOM on 16 GB chips for the biggest families
            print(f'{{"family": "{name}", "error": "{type(e).__name__}: '
                  f'{str(e)[:120]}"}}', flush=True)


if __name__ == "__main__":
    main()
