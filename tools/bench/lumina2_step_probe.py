"""Per-step timing probe for the Lumina2 plain generate path.

The r3 on-chip capture showed plain generate at 201 s / 20 steps while the
DeepCache refresh path (same full NextDiT depth) ran at r2 speed — this
probe distinguishes silent per-step recompiles (jax_log_compiles) from
genuinely slow executed steps (block_until_ready per step).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

sys.path.insert(0, os.path.join(_REPO, "tools", "bench"))
from family_generate import MockHFTokenizer  # noqa: E402

from vision_ft_tpu.models.lumina2.config import Lumina2Config  # noqa: E402
from vision_ft_tpu.models.lumina2.pipeline import Lumina2  # noqa: E402


def main() -> None:
    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_log_compiles", True)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    orig = Lumina2._get_jit_step

    def patched(self, *a, **k):
        step = orig(self, *a, **k)

        def timed(*args):
            t0 = time.time()
            out = step(*args)
            jax.block_until_ready(out)
            print(f"[probe] step{a}{k}: {time.time() - t0:.2f}s",
                  file=sys.stderr, flush=True)
            return out

        return timed

    Lumina2._get_jit_step = patched

    model = Lumina2(
        Lumina2Config(checkpoint_path="/nonexistent", dtype="bfloat16"),
        tokenizer=MockHFTokenizer(),
    )
    model.init_params(jax.random.PRNGKey(0))
    print("[probe] init done", file=sys.stderr, flush=True)

    for tag in ("first", "timed"):
        t0 = time.time()
        model.generate(
            "a photo of a cat", seed=0, width=1024, height=1024,
            num_inference_steps=steps, cfg_scale=4.0,
        )
        print(f"[probe] {tag} generate: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
