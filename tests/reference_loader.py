"""Load modules from the read-only PyTorch reference for golden parity tests.

The reference at /root/reference is the behavioral spec; tests import its
modules (never copy them) to generate goldens on the fly (SURVEY.md §4
tier 2: numerical parity fixtures against the PyTorch reference).
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_diffusers():
    """diffusers isn't installed; stub the handful of symbols the reference
    imports at module scope so non-VAE modules (denoiser, scheduler) load."""
    if "diffusers" in sys.modules:
        return
    import torch.nn as nn

    def _module(name):
        import importlib.machinery

        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
        return mod

    diffusers = _module("diffusers")
    models = _module("diffusers.models")
    autoencoders = _module("diffusers.models.autoencoders")
    ak = _module("diffusers.models.autoencoders.autoencoder_kl")
    ak_wan = _module("diffusers.models.autoencoders.autoencoder_kl_wan")
    schedulers = _module("diffusers.schedulers")
    fm = _module("diffusers.schedulers.scheduling_flow_match_euler_discrete")

    class AutoencoderKL(nn.Module):
        @classmethod
        def from_config(cls, *a, **k):
            raise RuntimeError("diffusers stub: not instantiable in tests")

    class AutoencoderKLWan(AutoencoderKL):
        pass

    class FlowMatchEulerDiscreteScheduler:
        def __init__(self, *a, **k):
            raise RuntimeError("diffusers stub: not instantiable in tests")

    ak.AutoencoderKL = AutoencoderKL
    ak_wan.AutoencoderKLWan = AutoencoderKLWan
    fm.FlowMatchEulerDiscreteScheduler = FlowMatchEulerDiscreteScheduler
    diffusers.models = models
    models.autoencoders = autoencoders
    diffusers.schedulers = schedulers

    # bitsandbytes / torchao: CUDA-only quant libs pulled in by the
    # reference's pipeline import chain; stub enough surface for import.
    bnb = _module("bitsandbytes")
    bnb_functional = _module("bitsandbytes.functional")
    bnb_nn = _module("bitsandbytes.nn")

    class Params4bit:
        pass

    class _BnbLinear(nn.Linear):
        pass

    bnb.nn = bnb_nn
    bnb_nn.Params4bit = Params4bit
    bnb_nn.Linear4bit = _BnbLinear
    bnb_nn.Linear8bitLt = _BnbLinear
    bnb_nn.Int8Params = Params4bit
    bnb.functional = bnb_functional
    bnb_functional.quantize_4bit = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("bitsandbytes stub")
    )
    bnb_functional.dequantize_4bit = bnb_functional.quantize_4bit

    torchao = _module("torchao")
    ao_dtypes = _module("torchao.dtypes")
    ao_dtypes_nf4 = _module("torchao.dtypes.nf4tensor")
    ao_float8 = _module("torchao.float8")
    ao_fp8_linear = _module("torchao.float8.float8_linear")

    class NF4Tensor:
        pass

    class Float8Linear(nn.Linear):
        pass

    torchao.dtypes = ao_dtypes
    ao_dtypes.nf4tensor = ao_dtypes_nf4
    ao_dtypes_nf4.NF4Tensor = NF4Tensor
    ao_dtypes_nf4.to_nf4 = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("torchao stub"))
    ao_dtypes_nf4.linear_nf4 = ao_dtypes_nf4.to_nf4
    ao_dtypes.to_nf4 = ao_dtypes_nf4.to_nf4
    ao_dtypes.NF4Tensor = NF4Tensor
    torchao.float8 = ao_float8
    ao_float8.float8_linear = ao_fp8_linear
    ao_fp8_linear.Float8Linear = Float8Linear

    # timm: pulled in by the reference's models/auto.py (vision backbones)
    if "timm" not in sys.modules:
        timm = _module("timm")
        timm.create_model = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("timm stub: not instantiable in tests")
        )


def import_reference(module: str):
    """Import e.g. 'src.modules.timestep.embedding' from the reference tree."""
    if REFERENCE_ROOT not in sys.path:
        # append, don't insert: the reference tree also has a `tests/`
        # namespace-package portion, and putting it first makes
        # `tests.models.*` cross-imports resolve into /root/reference
        # instead of this repo (the reference's own modules are all under
        # `src.*`, which only exists there, so appending is sufficient)
        sys.path.append(REFERENCE_ROOT)
    _stub_diffusers()
    import importlib

    return importlib.import_module(module)
