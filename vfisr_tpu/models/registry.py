"""Model registry — realizing the documented ``models/registry.py``.

The reference documents this module (README.md:88-119, INFO.md:768-794) but
never ships it; its de-facto registry is
scripts/run_benchmarks.py:get_available_models() (:67-105) mapping
{bicubic, lanczos, optical_flow, rife, adaptive, vfimamba}. This registry
realizes the documented surface over the full native model zoo.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from vfisr_tpu.models.base import BaseModel


def _bicubic(**kw):
    from vfisr_tpu.models.traditional.baselines import BicubicBaseline

    return BicubicBaseline(**kw)


def _lanczos(**kw):
    from vfisr_tpu.models.traditional.baselines import LanczosBaseline

    return LanczosBaseline(**kw)


def _optical_flow(**kw):
    from vfisr_tpu.models.traditional.baselines import OpticalFlowVFI

    return OpticalFlowVFI(**kw)


def _rife(**kw):
    from vfisr_tpu.models.sota.rife import RIFEModel

    return RIFEModel(**kw)


def _rife_lite(**kw):
    from vfisr_tpu.models.sota.rife import RIFELiteModel

    return RIFELiteModel(**kw)


def _vfimamba(**kw):
    from vfisr_tpu.models.sota.vfimamba import VFIMambaModel

    return VFIMambaModel(variant="full", **kw)


def _vfimamba_s(**kw):
    from vfisr_tpu.models.sota.vfimamba import VFIMambaModel

    return VFIMambaModel(variant="small", **kw)


def _span(**kw):
    from vfisr_tpu.models.sota.span import SPANModel

    return SPANModel(**kw)


def _safa(**kw):
    from vfisr_tpu.models.sota.safa import SAFAModel

    return SAFAModel(**kw)


def _adaptive(**kw):
    from vfisr_tpu.models.novel.adaptive_pipeline import AdaptivePipeline

    return AdaptivePipeline(**kw)


def _flagship(**kw):
    from vfisr_tpu.pipeline.flagship import FlagshipVFI

    return FlagshipVFI(**kw)


def _rife_span(**kw):
    from vfisr_tpu.models.sota.span import create_rife_span

    return create_rife_span(**kw)


def _vfimamba_span(**kw):
    from vfisr_tpu.models.sota.span import create_vfimamba_span

    return create_vfimamba_span(**kw)


MODEL_REGISTRY: Dict[str, Callable[..., BaseModel]] = {
    # traditional (run_benchmarks.py:67-105 names)
    "bicubic": _bicubic,
    "lanczos": _lanczos,
    "optical_flow": _optical_flow,
    # sota
    "rife": _rife,
    "rife_lite": _rife_lite,
    "vfimamba": _vfimamba,
    "vfimamba_s": _vfimamba_s,
    "span": _span,
    "safa": _safa,
    # two-stage compositions (span_wrapper.py:264-279)
    "rife_span": _rife_span,
    "vfimamba_span": _vfimamba_span,
    # novel
    "adaptive": _adaptive,
    # fused single-program deployment path (pipeline/flagship.py, the
    # bench.py 167 fps configuration)
    "flagship": _flagship,
}


def list_models() -> List[str]:
    """All registered model names."""
    return sorted(MODEL_REGISTRY)


def get_model(name: str, load: bool = False, **kwargs) -> BaseModel:
    """Instantiate a model by registry name; optionally call load()."""
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {', '.join(list_models())}"
        )
    model = MODEL_REGISTRY[name](**kwargs)
    if load:
        model.ensure_loaded()
    return model


def get_available_models() -> Dict[str, Callable[..., BaseModel]]:
    """De-facto registry dict (run_benchmarks.py:67-105 shape)."""
    return dict(MODEL_REGISTRY)
