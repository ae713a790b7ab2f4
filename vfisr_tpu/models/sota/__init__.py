"""SOTA neural models, implemented natively in JAX/Flax.

The reference wraps *external* CUDA repos that are absent from its snapshot
(rife_wrapper.py:47-60, vfimamba_wrapper.py:46, span_wrapper.py:46,
safa_wrapper.py:39 — all empty placeholder dirs); here the architectures are
implemented from their published papers and run end-to-end on TPU.

Lazy re-exports mirror reference models/sota/__init__.py:22-44.
"""


def __getattr__(name):
    if name in ("RIFEModel", "RIFELiteModel", "get_rife_model"):
        from vfisr_tpu.models.sota import rife

        return getattr(rife, name)
    if name in ("SPANModel", "TwoStageModel", "create_rife_span", "create_vfimamba_span"):
        from vfisr_tpu.models.sota import span

        return getattr(span, name)
    if name in ("VFIMambaModel",):
        from vfisr_tpu.models.sota import vfimamba

        return getattr(vfimamba, name)
    if name in ("SAFAModel",):
        from vfisr_tpu.models.sota import safa

        return getattr(safa, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "RIFEModel",
    "RIFELiteModel",
    "get_rife_model",
    "SPANModel",
    "create_rife_span",
    "create_vfimamba_span",
    "VFIMambaModel",
    "SAFAModel",
]
