"""TPU hot-path kernels.

  * `streaming` -- planar-float XLA datapaths (portable, shard_map-friendly)
  * `pallas_minn` -- fused Mosaic kernels for the flagship Minn-RTL detector
  * `blocked` -- compile-fast two-level prefix ops for very long axes

Submodule attributes are re-exported lazily (`ops.windows` depends on
`kernels.blocked`, so eager re-export here would be a circular import).
"""

_STREAMING = (
    "aa_metric_planar",
    "from_planar",
    "minn_rtl_detect_planar",
    "minn_rtl_metric_planar",
    "to_planar",
)
_PALLAS = (
    "minn_rtl_detect_fused_pallas",
    "minn_rtl_detect_planar_pallas",
    "minn_rtl_metric_planar_pallas",
)

__all__ = list(_STREAMING + _PALLAS) + ["blocked", "streaming", "pallas_minn"]


def __getattr__(name: str):
    import importlib

    if name in _STREAMING:
        return getattr(
            importlib.import_module("ofdm_sync_tpu.kernels.streaming"), name
        )
    if name in _PALLAS:
        return getattr(
            importlib.import_module("ofdm_sync_tpu.kernels.pallas_minn"), name
        )
    if name in ("blocked", "streaming", "pallas_minn"):
        return importlib.import_module(f"ofdm_sync_tpu.kernels.{name}")
    raise AttributeError(name)
