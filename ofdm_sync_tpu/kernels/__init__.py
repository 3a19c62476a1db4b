"""TPU hot-path kernels.

  * `streaming` -- planar-float XLA datapaths (portable, shard_map-friendly)
  * `pallas_minn` -- fused Mosaic kernels for the flagship Minn-RTL detector
  * `pallas_minn_tm` -- the time-major flagship kernel (tiled stream
    buffer; runs at the HBM input floor)
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
_PALLAS_TM = (
    "minn_rtl_detect_fused_tm",
    "to_time_tiled",
    "from_time_tiled",
)
_SUBMODULES = (
    "blocked", "streaming", "pallas_minn", "pallas_minn_tm",
    "pallas_tm_common", "pallas_aa", "pallas_zc", "pallas_zc_tm",
    "pallas_common", "streaming_chunked",
)

__all__ = list(_STREAMING + _PALLAS + _PALLAS_TM) + list(_SUBMODULES)


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
    if name in _PALLAS_TM:
        return getattr(
            importlib.import_module("ofdm_sync_tpu.kernels.pallas_minn_tm"),
            name,
        )
    if name in _SUBMODULES:
        return importlib.import_module(f"ofdm_sync_tpu.kernels.{name}")
    raise AttributeError(name)
