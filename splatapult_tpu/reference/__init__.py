from splatapult_tpu.reference.raster import reference_render

__all__ = ["reference_render"]
