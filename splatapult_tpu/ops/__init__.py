from splatapult_tpu.ops.tiled import composite_tiled

__all__ = ["composite_tiled"]
