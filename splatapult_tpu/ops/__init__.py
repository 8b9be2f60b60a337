from splatapult_tpu.ops.binning import instance_demand
from splatapult_tpu.ops.tiled import composite_tiled

__all__ = ["composite_tiled", "instance_demand"]
