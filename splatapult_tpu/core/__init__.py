from splatapult_tpu.core import transforms, sh, project

__all__ = ["transforms", "sh", "project"]
