from soap3dp_tpu.fm.fmindex import DeviceIndex, device_index
from soap3dp_tpu.fm import fmindex

__all__ = ["DeviceIndex", "device_index", "fmindex"]
