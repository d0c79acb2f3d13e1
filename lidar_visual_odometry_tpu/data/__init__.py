from . import kitti, synthetic  # noqa: F401
