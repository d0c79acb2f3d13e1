from . import sharded_odometry  # noqa: F401
