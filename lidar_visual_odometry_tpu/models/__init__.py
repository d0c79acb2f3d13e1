from . import lidar_odometry, scan_registration  # noqa: F401
